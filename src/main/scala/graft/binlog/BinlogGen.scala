package graft.binlog

import java.sql.Timestamp
import scala.util.Random

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ChangeEvent, Op}

/** Deterministic, seeded generator of a binlog/WAL-shaped change-event
  * stream of conversation transcripts — our stand-in for the reference's
  * pgoutput/binlog tail (reference: src/source/postgres.rs:224-253). No
  * wall clock, no external data: everything derives from (seed, conv_id).
  *
  * Conversations generate independently (so generation distributes over
  * executors) and interleave by a strided LSN: the j-th event of
  * conversation c gets `lsn = 2*(j*numConvs + c) + 2` — strictly increasing
  * per conversation (the per-key WAL-order contract), globally unique, and
  * computable with no cross-conversation state. Odd LSNs are reserved for
  * schema-change (ddl) events.
  */
case class GenConfig(
    seed: Long = 42L,
    numConvs: Int = 1000,
    hotConvs: Int = 0,      // conv ids [0, hotConvs) are skew hot keys
    hotFactor: Int = 1,     // hot conversations emit hotFactor× more events
    eventsPerConv: Int = 50,
    pctUpdate: Double = 0.30,
    pctDelete: Double = 0.10,
    pctUnchanged: Double = 0.15, // share of updates that omit `text` (TOAST)
    addToolAtLsn: Option[Long] = None, // odd lsn at which `tool` is added
    txSize: Int = 8,
    // lsn distance between consecutive events (default 2: odd lsns are
    // ddl-reserved). Real WAL offsets are BYTE positions advancing by
    // record length (reference: src/core/position.rs:6-26) — a larger
    // stride models that: same event count, ~stride/2× wider lsn range,
    // proportionally more dedup bitmap buckets touched. Must be even.
    lsnStride: Long = 2L) {
  require(lsnStride >= 2L && lsnStride % 2 == 0,
    s"lsnStride must be even and >= 2, got $lsnStride")
  def convId(c: Long): String = f"conv_$c%08d"
  def totalEvents: Long =
    hotConvs.toLong * eventsPerConv * hotFactor +
      (numConvs - hotConvs).toLong * eventsPerConv
}

object BinlogGen {
  val BaseMs: Long = 1704067200000L // 2024-01-01T00:00:00Z, fixed epoch

  private def tsOf(lsn: Long): Timestamp = new Timestamp(BaseMs + lsn * 1000L)

  private val roles = Array("user", "assistant", "system", "tool")

  /** All events of one conversation, in per-conversation order. */
  def convEvents(cfg: GenConfig, c: Long): Seq[ChangeEvent] = {
    val rnd = new Random(cfg.seed * 1000003L + c * 7919L)
    val n = cfg.eventsPerConv * (if (c < cfg.hotConvs) cfg.hotFactor else 1)
    val conv = cfg.convId(c)
    var nextTurn = 0
    val alive = scala.collection.mutable.ArrayBuffer[Int]()
    val out = new scala.collection.mutable.ArrayBuffer[ChangeEvent](n)
    var xid = cfg.seed * 31 + c
    var inTx = 0
    for (j <- 0 until n) {
      val lsn = cfg.lsnStride * (j.toLong * cfg.numConvs + c) + cfg.lsnStride
      if (inTx >= 1 + rnd.nextInt(cfg.txSize)) { xid += 1; inTx = 0 }
      inTx += 1
      val roll = rnd.nextDouble()
      val toolVal =
        if (cfg.addToolAtLsn.forall(lsn >= _) && rnd.nextDouble() < 0.3)
          s"tool_${rnd.nextInt(8)}"
        else null
      val ev: ChangeEvent =
        if (alive.isEmpty || roll >= cfg.pctUpdate + cfg.pctDelete) {
          val turn = nextTurn; nextTurn += 1; alive += turn
          ChangeEvent(lsn, Op.Insert, conv, turn, roles(rnd.nextInt(4)),
            s"text-$conv-$turn-v$lsn-" + rnd.alphanumeric.take(16).mkString,
            toolVal, tsOf(lsn), text_unchanged = false, xid, null)
        } else if (roll < cfg.pctUpdate) {
          val turn = alive(rnd.nextInt(alive.size))
          val unchanged = rnd.nextDouble() < cfg.pctUnchanged
          ChangeEvent(lsn, Op.Update, conv, turn, roles(rnd.nextInt(4)),
            if (unchanged) null
            else s"text-$conv-$turn-v$lsn-" + rnd.alphanumeric.take(16).mkString,
            toolVal, tsOf(lsn), text_unchanged = unchanged, xid, null)
        } else {
          val i = rnd.nextInt(alive.size)
          val turn = alive(i)
          alive(i) = alive.last; alive.remove(alive.size - 1) // O(1) swap-remove
          ChangeEvent(lsn, Op.Delete, conv, turn, null, null, null,
            tsOf(lsn), text_unchanged = false, xid, null)
        }
      out += ev
    }
    out.toSeq
  }

  /** ddl control events (op=SchemaChange), e.g. the mid-stream `add tool`. */
  def ddlEvents(cfg: GenConfig): Seq[ChangeEvent] =
    cfg.addToolAtLsn.toSeq.map { lsn =>
      require(lsn % 2 == 1, "ddl lsns are odd by convention")
      ChangeEvent(lsn, Op.SchemaChange, null, 0, null, null, null,
        tsOf(lsn), text_unchanged = false, -1L, "add:tool:\"string\"")
    }

  /** Driver-side generation (tests, small fixtures), lsn-sorted. */
  def events(cfg: GenConfig): Vector[ChangeEvent] =
    ((0L until cfg.numConvs.toLong).flatMap(convEvents(cfg, _)) ++ ddlEvents(cfg))
      .sortBy(_.lsn).toVector

  /** Distributed generation: one task per slice of conversations — scales to
    * 10^10 events without driver materialization.
    */
  def eventsDs(spark: SparkSession, cfg: GenConfig,
      parallelism: Int = 0): Dataset[ChangeEvent] = {
    import spark.implicits._
    val p = if (parallelism > 0) parallelism
            else spark.sparkContext.defaultParallelism
    val convs = spark.range(0, cfg.numConvs.toLong, 1, math.min(p, cfg.numConvs))
    val data = convs.flatMap(c => convEvents(cfg, c))
    val ddl = spark.createDataset(ddlEvents(cfg))
    data.unionByName(ddl)
  }

  /** Write the stream as LSN-ordered parquet segment files
    * `seg-%05d.parquet` under `dir` — the on-disk stand-in for binlog
    * segments, consumed by the file-stream source. Files get strictly
    * increasing names and modification times so the source replays them in
    * LSN order (the per-key ordered-delivery contract of a WAL). Segments
    * align to the range partitioner's lsn boundaries, so transactions are
    * only split if they straddle a range boundary (rare; the engine's LWW
    * reduce is insensitive to intra-batch splits).
    */
  def writeSegments(spark: SparkSession, df: DataFrame, dir: String,
      numSegments: Int): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + "_tmp")
    df.repartitionByRange(numSegments, col("lsn"))
      .sortWithinPartitions("lsn")
      .write.mode("overwrite")
      // small row groups keep a segment splittable: the scan of one segment
      // file parallelizes across tasks instead of being one 100+MB split
      .option("parquet.block.size", (16L * 1024 * 1024).toString)
      .parquet(tmp.toString)
    fs.mkdirs(new Path(dir))
    val parts = fs.listStatus(tmp)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    for ((p, i) <- parts.zipWithIndex) {
      val to = new Path(dir, f"seg-$i%05d.parquet")
      require(fs.rename(p.getPath, to), s"rename ${p.getPath} -> $to")
      fs.setTimes(to, BaseMs + i * 1000L, -1) // deterministic replay order
    }
    fs.delete(tmp, true)
  }
}
