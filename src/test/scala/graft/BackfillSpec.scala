package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.apply.{Backfill, MergeApply}
import graft.binlog.{BinlogGen, GenConfig, OracleFold}
import graft.lake.LakeTable
import graft.model.{ChangeEvent, Op, Schemas, Transcript}
import graft.pipeline.Pipeline

/** Concurrent chunked backfill (reference T7/J3) — the scenario of the
  * reference's regression tests tests/mysql_cdc_concurrent_snapshot.rs:1-45
  * and tests/mysql_snapshot_low_watermark.rs:1-50: snapshot chunks load
  * while the live stream keeps applying concurrent inserts/updates/deletes,
  * and the final table neither loses nor duplicates a single key.
  */
class BackfillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(lsn: Long) = new Timestamp(BinlogGen.BaseMs + lsn * 1000L)

  private def ev(lsn: Long, op: Int, conv: String, turn: Int,
      role: String = "user", text: String = null, tool: String = null,
      unchanged: Boolean = false): ChangeEvent =
    ChangeEvent(lsn, op, conv, turn, role, text, tool, ts(lsn), unchanged,
      lsn / 4, null)

  private def liveState(lake: LakeTable): Vector[Transcript] =
    lake.read(spark)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn", "_op")
      .as[Transcript].collect().toVector.sortBy(t => (t.conv_id, t.turn_idx))

  /** Payload-only view: backfilled rows carry the chunk LW as `_lsn`, so
    * replay equality is on the declared columns (the north-rule per-turn
    * text-equality invariant), not the audit lsn.
    */
  private def payloadOf(v: Vector[Transcript]) =
    v.map(t => (t.conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts))

  private def newLake(buckets: Int = 8): LakeTable = {
    val lake = LakeTable(spark, tmpDir("bflake"))
    lake.create(Schemas.transcript, buckets)
    lake
  }

  /** A re-readable "source table": the oracle fold of all events at or
    * below a position — what a live source select would return.
    */
  private def sourceAt(events: Seq[ChangeEvent], pos: Long): DataFrame =
    spark.createDataset(OracleFold.finalState(events.filter(_.lsn <= pos)))
      .toDF()

  private def chunkSource(events: Seq[ChangeEvent], cut: Long,
      chunks: Int): Backfill.ChunkSource = {
    val bounds = Backfill.planChunkBounds(
      sourceAt(events, cut).select("conv_id"), "conv_id", chunks)
    new Backfill.ChunkSource {
      def numChunks: Int = chunks
      def chunkRows(s: SparkSession, i: Int, lw: Long): DataFrame =
        sourceAt(events, math.max(lw, cut))
          .filter(Backfill.chunkPredicate(bounds, "conv_id", i))
    }
  }

  test("sampled chunk planning partitions the key space; sparse keys never crash") {
    import org.apache.spark.sql.functions.col
    // 9 distinct keys, 4 chunks (the round-2 advice's crash case: the old
    // planner could yield fewer bounds than chunks and chunkPredicate threw)
    val few = spark.createDataset((0 until 9).map(i => f"k$i%02d")).toDF("conv_id")
    val b9 = Backfill.planChunkBounds(few, "conv_id", 4)
    assert(b9.size <= 3 && b9 == b9.sorted && b9.distinct == b9)
    // every key lands in EXACTLY one chunk, incl. indexes past the plan
    val cover = (0 until 4).map(i =>
      few.filter(Backfill.chunkPredicate(b9, "conv_id", i)).count()).sum
    assert(cover == 9)
    // 1000 keys / 64 chunks (the second advice case) — also indexes well
    // past the boundary count must select nothing, not throw
    val many = spark.createDataset((0 until 1000).map(i => f"c$i%04d")).toDF("conv_id")
    val b1000 = Backfill.planChunkBounds(many, "conv_id", 64)
    val counts = (0 until 64).map(i =>
      many.filter(Backfill.chunkPredicate(b1000, "conv_id", i)).count())
    assert(counts.sum == 1000)
    assert(many.filter(Backfill.chunkPredicate(b1000, "conv_id", 63)).count() >= 0)
    // approximately balanced (sampled quantiles): no chunk holds >3x its share
    assert(counts.max <= 3 * (1000 / 64 + 1), s"skewed chunks: $counts")
    // deterministic: same input -> same plan
    assert(Backfill.planChunkBounds(many, "conv_id", 64) == b1000)
    // empty input and single chunk degenerate cleanly
    assert(Backfill.planChunkBounds(many.limit(0), "conv_id", 4).isEmpty)
    assert(Backfill.planChunkBounds(many, "conv_id", 1).isEmpty)
  }

  test("chunk apply: LSN tie wins, newer target rows and tombstones survive") {
    val lake = newLake()
    // stream starts mid-log: an unchanged-text UPDATE inserts with null text
    // (NOT MATCHED arm), then a DELETE on another key
    MergeApply.applyBatch(spark, lake, spark.createDataset(Seq(
      ev(4, Op.Update, "c1", 0, role = "assistant", unchanged = true),
      ev(6, Op.Delete, "c2", 0),
      ev(8, Op.Update, "c3", 0, role = "tool", text = "newer"))).toDF(), 0L)

    // a chunk selected when the stream had applied through lsn=4 (so it does
    // NOT reflect the delete@6 or update@8), applied late with lw=4
    val chunk = Seq(
      Transcript("c1", 0, "user", "from-snapshot", null, ts(1), 0, 0),
      Transcript("c2", 0, "user", "zombie", null, ts(1), 0, 0),
      Transcript("c3", 0, "user", "old", null, ts(1), 0, 0),
      Transcript("c4", 0, "user", "fresh-key", null, ts(1), 0, 0))
    Backfill.applyChunk(spark, lake,
      spark.createDataset(chunk).toDF(), lwLsn = 4L)

    val byConv = liveState(lake).map(t => t.conv_id -> t).toMap
    // tie (lw=4 == target _lsn=4): chunk's full row wins, restoring the
    // text the partial UPDATE couldn't carry
    assert(byConv("c1").text == "from-snapshot")
    assert(byConv("c1").role == "user")
    // delete@6 > lw=4: tombstone survives, chunk cannot resurrect
    assert(!byConv.contains("c2"))
    // update@8 > lw=4: newer stream value survives
    assert(byConv("c3").text == "newer")
    // key only in the snapshot: inserted
    assert(byConv("c4").text == "fresh-key")
    // replaying the same chunk is idempotent
    val before = liveState(lake)
    Backfill.applyChunk(spark, lake,
      spark.createDataset(chunk).toDF(), lwLsn = 4L)
    assert(liveState(lake) == before)
  }

  test("concurrent backfill + live stream equals oracle fold (no lost/dup keys)") {
    val cfg = GenConfig(seed = 21, numConvs = 80, eventsPerConv = 40,
      hotConvs = 4, hotFactor = 3, pctUpdate = 0.35, pctDelete = 0.12)
    val events = BinlogGen.events(cfg)
    val cut = events(events.size / 2).lsn // stream starts mid-log
    val tail = events.filter(_.lsn > cut)
    val work = tmpDir("bfstream")
    BinlogGen.writeSegments(spark,
      spark.createDataset(tail).toDF(), s"$work/binlog", 8)
    val lake = newLake()
    val src = chunkSource(events, cut, chunks = 5)
    Pipeline.runAvailable(spark, s"$work/binlog", lake, s"$work/ckpt",
      maxFilesPerTrigger = 2, chunkSource = Some(src))
    assert(lake.snapshot().backfillDone == 5)
    val got = liveState(lake)
    // no duplicated key
    assert(got.map(t => (t.conv_id, t.turn_idx)).distinct.size == got.size)
    // nothing lost, nothing stale: payload equality with the full-log fold
    assert(payloadOf(got) == payloadOf(OracleFold.finalState(events)))
  }

  test("backfill progress survives restart (resume from snapshot cursor)") {
    val cfg = GenConfig(seed = 23, numConvs = 60, eventsPerConv = 30,
      pctUpdate = 0.3, pctDelete = 0.1)
    val events = BinlogGen.events(cfg)
    val cut = events(events.size / 2).lsn
    val tail = events.filter(_.lsn > cut)
    val work = tmpDir("bfresume")
    val fs = new org.apache.hadoop.fs.Path(work)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    BinlogGen.writeSegments(spark,
      spark.createDataset(tail).toDF(), s"$work/all", 8)
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$work/all"))
      .map(_.getPath).sortBy(_.getName)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$work/binlog"))
    def copyIn(ps: Seq[org.apache.hadoop.fs.Path]): Unit = ps.foreach(p =>
      org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
        new org.apache.hadoop.fs.Path(s"$work/binlog", p.getName), false,
        spark.sparkContext.hadoopConfiguration))

    val lake = newLake()
    val src = chunkSource(events, cut, chunks = 6)
    // phase 1: half the stream arrives; one chunk per micro-batch → backfill
    // is still incomplete when the engine "crashes"
    copyIn(segs.take(4).toSeq)
    val q = Pipeline.start(spark, s"$work/binlog", lake, s"$work/ckpt",
      maxFilesPerTrigger = 2, availableNow = true, chunkSource = Some(src))
    q.awaitTermination()
    val mid = lake.snapshot().backfillDone
    assert(mid > 0 && mid < 6, s"expected partial backfill, got $mid")

    // phase 2: restart against the same checkpoint; the snapshot cursor
    // resumes the remaining chunks
    copyIn(segs.drop(4).toSeq)
    Pipeline.runAvailable(spark, s"$work/binlog", lake, s"$work/ckpt",
      maxFilesPerTrigger = 2, chunkSource = Some(src))
    assert(lake.snapshot().backfillDone == 6)
    assert(payloadOf(liveState(lake)) ==
      payloadOf(OracleFold.finalState(events)))
  }
}
