package graft

import org.apache.spark.sql.functions._

import graft.apply.MultiApply
import graft.binlog.{BinlogGen, GenConfig, OracleFold}
import graft.lake.LakeTable
import graft.model.{Schemas, Transcript}
import graft.pipeline.Pipeline

/** Multi-table routing (reference TableRef per record, record.rs:61-77):
  * one stream, one MERGE per tracked destination table, untracked tables
  * dropped (P1) without failing the stream.
  */
class MultiTableSpec extends SparkSpec {
  import spark.implicits._

  private def liveState(lake: LakeTable): Vector[Transcript] =
    lake.read(spark)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn", "_op")
      .as[Transcript].collect().toVector.sortBy(t => (t.conv_id, t.turn_idx))

  // route per conversation: %5==0 → untracked ghost, else parity → a / b
  private def tableOf(conv: String): String = {
    val n = conv.stripPrefix("conv_").toInt
    if (n % 5 == 0) "ghost" else if (n % 2 == 0) "a" else "b"
  }

  test("streamed multi-table routing: per-table fold equality + untracked drop") {
    val cfg = GenConfig(seed = 31, numConvs = 50, eventsPerConv = 30,
      pctUpdate = 0.3, pctDelete = 0.1)
    val events = BinlogGen.events(cfg)
    val work = tmpDir("multi")
    val n = substring(col("conv_id"), 6, 8).cast("int")
    val tagged = spark.createDataset(events).toDF()
      .withColumn("table",
        when(n % 5 === 0, "ghost").when(n % 2 === 0, "a").otherwise("b"))
    BinlogGen.writeSegments(spark, tagged, s"$work/binlog", 6)

    val lakes = Map(
      "a" -> LakeTable(spark, s"$work/lake-a"),
      "b" -> LakeTable(spark, s"$work/lake-b"))
    lakes.values.foreach(_.create(Schemas.transcript, 4))
    val q = Pipeline.startMulti(spark, s"$work/binlog", lakes, s"$work/ckpt",
      maxFilesPerTrigger = 2)
    q.awaitTermination()

    for ((name, lake) <- lakes) {
      val want = OracleFold.finalState(
        events.filter(e => e.conv_id != null && tableOf(e.conv_id) == name))
      assert(liveState(lake) == want, s"table $name diverged")
    }
    // ghost conversations reached no lake
    val all = lakes.values.flatMap(liveState).map(_.conv_id).toSet
    assert(all.forall(c => tableOf(c) != "ghost"))

    // replayed batch is a per-table no-op (idempotence guard holds per lake)
    val before = lakes.map { case (n, l) => n -> liveState(l) }
    MultiApply.applyBatch(spark, lakes, tagged, 0L)
    assert(lakes.forall { case (n, l) => liveState(l) == before(n) })
  }
}
