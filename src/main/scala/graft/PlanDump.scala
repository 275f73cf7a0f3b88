package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.binlog.{BinlogGen, GenConfig}
import graft.dedup.Dedup
import graft.lake.LakeTable
import graft.model.Schemas
import graft.queries.{Analytics, CdcQueries, DataOps}

/** Physical-plan auditor: prints `explain(formatted)` for the hot paths so
  * pushdown (PushedFilters/ReadSchema), broadcast choices, partial
  * aggregation, and WholeStageCodegen spans can be inspected — the
  * "iterate until it's the plan you'd want" loop.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dump(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n================ $name ================")
      df.explain("formatted")
    }

    dump("lww_reduce (partial agg expected before shuffle)") {
      Dedup.lwwReduce(CdcQueries.envelope(spark, sfDir).drop("ts"),
        Seq("role", "text", "tool", "ts_us"))
    }

    // the COW merge join: build a small lake, then explain the merge-shaped
    // join of target vs reduced updates
    dump("cow_merge_join (broadcast of small updates expected)") {
      val work = java.nio.file.Files.createTempDirectory("plandump").toString
      val lake = LakeTable(spark, work)
      lake.create(Schemas.transcript, 4)
      val cfg = GenConfig(seed = 1, numConvs = 20, eventsPerConv = 10)
      graft.apply.MergeApply.applyBatch(spark, lake,
        spark.createDataFrame(spark.sparkContext.parallelize(
          BinlogGen.events(cfg).map(e => org.apache.spark.sql.Row(
            e.lsn, e.op, e.conv_id, e.turn_idx, e.role, e.text, e.tool,
            e.ts, e.text_unchanged, e.xid, e.ddl))),
          Schemas.changeEvent), 0L)
      val snap = lake.snapshot()
      val ups = Dedup.lwwReduce(spark.createDataFrame(
        spark.sparkContext.parallelize(
          BinlogGen.events(cfg.copy(seed = 2)).map(e => org.apache.spark.sql.Row(
            e.lsn, e.op, e.conv_id, e.turn_idx, e.role, e.text, e.tool,
            e.ts, e.text_unchanged, e.xid, e.ddl))),
        Schemas.changeEvent), Schemas.payloadCols(snap.schema))
      val t = lake.readBuckets(spark, snap, (0 until 4).toSet).as("t")
      t.join(ups.as("u"),
        Schemas.keys.map(k => t(k) === ups(k)).reduce(_ && _), "full_outer")
    }

    dump("pushdown check: filtered projection on lineitem") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_shipdate") < lit("1995-01-01").cast("timestamp_ntz"))
        .select("l_orderkey", "l_quantity")
    }

    dump("q3_join")(Analytics.q3Join(spark, sfDir))
    dump("dedup_exact")(DataOps.dedupExact(spark, sfDir))
    dump("sim_dot_topk (TakeOrderedAndProject expected)")(
      DataOps.dotTopK(spark, sfDir))
    dump("minhash_lsh_pairs (ONE banded self-equi-join, sig persisted)")(
      DataOps.minhashLshPairs(spark, sfDir))
    dump("ann_ivf (posexplode centroids, broadcast probe)")(
      DataOps.annIvf(spark, sfDir))
    dump("embedding_neardup (banded self-equi-join, no cross join)")(
      DataOps.embeddingNearDup(spark, sfDir))
    dump("text_contamination (shingle equi-join, no cross product)")(
      DataOps.textContamination(spark, sfDir))
    dump("text_pii_scrub (pure map, no exchange)")(
      DataOps.piiScrub(spark, sfDir))
    dump("dedup_cluster (label propagation: per-round equi-join + min-agg)")(
      DataOps.dedupCluster(spark, sfDir))
    dump("transcript_assemble (one conv_id shuffle, bounded collect_list)")(
      CdcQueries.transcriptAssemble(spark, sfDir))
    dump("data_split (pure map, no exchange)")(
      DataOps.dataSplit(spark, sfDir))
    dump("sim_knn_lsh (banded candidates + bounded per-vector window)")(
      DataOps.knnLsh(spark, sfDir))
    dump("corpus_curate (one scan, one fingerprint-window shuffle)")(
      DataOps.corpusCurate(spark, sfDir))
    dump("dedup_keep_best (one keeper window over the cluster subtree)")(
      DataOps.dedupKeepBest(spark, sfDir))
    spark.stop()
  }
}
