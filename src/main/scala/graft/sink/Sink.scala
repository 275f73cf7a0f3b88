package graft.sink

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.apply.MergeApply
import graft.dedup.Dedup
import graft.lake.LakeTable
import graft.model.{Op, Schemas}

/** A destination for CDC micro-batches — the Spark-side analog of the
  * reference's sink abstraction (`create_sink(&SinkConfig) -> Box<dyn
  * Sink>` dispatching StarRocks / PostgreSQL / Snowflake,
  * reference: src/connectors/sinks/mod.rs:57-148). Two kinds ship:
  *
  *   - `lake-merge`: the default — LWW reduce + exactly-once COW MERGE
  *     into a [[LakeTable]] (the reference's MERGE-upsert sinks);
  *   - `raw-append`: append-only staging of the raw change events with a
  *     later `normalize` fold — the reference's sync/normalize split
  *     (raw-table mode + normalizer,
  *     src/connectors/sinks/postgres/raw_table.rs:298-318,
  *     normalizer.rs:169-216), for targets where upserts are expensive
  *     but bulk appends are cheap.
  *
  * Contract: [[applyBatch]] must be idempotent per batchId (a replayed
  * batch is a no-op) and must THROW on failure — the pipeline never
  * swallows sink errors, so a failing sink halts the stream with no
  * silent loss (reference invariant: src/pipeline/mod.rs:169-185).
  */
trait Sink extends Serializable {

  /** Apply one micro-batch of change events. Idempotent by `batchId`. */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit

  /** The sink's current queryable state: for `lake-merge` the live table,
    * for `raw-append` the raw change log appended so far.
    */
  def read(spark: SparkSession): DataFrame
}

/** Declarative sink selection (the reference's `SinkConfig`,
  * src/connectors/sinks/mod.rs:57-83).
  */
case class SinkConfig(
    kind: String, // "lake-merge" | "raw-append"
    path: String,
    schema: StructType = Schemas.transcript,
    numBuckets: Int = 16)

object Sink {

  /** The factory (reference: `create_sink`, sinks/mod.rs:57-148). Creates
    * the backing storage on first use; reattaches to existing state
    * otherwise (resume).
    */
  def create(spark: SparkSession, cfg: SinkConfig): Sink = cfg.kind match {
    case "lake-merge" =>
      val lake = LakeTable(spark, cfg.path)
      if (lake.snapshotVersions().isEmpty)
        lake.create(cfg.schema, cfg.numBuckets)
      new MergeSink(lake)
    case "raw-append" =>
      new RawAppendSink(cfg.path, spark.sparkContext.hadoopConfiguration)
    case other =>
      throw new IllegalArgumentException(
        s"unknown sink kind '$other' (expected lake-merge | raw-append)")
  }
}

/** The default sink: the full reconcile → LWW → COW MERGE apply into a
  * [[LakeTable]] (what `Pipeline.start` always did, now behind the trait).
  */
final class MergeSink(val lake: LakeTable) extends Sink {
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    MergeApply.applyBatch(spark, lake, batch, batchId)
    ()
  }
  def read(spark: SparkSession): DataFrame = lake.read(spark)
}

/** Append-only raw staging: each micro-batch lands as an immutable
  * `batch=<id>` parquet directory of unmodified change events (ddl rows
  * included — the raw log is faithful). Exactly-once comes from the
  * directory-per-batch commit: data is written to a hidden temp dir and
  * renamed to its final name, so a replayed batch (rename target exists)
  * is a no-op and a crashed write leaves only an invisible `.tmp-*` dir
  * (reaped by [[vacuumTmp]]).
  *
  * `normalize` folds the raw log into final-table state on demand — the
  * reference's normalizer pass over its raw tables
  * (src/connectors/sinks/postgres/normalizer.rs:102-359). At 100 TB the
  * fold is one map-side-combined LWW aggregation over a partitioned
  * parquet scan; the raw write path itself is pure parquet-append
  * throughput with no join or state anywhere.
  */
final class RawAppendSink(val root: String, hadoopConf: Configuration)
    extends Sink {

  @transient private lazy val fs: FileSystem =
    new Path(root).getFileSystem(hadoopConf)

  private def batchDir(id: Long) = new Path(root, f"batch=$id%d")

  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): Unit = {
    val target = batchDir(batchId)
    if (fs.exists(target)) return // replayed batch: already committed
    fs.mkdirs(new Path(root))
    val tmp = new Path(root, s".tmp-$batchId-${UUID.randomUUID().toString.take(8)}")
    batch.write.mode("overwrite").parquet(tmp.toString)
    // no-overwrite commit: if a concurrent attempt won, keep its version
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, true)
      if (!fs.exists(target))
        throw new IllegalStateException(s"raw-append commit failed: $target")
    }
  }

  /** All committed raw events (no tmp dirs, no partial writes). */
  def read(spark: SparkSession): DataFrame = {
    val dirs =
      if (!fs.exists(new Path(root))) Seq.empty
      else fs.listStatus(new Path(root)).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
        .map(_.getPath.toString)
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Schemas.changeEvent)
    else spark.read.schema(Schemas.changeEvent).parquet(dirs: _*)
  }

  /** Normalize pass: fold the raw log into live final-table rows —
    * schema-evolution ddl events in the log contribute their add-lsn so
    * pre-add events don't carry the column (same semantics as the
    * streaming MERGE path).
    */
  def normalize(spark: SparkSession): DataFrame = {
    val raw = read(spark)
    val addLsn: Map[String, Long] = raw
      .filter(col("op") === Op.SchemaChange && col("ddl").startsWith("add:"))
      .select(col("ddl"), col("lsn"))
      .collect()
      .map(r => r.getString(0).split(":", 3)(1) -> r.getLong(1))
      .toMap
    val payload = Seq("role", "text", "tool", "ts")
    Dedup.lwwReduce(raw.filter(col("op") < Op.SchemaChange), payload, addLsn)
      .filter(col("op") =!= Op.Delete)
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
  }

  /** Reap crashed-write leftovers (never referenced by a reader). */
  def vacuumTmp(): Int = {
    if (!fs.exists(new Path(root))) return 0
    val tmps = fs.listStatus(new Path(root)).toSeq
      .filter(_.getPath.getName.startsWith(".tmp-"))
    tmps.foreach(t => fs.delete(t.getPath, true))
    tmps.size
  }
}
