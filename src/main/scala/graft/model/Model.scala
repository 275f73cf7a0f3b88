package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Operation codes for a change event, mirroring the reference's
  * `CdcRecord` variants (reference: src/core/record.rs:6-41) and the raw
  * staging `_record_type` encoding
  * (reference: src/connectors/sinks/postgres/raw_table.rs:132-191).
  */
object Op {
  val Insert       = 0
  val Update       = 1
  val Delete       = 2
  val SchemaChange = 3 // reference: CdcRecord::SchemaChange (record.rs:23-27)
}

/** One change event of the binlog/WAL-shaped stream.
  *
  * Envelope mirrors the reference's `CdcRecord` + `SourcePosition`
  * (reference: src/core/record.rs:6-41, src/core/position.rs:6-26):
  *   - `lsn`  — strictly increasing global source offset (Lsn(u64) analog)
  *   - `op`   — see [[Op]]
  *   - keys   — (conv_id, turn_idx), the transcript primary key
  *   - payload — role/text/tool/ts ("after" image; nulls for DELETE)
  *   - `text_unchanged` — TOAST-column analog: an UPDATE that did NOT carry
  *     `text` (reference: Value::Unchanged, src/core/record.rs:130-131);
  *     apply must keep the previously-stored text.
  *   - `xid`  — transaction id; segment files never split a transaction
  *     (reference commit-boundary checkpointing,
  *     src/engine/replication/mysql.rs:283-296).
  *   - `ddl`  — only for op=SchemaChange: "add:<col>:<sparkTypeJson>" or
  *     "widen:<col>:<sparkTypeJson>".
  */
case class ChangeEvent(
    lsn: Long,
    op: Int,
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    text_unchanged: Boolean,
    xid: Long,
    ddl: String)

/** A materialized transcript row in the lake table (the input_hint shape)
  * plus engine audit columns mirroring the reference's
  * `_dbmazz_synced_at`/`_dbmazz_op_type`
  * (reference: src/connectors/sinks/postgres/setup.rs:186-187):
  *   `_lsn` — last-applied event LSN (the LWW / late-event guard)
  *   `_op`  — op of the last applied event.
  */
case class Transcript(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    _lsn: Long,
    _op: Int)

object Schemas {
  /** Key columns of the transcript table. */
  val keys: Seq[String] = Seq("conv_id", "turn_idx")

  /** Fixed physical envelope of the change stream (file-stream sources need
    * one schema; logical schema evolution is declared via op=3 `ddl` rows,
    * like the reference's pgoutput Relation messages,
    * src/source/parser.rs:33-38).
    */
  val changeEvent: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("op", IntegerType, nullable = false),
    StructField("conv_id", StringType, nullable = true),
    StructField("turn_idx", IntegerType, nullable = true),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("text_unchanged", BooleanType, nullable = true),
    StructField("xid", LongType, nullable = true),
    StructField("ddl", StringType, nullable = true)))

  /** Multi-table stream envelope: [[changeEvent]] plus the destination
    * table (the reference's TableRef on every record,
    * src/core/record.rs:61-77).
    */
  val changeEventMulti: StructType =
    changeEvent.add(StructField("table", StringType, nullable = true))

  /** Initial lake-table schema (input_hint shape + audit columns). The
    * `tool` column may be absent at table creation when the stream
    * predates its `add:` ddl (schema-evolution fixture).
    */
  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true),
    StructField("_lsn", LongType, nullable = false),
    StructField("_op", IntegerType, nullable = false)))

  val transcriptNoTool: StructType =
    StructType(transcript.fields.filterNot(_.name == "tool"))

  /** Payload (non-key, non-audit) columns of a given table schema. */
  def payloadCols(schema: StructType): Seq[String] =
    schema.fieldNames.toSeq.filterNot(n => keys.contains(n) || n.startsWith("_"))
}
