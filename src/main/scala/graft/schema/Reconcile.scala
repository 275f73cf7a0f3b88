package graft.schema

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.types._

/** One schema-evolution action, following the reference's conservative
  * policy (reference: src/connectors/sinks/schema_evolution.rs:14-22,
  * 230-247): ADD is automatic; DROP is ignored (dead column kept);
  * incompatible TYPE change is an error (old type kept); widening —
  * required by the north rule, checked via Catalyst's `Cast.canUpCast` —
  * is applied automatically.
  */
sealed trait SchemaAction
case class AddColumn(field: StructField) extends SchemaAction
case class WidenColumn(name: String, from: DataType, to: DataType) extends SchemaAction
case class IgnoreDrop(name: String) extends SchemaAction
case class RejectChange(name: String, from: DataType, to: DataType) extends SchemaAction

case class ReconcilePlan(merged: StructType, actions: Seq[SchemaAction]) {
  def changed: Boolean = actions.exists {
    case _: AddColumn | _: WidenColumn => true
    case _                             => false
  }
}

/** Pure StructType diff: reconcile an incoming batch schema against the
  * table schema *by column name, never position* (reference:
  * schema_evolution.rs:119-199 "diff_against_cache"). The merged schema
  * keeps the table's column order and appends added columns, mirroring
  * `ALTER TABLE ... ADD COLUMN` ordinal behavior.
  */
object Reconcile {
  def apply(table: StructType, incoming: StructType): ReconcilePlan = {
    val actions = scala.collection.mutable.ArrayBuffer[SchemaAction]()
    val merged = scala.collection.mutable.ArrayBuffer[StructField]()
    val incByName = incoming.fields.map(f => f.name -> f).toMap

    for (tf <- table.fields) {
      incByName.get(tf.name) match {
        case None =>
          actions += IgnoreDrop(tf.name)
          merged += tf
        case Some(inf) if inf.dataType == tf.dataType =>
          merged += tf
        case Some(inf) if Cast.canUpCast(tf.dataType, inf.dataType) =>
          actions += WidenColumn(tf.name, tf.dataType, inf.dataType)
          merged += tf.copy(dataType = inf.dataType)
        case Some(inf) =>
          actions += RejectChange(tf.name, tf.dataType, inf.dataType)
          merged += tf // keep old type; conservative, never destructive
      }
    }
    val tableNames = table.fieldNames.toSet
    for (inf <- incoming.fields if !tableNames.contains(inf.name)) {
      val added = inf.copy(nullable = true) // new columns must be nullable
      actions += AddColumn(added)
      merged += added
    }
    ReconcilePlan(StructType(merged.toSeq), actions.toSeq)
  }
}
