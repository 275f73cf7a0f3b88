package graft.binlog

import graft.model.{ChangeEvent, Op, Transcript}

/** The correctness oracle: a straightforward per-key fold of the event log
  * in LSN order — the same role the reference's RecordingSink plays in its
  * integration tests (reference: tests/common/mod.rs, used by
  * tests/mysql_cdc_concurrent_snapshot.rs:1-45). The engine's distributed
  * apply must equal this sequential reduction bit-for-bit.
  */
object OracleFold {

  /** Final live table state after applying `events` (any order; sorted by
    * lsn here), honoring:
    *   - last-writer-wins per (conv_id, turn_idx) by lsn;
    *   - UPDATE with text_unchanged keeps the previously-stored text
    *     (TOAST semantics);
    *   - UPDATE/unchanged on a missing or deleted key inserts with null text
    *     (reference MERGE arm: NOT MATCHED ∧ op≠DELETE → INSERT);
    *   - DELETE leaves a tombstone (excluded from the live view) whose lsn
    *     still guards against lower-lsn resurrection;
    *   - a column "added at lsn A" is not carried by events with lsn < A.
    *
    * Duplicate lsns (transport replays) collapse to one application.
    */
  def finalState(
      events: Seq[ChangeEvent],
      addLsn: Map[String, Long] = Map.empty): Vector[Transcript] = {
    val toolAdd = addLsn.getOrElse("tool", 0L)
    val state = scala.collection.mutable.LinkedHashMap[(String, Int), Transcript]()
    val seen = scala.collection.mutable.HashSet[Long]()
    for (e <- events.sortBy(_.lsn) if e.op < Op.SchemaChange if seen.add(e.lsn)) {
      val key = (e.conv_id, e.turn_idx)
      e.op match {
        case Op.Delete =>
          state(key) = Transcript(e.conv_id, e.turn_idx, null, null, null,
            null, e.lsn, Op.Delete)
        case _ =>
          val prev = state.get(key).filter(_._op != Op.Delete)
          val text =
            if (e.op == Op.Update && e.text_unchanged) prev.map(_.text).orNull
            else e.text
          val tool = if (e.lsn >= toolAdd) e.tool else prev.map(_.tool).orNull
          state(key) = Transcript(e.conv_id, e.turn_idx, e.role, text, tool,
            e.ts, e.lsn, e.op)
      }
    }
    state.values.filter(_._op != Op.Delete).toVector
      .sortBy(t => (t.conv_id, t.turn_idx))
  }
}
