package graft

import java.sql.Timestamp

import graft.apply.MergeApply
import graft.binlog.BinlogGen
import graft.lake.LakeTable
import graft.model.{ChangeEvent, Op, Schemas}

/** Kill-at-any-point property test for the commit protocol (SURVEY §7.4's
  * #1 hard part: "test with injected failures between write and rename").
  * 100 seeded scenarios, each a random op sequence (MERGE applies,
  * compaction, vacuum) with a crash injected at a random named step of the
  * write-data → write-manifests → rename-meta → append-lineage →
  * compact/vacuum sequence, then a REOPEN from disk and a retry.
  *
  * Invariants checked after every kill:
  *   1. the reopened table is readable (snapshot decodes, data scans);
  *   2. exactly-once visibility: the killed op's rows are visible IFF the
  *      kill point is at/after the meta rename (the commit point) — no
  *      partial batch is ever readable;
  *   3. idempotent retry: re-running the killed op (same batchId)
  *      converges to the oracle state — a pre-commit kill re-applies, a
  *      post-commit kill no-ops on the batchId guard;
  *   4. accounting: the snapshot's cumulative rowCount equals the physical
  *      count, and lineage carries no duplicate versions.
  */
class CommitKillSpec extends SparkSpec {
  import spark.implicits._

  private def ts(lsn: Long) = new Timestamp(BinlogGen.BaseMs + lsn * 1000L)

  private def ev(lsn: Long, op: Int, conv: String, turn: Int,
      text: String): ChangeEvent =
    ChangeEvent(lsn, op, conv, turn, "user", text, null, ts(lsn), false,
      lsn / 4, null)

  // the named steps, in protocol order; the commit point sits between
  // before-meta-rename and after-meta-rename
  private val killPoints = Vector("after-write-data", "after-write-manifests",
    "before-meta-rename", "after-meta-rename")

  private type Key = (String, Int)

  /** Oracle fold: LWW by lsn per key; deletes leave no live row. */
  private def fold(state: Map[Key, ChangeEvent],
      batch: Seq[ChangeEvent]): Map[Key, ChangeEvent] =
    batch.foldLeft(state) { (s, e) =>
      val k = (e.conv_id, e.turn_idx)
      if (s.get(k).exists(_.lsn >= e.lsn)) s else s + (k -> e)
    }

  private def liveOf(state: Map[Key, ChangeEvent]): Vector[(String, Int, String)] =
    state.values.filter(_.op != Op.Delete)
      .map(e => (e.conv_id, e.turn_idx, e.text)).toVector.sorted

  private def liveRead(lake: LakeTable): Vector[(String, Int, String)] =
    lake.read(spark).select("conv_id", "turn_idx", "text")
      .as[(String, Int, String)].collect().toVector.sorted

  private def checkAccounting(lake: LakeTable): Unit = {
    val snap = lake.snapshot()
    assert(snap.rowCount ==
      lake.read(spark, includeTombstones = true).count(),
      "cumulative rowCount diverged from physical count")
    val versions = lake.lineageDf(spark)
      .select("snapshot_version").as[Long].collect().toSeq
    assert(versions.distinct.size == versions.size,
      s"duplicate lineage versions: $versions")
  }

  test("kill at any commit step: readable, exactly-once, idempotent retry") {
    val convs = Vector("c0", "c1", "c2", "c3")
    var scenariosWithKill = 0
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(seed)
      val dir = tmpDir(s"killprop$seed")
      val lake = LakeTable(spark, dir)
      lake.create(Schemas.transcript, 2)
      var lsn = 0L
      def nextLsn(): Long = { lsn += 2; lsn }
      def randomBatch(n: Int): Seq[ChangeEvent] =
        (0 until n).map { _ =>
          val conv = convs(rnd.nextInt(convs.size))
          val turn = rnd.nextInt(2)
          val l = nextLsn()
          rnd.nextInt(4) match {
            case 0 => ev(l, Op.Insert, conv, turn, s"t$l")
            case 3 => ev(l, Op.Delete, conv, turn, null)
            case _ => ev(l, Op.Update, conv, turn, s"u$l")
          }
        }

      // op plan: 2 MERGE applies, plus sometimes compact and/or vacuum
      sealed trait OpKind
      case class Apply(batchId: Long, batch: Seq[ChangeEvent]) extends OpKind
      case object Compact extends OpKind
      case object Vacuum extends OpKind
      val ops = scala.collection.mutable.ArrayBuffer[OpKind](
        Apply(0L, randomBatch(1 + rnd.nextInt(3))))
      if (rnd.nextBoolean()) ops += Compact
      ops += Apply(1L, randomBatch(1 + rnd.nextInt(3)))
      if (rnd.nextInt(3) == 0) ops += Vacuum

      val killOpIdx = rnd.nextInt(ops.size)
      val killName = ops(killOpIdx) match {
        case Vacuum => "before-vacuum-meta-deletes"
        case _ => killPoints(rnd.nextInt(killPoints.size))
      }

      var oracle = Map.empty[Key, ChangeEvent]
      for ((op, idx) <- ops.zipWithIndex) {
        val arm = idx == killOpIdx
        if (arm) lake.failpoint = { name =>
          if (name == killName) throw new RuntimeException(s"kill@$name")
        }
        def run(lk: LakeTable): Unit = op match {
          case Apply(bid, batch) =>
            MergeApply.applyBatch(spark, lk,
              spark.createDataset(batch.toVector).toDF(), bid)
            ()
          case Compact => lk.compact(spark, horizonLsn = lk.snapshot().endLsn)
            ()
          case Vacuum => lk.vacuum(keepVersions = 1, graceMs = 0L)
            ()
        }
        val killed = try { run(lake); false } catch {
          case e: RuntimeException
              if arm && e.getMessage != null &&
                e.getMessage.startsWith("kill@") => true
        }
        lake.failpoint = null
        if (killed) {
          scenariosWithKill += 1
          // REOPEN from disk: fresh handle, no caches
          val reopened = LakeTable(spark, dir)
          val snap = reopened.snapshot() // invariant 1: readable
          // invariant 2: the op's effect is visible IFF the kill point is
          // at/after the commit point (vacuum/compact never change live)
          val committed = killName == "after-meta-rename"
          op match {
            case Apply(bid, batch) =>
              val expected =
                if (committed) liveOf(fold(oracle, batch)) else liveOf(oracle)
              assert(liveRead(reopened) == expected,
                s"seed $seed kill@$killName committed=$committed: " +
                  "partial or lost batch visible")
              assert(snap.batchId == (if (committed) bid else bid - 1))
            case _ =>
              assert(liveRead(reopened) == liveOf(oracle),
                s"seed $seed kill@$killName: maintenance changed live state")
          }
          // invariant 3: retry on the reopened handle converges
          run(reopened)
          checkAccounting(reopened)
        }
        op match {
          case Apply(_, batch) => oracle = fold(oracle, batch)
          case _ =>
        }
        val handle = if (killed) LakeTable(spark, dir) else lake
        assert(liveRead(handle) == liveOf(oracle),
          s"seed $seed op $idx (killed=$killed) of ${ops.toList} " +
            s"killOpIdx=$killOpIdx killName=$killName: diverged from oracle")
      }
      checkAccounting(LakeTable(spark, dir))
    }
    // the property is vacuous if kills never fire (e.g. a no-op compact
    // skips commitRewrite entirely): require real coverage
    assert(scenariosWithKill >= 60,
      s"only $scenariosWithKill/100 scenarios actually killed")
  }
}
