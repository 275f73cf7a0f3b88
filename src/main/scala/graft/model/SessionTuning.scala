package graft.model

import org.apache.spark.sql.SparkSession

/** Session tuning the engine's own operators apply (library-level, not the
  * bench harness): settings whose defaults are tuned for plan-stability
  * rather than performance and that are safe — and beneficial — at every
  * scale this engine targets.
  */
object SessionTuning {

  /** Let AQE pick the output partitioning of cached plans
    * (`spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`, default
    * false): every persisted frame in this engine (merge inputs, LSH band /
    * candidate caches, shingle tables) is otherwise materialized at the raw
    * `spark.sql.shuffle.partitions` constant, and every downstream stage
    * pays one task per cached partition regardless of data size. With the
    * flag on, cache materialization goes through AQE's size-adaptive
    * coalescing (guide §2.2: fewer, larger partitions derived from bytes,
    * not a constant tuned for either local mode or the cluster). Idempotent
    * and cheap — callers invoke it on every operator entry.
    */
  /** Opt-out for embedders who must not have their session conf touched:
    * -Dgraft.tuning.disabled=true (or the env var). The engine then runs
    * with whatever the session already has.
    */
  private lazy val disabled: Boolean =
    sys.props.get("graft.tuning.disabled")
      .orElse(sys.env.get("SPARK_GRAFT_TUNING_DISABLED"))
      .exists(_.equalsIgnoreCase("true"))

  def tune(spark: SparkSession): SparkSession = {
    if (disabled) return spark
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // Guide §3.1/§9: allow shuffled-hash join where its size conditions
    // hold instead of always sort-merge — the planner still requires the
    // build side's per-partition stats to fit
    // (canBuildLocalHashMapBySize), so a 100 TB merge with a large target
    // bucket falls back to sort-merge; small/medium joins skip two sorts.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark
  }
}
