package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for declared queries to files — the
  * committed before/after plan evidence for the optimization rounds
  * (plans/rNN/<query>_{before,after}.txt). Uses the same session config as
  * the frozen bench so the captured plans match what the bench executes.
  *
  * Usage: sbt "runMain graft.PlanSnap <outDir> <suffix> [query ...]"
  *   e.g. runMain graft.PlanSnap plans/r07 before cdc_pipeline_e2e
  * Note: engine-backed queries run their fixture while the final DataFrame
  * is constructed; the dumped plan is the returned (declared) frame's plan.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <outDir> <suffix> [query ...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Files.createDirectories(outDir)
    val spark = BenchSession.create()
    val names =
      if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      graft.queries.DataOps.releaseLeases()
      println(s"PLANSNAP wrote ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
