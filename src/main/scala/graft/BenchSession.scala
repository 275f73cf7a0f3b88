package graft

import org.apache.spark.sql.SparkSession

/** The ONE bench-matching session builder shared by the measurement mains
  * (BenchExtra, PlanSnap). Their numbers/plans are only comparable to the
  * frozen `Bench.scala` while these settings stay byte-identical to its —
  * which cannot itself use this helper (it is hashed by the driver), so
  * any change to Bench's builder must be mirrored here.
  */
object BenchSession {
  def create(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
