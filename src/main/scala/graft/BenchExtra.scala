package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Optimization-round profiler (guide §1): NOT the driver bench — Bench.scala
  * stays frozen. Runs selected declared queries with a SparkListener that
  * decomposes wall time into scheduled work (jobs / stages / tasks / summed
  * task time), so driver-side overhead (planning, commit-protocol FS work,
  * job-launch latency) is visible as the gap between wall and task time.
  * Same session config and action (`count()`) as the frozen bench so numbers
  * are comparable; results are cited in OPTIMIZATION_r07.md only.
  *
  * Usage: sbt "runMain graft.BenchExtra [query ...]"
  *   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in Bench
  *   BENCHX_K: passes per query (default 2; first pass marked warm=false)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = math.max(1, sys.env.getOrElse("BENCHX_K", "2").toInt)
    val spark = BenchSession.create()

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0)
    val jobWallMs = new AtomicLong(0)
    val jobStartNs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val perJob = sys.env.get("BENCHX_JOBS").contains("1")
    val jobDesc = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        jobStartNs.put(e.jobId, System.nanoTime())
        if (perJob) {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobDesc.put(e.jobId, d)
        }
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val t0 = jobStartNs.remove(e.jobId)
        if (t0 != 0L) {
          val ms = (System.nanoTime() - t0) / 1000000
          jobWallMs.addAndGet(ms)
          if (perJob)
            println(f"BENCHXJOB ${e.jobId}%4d ${ms}%6d ms  ${jobDesc.remove(e.jobId)}")
        }
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) taskTimeMs.addAndGet(e.taskInfo.duration)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val selected =
      if (args.nonEmpty) args.toSeq.map(n => n -> SparkEntry.queries(n))
      else SparkEntry.queries.toSeq
    for ((name, fn) <- selected; pass <- 1 to k) {
      jobs.set(0); stages.set(0); tasks.set(0)
      taskTimeMs.set(0); jobWallMs.set(0)
      spark.sparkContext.setJobDescription(s"$name pass $pass")
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      graft.queries.DataOps.releaseLeases()
      spark.sparkContext.setJobDescription(null)
      // give listener events a moment to drain
      Thread.sleep(150)
      println(f"BENCHX $name%-28s pass=$pass wall=${wallMs / 1000.0}%8.3fs " +
        f"jobs=${jobs.get()}%3d stages=${stages.get()}%4d tasks=${tasks.get()}%5d " +
        f"taskTime=${taskTimeMs.get() / 1000.0}%8.3fs jobWall=${jobWallMs.get() / 1000.0}%8.3fs")
    }
    spark.stop()
  }
}
