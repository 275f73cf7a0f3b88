package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.binlog.{BinlogGen, GenConfig, OracleFold}
import graft.control.{Control, HttpControl}
import graft.lake.LakeTable
import graft.model.{Schemas, Transcript}

/** The HTTP ops facade (reference control server parity,
  * src/control/mod.rs:19-32): status/metrics/pause/resume/drain/snapshot
  * verbs drive the same Control the programmatic tests cover.
  */
class HttpControlSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  private def post(port: Int, path: String): (Int, String) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("status/drain/metrics/pause verbs over HTTP") {
    val cfg = GenConfig(seed = 83, numConvs = 30, eventsPerConv = 15)
    val events = BinlogGen.events(cfg)
    val work = tmpDir("httpctl")
    BinlogGen.writeSegments(spark,
      spark.createDataset(events).toDF(), s"$work/binlog", 4)
    val lake = LakeTable(spark, s"$work/lake")
    lake.create(Schemas.transcript, 4)
    val ctl = new Control(spark, s"$work/binlog", lake, s"$work/ckpt",
      maxFilesPerTrigger = 2)
    val http = new HttpControl(ctl).start()
    try {
      val port = http.boundPort
      val (c0, s0) = get(port, "/status")
      assert(c0 == 200 && s0.contains("\"running\":false"))

      // GET on a POST-only verb is rejected
      assert(get(port, "/drain")._1 == 405)

      // drain over HTTP: processes the whole backlog, then reports state
      val (c1, s1) = post(port, "/drain")
      assert(c1 == 200 && s1.contains("\"running\":false"))
      val live = lake.read(spark)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn", "_op")
        .as[Transcript].collect().toVector.sortBy(t => (t.conv_id, t.turn_idx))
      assert(live == OracleFold.finalState(events))

      // metrics recorded per-batch samples
      val deadline = System.currentTimeMillis() + 10000
      while (ctl.metrics.samples.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val (c2, s2) = get(port, "/metrics")
      assert(c2 == 200 && s2.startsWith("[") && s2.contains("\"batchId\""))

      // snapshot trigger without a chunk source → a loud 500, not silence
      assert(post(port, "/snapshot")._1 == 500)

      // pause is idempotent when nothing runs
      assert(post(port, "/pause")._1 == 200)
    } finally {
      http.stop()
      ctl.close()
    }
  }
}
