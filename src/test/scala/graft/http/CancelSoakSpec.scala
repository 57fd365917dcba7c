package graft.http

import graft.SparkTestBase
import graft.rdf._
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** 50-iteration cancellation soak — the statistical follow-up to
  * EndpointSpec's single-shot "concurrent fast queries survive a peer
  * request's deadline": ONE endpoint serves 50 consecutive
  * timeout-plus-concurrent-load cycles, so the run also exercises
  * listener/registration hygiene across many deadline sweeps (a leak in
  * the per-request job-id registry or a stale scheduler pool would
  * compound and surface as late-iteration flakes).
  *
  * Gated behind SPARK_GRAFT_SOAK=1 (≈3–4 min of wall clock is soak
  * budget, not CI budget); the recorded tally lives in
  * ARCHITECTURE.md's round-9 section.
  */
class CancelSoakSpec extends SparkTestBase {

  private def req(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(is.readAllBytes(), UTF_8)
    (code, text)
  }

  test("soak: 50 timeout cycles under concurrent load, zero spurious " +
      "failures") {
    if (!sys.env.get("SPARK_GRAFT_SOAK").contains("1"))
      cancel("set SPARK_GRAFT_SOAK=1 to run the ~3-minute soak")
    val savedBatch =
      spark.conf.getOption("spark.sql.inMemoryColumnarStorage.batchSize")
    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "200")
    try soakBody()
    finally savedBatch match {
      case Some(v) =>
        spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", v)
      case None =>
        spark.conf.unset("spark.sql.inMemoryColumnarStorage.batchSize")
    }
  }

  private def soakBody(): Unit = {
    val nt = (0 until 50000).map(i => s"""<urn:s$i> <urn:p> "$i" .""")
    val store = QuadStore.fromFlat(spark,
      graft.streaming.StreamIngest.parseNtLines(
        spark.createDataset(spark.sparkContext.parallelize(nt, 8))(
          org.apache.spark.sql.Encoders.STRING)))
    val ep = new Endpoint(spark, store, 0, queryTimeoutSec = 1,
      workerThreads = 8).start()
    try {
      val base = s"http://localhost:${ep.boundPort}"
      val aRun = "a" * 50
      val slow = java.net.URLEncoder.encode(
        s"""SELECT (COUNT(*) AS ?n) WHERE {
          |  ?s <urn:p> ?o .
          |  FILTER(REGEX(REPLACE(STR(?o), "[0-9]", "$aRun"),
          |               "(a+)\\\\1+b")) }""".stripMargin, "UTF-8")
      val ok = java.net.URLEncoder.encode(
        "SELECT (COUNT(*) AS ?n) WHERE { ?s <urn:p> ?o }", "UTF-8")
      val failures = scala.collection.mutable.ListBuffer.empty[String]
      var slowBad = 0
      for (iter <- 1 to 50) {
        val slowThread = new Thread(() =>
          try {
            val (c, b) = req(s"$base/sparql/?query=$slow")
            // honest outcomes only: clean 503, or a post-header stream
            // cut with the in-band marker
            if (!(c == 503 || (c == 200 && b.contains("# ERROR"))))
              slowBad += 1
          } catch { case _: java.io.IOException => () })
        slowThread.start()
        Thread.sleep(1000) // probes span the cancellation window
        for (i <- 1 to 3) {
          val (c, b) = req(s"$base/sparql/?query=$ok&output=tsv&i=$iter-$i")
          if (!(c == 200 && b.contains("50000") && !b.contains("# ERROR")))
            failures += s"iter $iter probe $i: $c ${b.take(100)}"
          Thread.sleep(250)
        }
        slowThread.join(20000)
      }
      info(s"soak tally: ${failures.size} spurious probe failures, " +
        s"$slowBad bad slow-query outcomes over 50 iterations")
      assert(failures.isEmpty, failures.take(5).mkString("; "))
      assert(slowBad == 0, s"$slowBad slow queries completed cleanly?")
    } finally ep.stop()
  }
}
