package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent, SparkListenerJobStart}
import graft.rdf._
import graft.http.Endpoint
import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

/** Diagnostic: reproduce the request-property inheritance leak with the
  * REAL Endpoint (timeout=2s): a slow cross-product request is cancelled
  * while fast probes stream concurrently. Logs every job's (jobId, rid,
  * executionId) plus SQL execution starts, to pin down which submission
  * path carries a stale request id. */
object CancelProbe {
  private def req(url: String): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(is.readAllBytes(), UTF_8)
    (code, text)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("cancel-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("INFO")

    val t0 = System.nanoTime()
    def ts = f"${(System.nanoTime() - t0) / 1e9}%.2f"
    sc.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val p = e.properties
        def g(k: String) = if (p == null) "-" else Option(p.getProperty(k)).getOrElse("-")
        println(s"[probe] $ts JOB ${e.jobId} rid=${g("graft.ep.request").take(8)} " +
          s"pool=${g("spark.scheduler.pool")}")
      }
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        println(s"[probe] $ts TASKSTART stage=${e.stageId} tid=${e.taskInfo.taskId}")
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        println(s"[probe] $ts TASKEND stage=${e.stageId} tid=${e.taskInfo.taskId} " +
          s"reason=${e.reason.toString.take(60)}")
    })

    spark.conf.set("spark.sql.inMemoryColumnarStorage.batchSize", "200")
    val nt = (0 until 50000).map(i => s"""<urn:s$i> <urn:p> "$i" .""")
    val store = QuadStore.fromFlat(spark,
      graft.streaming.StreamIngest.parseNtLines(
        spark.createDataset(sc.parallelize(nt, 8))(
          org.apache.spark.sql.Encoders.STRING)))
    val ep = new Endpoint(spark, store, 0, queryTimeoutSec = 2,
      workerThreads = 8).start()
    val base = s"http://localhost:${ep.boundPort}"

    val aRun = "a" * 50
    val slow = java.net.URLEncoder.encode(
      s"""SELECT (COUNT(*) AS ?n) WHERE {
          |  ?s <urn:p> ?o .
          |  FILTER(REGEX(REPLACE(STR(?o), "[0-9]", "$aRun"),
          |               "(a+)\\\\1+b")) }""".stripMargin, "UTF-8")
    val slowThread = new Thread(() => {
      try {
        val (c, b) = req(s"$base/sparql/?query=$slow")
        println(s"[probe] slow done: $c ${b.take(100).replace('\n', ' ')}")
      } catch { case e: java.io.IOException => println(s"[probe] slow io: ${e.getMessage}") }
    }, "slow-req")
    slowThread.start()

    val ok = java.net.URLEncoder.encode(
      "SELECT (COUNT(*) AS ?n) WHERE { ?s <urn:p> ?o }", "UTF-8")
    Thread.sleep(2000)
    // mid-zombie stack dump: where do killed-but-running tasks spin?
    Thread.sleep(2500)
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
      if (t.getName.contains("task launch worker")) {
        println(s"[probe] $ts STACK ${t.getName}:")
        st.take(28).foreach(f => println(s"[probe]    $f"))
      }
    }
    println(s"[probe] $ts calling cancelAllJobs")
    sc.cancelAllJobs()
    Thread.sleep(1500)
    println(s"[probe] $ts post-cancelAllJobs; live workers: " +
      Thread.getAllStackTraces.asScala.keys.count(
        _.getName.contains("task launch worker")))
    for (i <- 1 to 6) {
      val (c, b) = req(s"$base/sparql/?query=$ok&output=tsv&probe=$i")
      val oneLine = b.replace('\n', '|')
      println(s"[probe] $ts probe $i -> $c $oneLine")
      Thread.sleep(400)
    }
    slowThread.join(30000)
    ep.stop()
    spark.stop()
  }
}
