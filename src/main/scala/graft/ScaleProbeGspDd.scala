package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disk-health-gated GSP throughput attempt (r12 verdict task 3): the
  * stage-sum floor across r12's interleaved A/B executions proved a
  * ~1.25M T/s pace is attainable, but no single end-to-end run has
  * shown ≥1M T/s — every candidate run was eaten by a box I/O phase
  * (same-work spans of 26–247 s observed INSIDE one execution; dd
  * sequential write ~460 MB/s when the box is healthy, 5× less in a
  * bad phase). This probe makes the adjudication mechanical: measure
  * dd BEFORE each run, only count runs taken while the disk is
  * healthy (≥ `minMBps`), and record the dd number beside every run
  * so a miss is attributable — either the target is hit, or the
  * artifact carries the evidence that the irreducible-on-this-box
  * claim rests on.
  *
  * Protocol: wait (bounded) for a healthy dd reading; then floor-of-N
  * PUT runs of the default (base) import arm, a dd probe before each;
  * runs taken on an unhealthy phase are still recorded but flagged
  * and excluded from the gated floor.
  *
  * Usage: runMain graft.ScaleProbeGspDd [sfDir] [copies] [rounds]
  *        [minMBps] [outJson]
  */
object ScaleProbeGspDd {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val minMBps = args.lift(3).map(_.toDouble).getOrElse(350.0)
    val outJson = args.lift(4)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // same body as ScaleProbeGspAb: per-copy subject namespaces
    val dir = java.nio.file.Files.createTempDirectory("gsp_dd")
    dir.toFile.deleteOnExit()
    val ntPath = dir.resolve("nt").toString
    val li = graft.core.Tables.t(spark, sfDir, "lineitem")
    val one = (c: Int) => {
      val subj = concat(lit(s"<urn:li$c/"), col("l_orderkey"), lit("/"),
        col("l_linenumber"), lit(">"))
      li.select(concat(
        subj, lit(" <urn:p/part> <urn:part/"), col("l_partkey"),
        lit("> .\n"),
        subj, lit(" <urn:p/qty> \""), col("l_quantity"),
        lit("\"^^<http://www.w3.org/2001/XMLSchema#decimal> .\n"),
        subj, lit(" <urn:p/flag> \""), col("l_returnflag"),
        lit("\" .")).as("line"))
    }
    (0 until copies).map(one).reduce(_ unionByName _)
      .write.mode("overwrite").text(ntPath)
    val parts = new java.io.File(ntPath).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val totalBytes = parts.map(_.length).sum
    val triples = li.count() * 3 * copies
    println(f"[gsp-dd] body: $triples triples, ${totalBytes / 1e6}%.0f MB")

    def putOnce(): Double = {
      val store = graft.rdf.QuadStore.fromTerms(spark, Seq(
        (graft.rdf.Uri("urn:a"), graft.rdf.Uri("urn:p"),
          graft.rdf.Lit("x"))))
      val ep = new graft.http.Endpoint(spark, store, 0).start()
      try {
        val t0 = System.nanoTime()
        val conn = java.net.URI
          .create(s"http://localhost:${ep.boundPort}/data/?graph=urn:li")
          .toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("PUT")
        conn.setDoOutput(true)
        conn.setChunkedStreamingMode(1 << 20)
        val os = conn.getOutputStream
        val buf = new Array[Byte](1 << 20)
        parts.foreach { f =>
          val in = java.nio.file.Files.newInputStream(f.toPath)
          try {
            var n = in.read(buf)
            while (n >= 0) { os.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
          os.write('\n')
        }
        os.close()
        val code = conn.getResponseCode
        val sec = (System.nanoTime() - t0) / 1e9
        require(code == 201, s"PUT failed: $code")
        val n = graft.sparql.Sparql.run(ep.store, spark,
          """SELECT ?s WHERE { ?s <urn:p/part> ?o }""").count()
        require(n == triples / 3, s"expected ${triples / 3}, got $n")
        sec
      } finally {
        ep.stop()
        System.gc()
        Thread.sleep(2000)
      }
    }

    // gate: wait (up to ~10 min) for a healthy disk phase
    var waited = 0
    var dd0 = graft.probe.DiskProbe.writeMBps()
    println(f"[gsp-dd] initial dd: $dd0%.0f MB/s (gate: $minMBps%.0f)")
    while (dd0 < minMBps && waited < 10) {
      Thread.sleep(60000); waited += 1
      dd0 = graft.probe.DiskProbe.writeMBps()
      println(f"[gsp-dd] dd after ${waited}m wait: $dd0%.0f MB/s")
    }

    val runs = (0 until rounds).map { r =>
      val dd = if (r == 0) dd0 else graft.probe.DiskProbe.writeMBps()
      val healthy = dd >= minMBps
      val sec = putOnce()
      println(f"[gsp-dd] run $r: dd $dd%.0f MB/s " +
        f"(${if (healthy) "healthy" else "UNHEALTHY"}) $sec%.1f s " +
        f"= ${(triples / sec).toLong} T/s")
      (dd, healthy, sec)
    }
    val gated = runs.filter(_._2).map(_._3)
    val floor = if (gated.nonEmpty) gated.min else Double.NaN
    val floorTps = if (gated.nonEmpty) (triples / floor).toLong else 0L
    val runsJson = runs.map { case (dd, h, s) =>
      f"""{"dd_mbps":$dd%.0f,"healthy":$h,"sec":$s%.1f,""" +
        s""""tps":${(triples / s).toLong}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"gsp_disk_gated","triples":$triples,""" +
      s""""bytes":$totalBytes,"min_mbps_gate":$minMBps,""" +
      s""""waited_min":$waited,"runs":$runsJson,""" +
      (if (gated.nonEmpty)
        f""""gated_floor_sec":$floor%.1f,"gated_floor_tps":$floorTps}"""
      else """"gated_floor_sec":null,"gated_floor_tps":null}""")
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
