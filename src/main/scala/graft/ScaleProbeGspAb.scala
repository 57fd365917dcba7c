package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Floor-of-N interleaved A/B protocol for the GSP HTTP import — the
  * r11 verdict's measurement discipline: single daily runs on a box
  * with 2×+ same-binary drift can neither prove nor disprove a
  * throughput target, so this probe runs both arms BACK-TO-BACK inside
  * one JVM, N rounds, alternating the order each round (ABBA…) so slow
  * phases of the box hit both arms equally, and reports per-arm
  * per-round times plus the FLOOR (min) of each arm — the floor is the
  * box-noise-free estimate, and the A/B delta of floors is the
  * code-attributable difference.
  *
  * Arms (spark.graft.import.dictStack, see QuadStore.fromFlatRaw):
  *   base  — dictionary from five pruned scans of the parse cache
  *   stack — dictionary from one scan + explode of 5 entries/row
  *
  * Usage: runMain graft.ScaleProbeGspAb [sfDir] [copies] [rounds] [out]
  */
object ScaleProbeGspAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val outJson = args.lift(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // untimed: the same body ScaleProbeGsp builds (per-copy subject
    // namespaces — distinct triples, not a dedupe-able repeat)
    val dir = java.nio.file.Files.createTempDirectory("gsp_ab")
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
    println(f"[gsp-ab] body: $triples triples, ${totalBytes / 1e6}%.0f MB")

    def putOnce(label: String): Double = {
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
        // sanity on the FIRST round only would hide a broken arm later;
        // count is cheap relative to the import
        val n = graft.sparql.Sparql.run(ep.store, spark,
          """SELECT ?s WHERE { ?s <urn:p/part> ?o }""").count()
        require(n == triples / 3, s"$label: expected ${triples / 3}, got $n")
        println(f"[gsp-ab] $label: $sec%.1f s = ${(triples / sec).toLong} T/s")
        sec
      } finally {
        ep.stop()
        // drop the pinned store's blocks before the next arm runs: the
        // references die with the endpoint; nudge the ContextCleaner
        System.gc()
        Thread.sleep(2000)
      }
    }

    def runArm(arm: String): Double = {
      if (arm == "stack")
        spark.conf.set("spark.graft.import.dictStack", "true")
      else spark.conf.unset("spark.graft.import.dictStack")
      try putOnce(arm)
      finally spark.conf.unset("spark.graft.import.dictStack")
    }

    val times = scala.collection.mutable.Map(
      "base" -> List.empty[Double], "stack" -> List.empty[Double])
    for (r <- 0 until rounds) {
      // ABBA alternation: round parity flips which arm eats a given
      // phase of box noise
      val order = if (r % 2 == 0) Seq("base", "stack")
                  else Seq("stack", "base")
      order.foreach { a => times(a) = times(a) :+ runArm(a) }
    }
    def fmt(xs: List[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
    val fb = times("base").min
    val fs = times("stack").min
    val floorTps = (triples / math.min(fb, fs)).toLong
    val json =
      s"""{"metric":"gsp_ab","triples":$triples,"bytes":$totalBytes,""" +
      s""""rounds":$rounds,"base_sec":${fmt(times("base"))},""" +
      s""""stack_sec":${fmt(times("stack"))},""" +
      f""""floor_base":$fb%.1f,"floor_stack":$fs%.1f,""" +
      s""""floor_tps":$floorTps}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
