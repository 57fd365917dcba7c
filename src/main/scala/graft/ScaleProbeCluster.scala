package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-shaped smoke run (r12 verdict task 6): everything else in
  * this repo runs single-JVM `local[32]`, where closure serialization,
  * broadcast thresholds, task-result sizes and classpath/resource
  * loading are never truly exercised. `local-cluster[4,8,m]` starts a
  * real standalone Master + 4 Workers in-process and forks 4 REAL
  * executor JVMs (separate processes, real serialization, real
  * classloaders reading the PSL snapshot resource etc.), which is the
  * closest a single box gets to multi-executor execution.
  *
  * Protocol: run ~20 headline gates under plain local[32] (rows +
  * order-insensitive xxhash64 content hash), stop, re-run identically
  * under local-cluster, compare hashes, then drive one GSP HTTP PUT
  * end-to-end under the cluster. Artifact: SCALE_BENCH_cluster.json
  * with per-gate parity + times for both masters.
  *
  * Usage: runMain graft.ScaleProbeCluster [sfDir] [outJson]
  */
object ScaleProbeCluster {

  private val gates = Seq(
    "q02_agg_pricing_summary", "q03_join_customer_nation_region",
    "q08_order_limit_offset", "q21_window_rank", "q24_events_hourly",
    "s01_sparql_bgp_join", "s02_sparql_optional", "s04_sparql_minus",
    "s05_sparql_agg", "s06_sparql_filter_str", "s07_sparql_order_limit",
    "s11_sparql_ask", "s15_sparql_fulltext", "s17_sparql_path",
    "p01_dedup_exact", "p03_minhash_pairs", "p07_langid", "p34_bm25_topk",
    "p49_winnowing", "p53_url_canonicalize", "p55_crawl_curate")

  private def session(master: String): SparkSession = {
    val b = SparkSession.builder().master(master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 =
      if (master.startsWith("local-cluster")) b
        // forked executor JVMs need the same classpath as this driver
        // (sbt classes dir + /opt/spark/jars) — there is no spark-submit
        // assembling one for us
        .config("spark.executor.extraClassPath",
          sys.props("java.class.path"))
      else b
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** (rows, content-hash, seconds) per gate; hash is the SUM of row
    * xxhash64 over all columns — order-insensitive, engine-stable. */
  private def phase(master: String, sfDir: String)
      : Map[String, (Long, Long, Double)] = {
    val spark = session(master)
    try {
      // one untimed pass pays codegen/JIT so the timed numbers compare
      // steady states, not first-compile noise
      gates.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable =>
          println(s"[cluster] warmup $n FAILED: ${e.getMessage}") }
      }
      gates.map { n =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        // bit_xor: order-insensitive content hash with no ANSI
        // overflow (sum of 2^63-scale hashes trips ansi long math)
        val agg = df.select(xxhash64(df.columns.map(col): _*).as("h"))
          .agg(count(lit(1)).as("n"),
            coalesce(expr("bit_xor(h)"), lit(0L)).as("hx")).collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        n -> (agg.getLong(0), agg.getLong(1), sec)
      }.toMap
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outJson = args.lift(1)

    println("[cluster] phase 1: local[32]")
    val local = phase("local[32]", sfDir)
    println("[cluster] phase 2: local-cluster[4,8,4096]")
    val cluster = phase("local-cluster[4,8,4096]", sfDir)

    var mismatches = List.empty[String]
    val perGate = gates.map { n =>
      val (lr, lh, ls) = local(n)
      val (cr, ch, cs) = cluster(n)
      val ok = lr == cr && lh == ch
      if (!ok) mismatches ::= n
      println(f"[cluster] $n%-32s rows $lr%8d/$cr%-8d " +
        f"hash ${if (lh == ch) "==" else "!="} " +
        f"local $ls%6.2f s cluster $cs%6.2f s")
      s""""$n":{"rows":$lr,"match":$ok,""" +
        f""""local_sec":$ls%.2f,"cluster_sec":$cs%.2f}"""
    }

    // one GSP HTTP PUT end-to-end under the cluster: distributed parse
    // tasks run in real executor JVMs reading the driver-local spool
    println("[cluster] phase 3: GSP PUT under local-cluster")
    val spark = session("local-cluster[4,8,4096]")
    var gspJson = """"gsp":{"skipped":true}"""
    try {
      val li = graft.core.Tables.t(spark, sfDir, "lineitem")
      val dir = java.nio.file.Files.createTempDirectory("gsp_cluster")
      dir.toFile.deleteOnExit()
      val ntPath = dir.resolve("nt").toString
      val subj = concat(lit("<urn:li/"), col("l_orderkey"), lit("/"),
        col("l_linenumber"), lit(">"))
      li.select(concat(
          subj, lit(" <urn:p/part> <urn:part/"), col("l_partkey"),
          lit("> ."), lit("\n"),
          subj, lit(" <urn:p/flag> \""), col("l_returnflag"),
          lit("\" .")).as("line"))
        .write.mode("overwrite").text(ntPath)
      val parts = new java.io.File(ntPath).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName)
      val triples = li.count() * 2
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
        val ok = n == triples / 2
        if (!ok) mismatches ::= "gsp_put"
        println(f"[cluster] gsp put: $triples triples in $sec%.1f s, " +
          s"subjects $n (${if (ok) "ok" else "MISMATCH"})")
        gspJson = s""""gsp":{"triples":$triples,""" +
          f""""sec":$sec%.1f,"match":$ok}"""
      } finally ep.stop()
    } finally spark.stop()

    val json = s"""{"metric":"cluster_smoke","master":""" +
      s""""local-cluster[4,8,4096]","gates":${gates.size},""" +
      s""""mismatches":${mismatches.size},""" +
      s""""detail":{${perGate.mkString(",")},$gspJson}}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    require(mismatches.isEmpty, s"parity mismatches: $mismatches")
  }
}
