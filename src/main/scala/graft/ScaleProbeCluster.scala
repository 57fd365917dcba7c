package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cluster-shaped parity run (r12 verdict task 6, widened to the FULL
  * gate ledger in r13 per verdict task 4): everything else in this repo
  * runs single-JVM `local[32]`, where closure serialization, broadcast
  * thresholds, task-result sizes and classpath/resource loading are
  * never truly exercised. `local-cluster[4,8,m]` starts a real
  * standalone Master + 4 Workers in-process and forks 4 REAL executor
  * JVMs (separate processes, real serialization, real classloaders
  * reading the PSL snapshot resource etc.), which is the closest a
  * single box gets to multi-executor execution. The r12 21-gate run of
  * this probe found a real bug (SparqlQueries' session-less store cache
  * handing restarted sessions dead pinned plans), which is why r13 runs
  * every gate.
  *
  * Protocol: run EVERY `SparkEntry.queries` gate under plain local[32]
  * (rows + order-insensitive multiplicity-sensitive content digest),
  * stop, re-run identically under local-cluster, compare digests, then
  * drive one GSP HTTP PUT end-to-end under the cluster. Artifact:
  * SCALE_BENCH_cluster.json with per-gate parity + times for both
  * masters + the dd disk-health number (r12 verdict task 8).
  *
  * Digest design (r12 ADVICE fix): the r12 probe xor'd per-row
  * xxhash64, but xor cancels any multiset difference with EVEN
  * multiplicity — two copies of row A swapped for two copies of row B
  * passes both count and xor. r13 SUMS the row hashes as decimal(38,0)
  * (overflow-free: |sum| ≤ 2^63 · rows ≪ 10^38), which is
  * multiplicity-sensitive: changing any row's multiplicity by k shifts
  * the sum by k·h, and a collision now needs hash sums — not hash
  * sets — to coincide.
  *
  * Usage: runMain graft.ScaleProbeCluster [sfDir] [outJson]
  * REQUIRES env SPARK_HOME=/opt/spark AND SPARK_SCALA_VERSION=2.13:
  * the Worker's ExecutorRunner builds the executor command through the
  * launcher library, which (a) resolves SPARK_HOME and (b) — because
  * /opt/spark is a binary dist with no launcher/target build dir —
  * needs SPARK_SCALA_VERSION to skip its source-tree probe (else
  * "Cannot find any build directories").
  */
object ScaleProbeCluster {

  private val gates: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

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

  /** (rows, content-digest, seconds) per gate; digest is the SUM of row
    * xxhash64 over all columns as decimal(38,0) — order-insensitive,
    * multiplicity-sensitive, overflow-free.
    *
    * One untimed warmup pass per phase (r13 ADVICE): both phases share
    * this JVM, so without it phase 1 pays first-compile/codegen JIT that
    * phase 2 inherits warm and the local-vs-cluster timing comparison is
    * systematically biased (the parity digests never were). */
  private def phase(master: String, sfDir: String)
      : Map[String, (Long, String, Double)] = {
    val spark = session(master)
    try {
      gates.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case _: Throwable => } // timed pass reports the failure
      }
      gates.map { n =>
        val t0 = System.nanoTime()
        val rowsDigest =
          try {
            val df = SparkEntry.queries(n)(spark, sfDir)
            val agg = df.select(xxhash64(df.columns.map(col): _*).as("h"))
              .agg(count(lit(1)).as("n"),
                coalesce(sum(col("h").cast("decimal(38,0)")),
                  lit(0).cast("decimal(38,0)")).as("hs")).collect()(0)
            (agg.getLong(0), agg.getDecimal(1).toBigInteger.toString)
          } catch { case e: Throwable =>
            println(s"[cluster] $n FAILED under $master: ${e.getMessage}")
            (-1L, s"ERROR:${e.getClass.getSimpleName}")
          }
        val sec = (System.nanoTime() - t0) / 1e9
        n -> (rowsDigest._1, rowsDigest._2, sec)
      }.toMap
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outJson = args.lift(1)
    val dd = graft.probe.DiskProbe.jsonFragment()
    println(s"[cluster] disk probe: {$dd}")

    println(s"[cluster] phase 1: local[32], ${gates.size} gates")
    val local = phase("local[32]", sfDir)
    println(s"[cluster] phase 2: local-cluster[4,8,4096], " +
      s"${gates.size} gates")
    val cluster = phase("local-cluster[4,8,4096]", sfDir)

    var mismatches = List.empty[String]
    val perGate = gates.map { n =>
      val (lr, lh, ls) = local(n)
      val (cr, ch, cs) = cluster(n)
      val ok = lr == cr && lh == ch && lr >= 0
      if (!ok) mismatches ::= n
      println(f"[cluster] $n%-32s rows $lr%8d/$cr%-8d " +
        f"digest ${if (lh == ch) "==" else "!="} " +
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
      s""""mismatches":${mismatches.size},$dd,""" +
      s""""detail":{${perGate.mkString(",")},$gspJson}}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    require(mismatches.isEmpty, s"parity mismatches: $mismatches")
  }
}
