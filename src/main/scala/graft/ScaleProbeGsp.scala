package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end throughput probe for the HTTP graph-store import path —
  * the round-10 streaming rewrite (body spooled to disk in 64 KB
  * chunks, parsed distributed): PUT a multi-hundred-MB N-Triples body
  * through a live Endpoint and time the whole request, transport +
  * spool + distributed parse + RID encode + store swap. The point to
  * prove: an import FAR past the 256 MB in-heap cap (which still
  * guards /sparql/ and /update/) streams through without the driver
  * heap ever holding the body, at a rate comparable to the CLI-path
  * ingest bench.
  *
  * Usage: runMain graft.ScaleProbeGsp [sfDir] [copies] [outJson]
  *   (default sf0.1 lineitem x 10 copies = 18M triples, ~1.1 GB)
  */
object ScaleProbeGsp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val outJson = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // untimed: lineitem rdfized to N-Triples text, `copies` distinct
    // variants (per-copy subject namespace — transport must carry
    // DISTINCT triples, not a dedupe-able repeat)
    val dir = java.nio.file.Files.createTempDirectory("gsp_probe")
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
    println(f"[gsp] body: $triples triples, ${totalBytes / 1e6}%.0f MB")

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
      conn.setChunkedStreamingMode(1 << 20) // 1 MB chunks: 64 KB chunked
      // mode costs a flush per chunk on the client side
      val os = conn.getOutputStream
      val buf = new Array[Byte](1 << 20)
      parts.foreach { f =>
        val in = java.nio.file.Files.newInputStream(f.toPath)
        try {
          var n = in.read(buf)
          while (n >= 0) {
            os.write(buf, 0, n)
            if (f == parts.last && n < buf.length) () // tail
            n = in.read(buf)
          }
        } finally in.close()
        os.write('\n')
      }
      os.close()
      val code = conn.getResponseCode
      val sec = (System.nanoTime() - t0) / 1e9
      require(code == 201, s"PUT failed: $code")
      val tps = (triples / sec).toLong
      println(f"[gsp] PUT 201 in $sec%.1f s = $tps T/s, " +
        f"${totalBytes / sec / 1e6}%.0f MB/s end-to-end")
      // untimed sanity: the triples are queryable
      val n = graft.sparql.Sparql.run(ep.store, spark,
        """SELECT ?s WHERE { ?s <urn:p/part> ?o }""").count()
      require(n == triples / 3, s"expected ${triples / 3} subjects, got $n")
      val json =
        s"""{"metric":"gsp_import","triples":$triples,""" +
        s""""bytes":$totalBytes,"sec":$sec,"tps":$tps}"""
      println(json)
      outJson.foreach { p =>
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (json + "\n").getBytes("UTF-8"))
      }
    } finally ep.stop()
    spark.stop()
  }
}
