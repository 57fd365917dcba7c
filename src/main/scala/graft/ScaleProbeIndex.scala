package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10 rehearsal of the inverted-index retrieval lifecycle: build the
  * postings index over the full corpus ONCE (timed), append a second
  * drop (timed — re-tokenizes only the drop, rescans only the id+dl
  * doclens), then run BM25 queries against the grown index (timed
  * each) — the build-once/query-many claim needs the query-side number
  * separately from the build it amortizes. Prints one JSON line and
  * optionally writes it.
  *
  * Usage: runMain graft.ScaleProbeIndex <sfDir> [outJson]
  */
object ScaleProbeIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dd = probe.DiskProbe.writeMBps()
    val cpuRef = probe.DiskProbe.cpuRefSec()
    println(f"[idx] dd=$dd%.0f MB/s cpuRef=$cpuRef%.2f s")

    val docs = core.Tables.t(spark, sfDir, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-idxprobe-").toString
    def lap[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[idx] $what sec=$s%.2f")
      (a, s)
    }
    // build on the even half, append the odd half: both motions timed
    // at corpus scale
    val (_, buildSec) = lap("build(even half)") {
      operators.Ranking.buildTextIndex(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", dir)
    }
    val (_, appendSec) = lap("append(odd half)") {
      operators.Ranking.appendToTextIndex(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", dir,
        "drop1")
    }
    val idxBytes: Long = {
      def sz(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(sz).sum else f.length
      sz(new java.io.File(dir))
    }
    // query side: distinct term sets so no result reuse; count() is
    // fine here (every query aggregates through the scoring tree)
    val queries = Seq(
      "q_3terms" -> Seq("dup", "join", "spark"),
      "q_1term" -> Seq("data"),
      "q_miss" -> Seq("zzzznotaterm", "join"))
    val qLaps = queries.map { case (name, terms) =>
      val ((rows), sec) = lap(s"query $name") {
        operators.Ranking.bm25TopKFromIndex(spark, dir, terms, k = 20)
          .collect().length
      }
      (name, rows, sec)
    }
    // the direct path on the same box state, for the amortization ratio
    val (directRows, directSec) = lap("direct bm25 (rescan corpus)") {
      operators.Ranking.bm25TopK(docs, "doc_id", "text",
        Seq("dup", "join", "spark"), k = 20).collect().length
    }
    val qJson = qLaps.map { case (n, r, s) =>
      f""""$n":{"rows":$r,"sec":$s%.3f}""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"index_lifecycle","dd_mbps":$dd%.0f,""" +
        f""""cpu_ref_sec":$cpuRef%.2f,"build_sec":$buildSec%.2f,""" +
        f""""append_sec":$appendSec%.2f,"index_bytes":$idxBytes,""" +
        f""""queries":$qJson,"direct_rows":$directRows,""" +
        f""""direct_sec":$directSec%.2f,"sf":"$sfDir"}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
