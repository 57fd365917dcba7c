package graft

import org.apache.spark.sql.SparkSession

/** One-shot sf10 rehearsal runner: each named query once, wall time +
  * output rows (the similarity family is OUTPUT-bound at 100-way
  * near-dup clusters, so rows are the normalizer — see
  * SCALE_REHEARSAL.md). Bench's best-of-3 is the wrong harness at this
  * scale: repeat executions of a 10^9-pair query measure patience, not
  * plans. Also times the ingest pipeline (Bench.ingestBench) when the
  * dataset carries lineitem, and writes the whole run as one JSON
  * artifact when an output path is given.
  *
  * Usage: runMain graft.ScaleProbe10 <sfDir> [names] [outJson]
  */
object ScaleProbe10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val names = args.lift(1).filter(_.nonEmpty).map(_.split(",").toSeq)
      .getOrElse(Seq(
        "p02_ngram_jaccard", "p13_embed_neardup", "p15_neardup_components",
        "p40_pagerank"))
    val outJson = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_WRITE=1: time a noop-format WRITE instead of count()
    // — count prunes map-only output columns (the Bench caveat), so
    // write is the honest action for projection-shaped gates; rows
    // are then counted untimed for the artifact
    val write = sys.env.get("SPARK_GRAFT_WRITE").contains("1")
    // disk-health + CPU-phase reference beside the timings (the
    // SCALE_* adjudication discipline — see probe.DiskProbe)
    val dd = graft.probe.DiskProbe.writeMBps()
    val cpuRef = graft.probe.DiskProbe.cpuRefSec()
    println(f"[sf10] dd=$dd%.0f MB/s cpuRef=$cpuRef%.2f s")
    val results = names.map { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val (rows, sec) =
        if (write) {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val s = (System.nanoTime() - t0) / 1e9
          (fn(spark, sfDir).count(), s) // rows untimed
        } else {
          val r = fn(spark, sfDir).count()
          (r, (System.nanoTime() - t0) / 1e9)
        }
      println(f"[sf10] $n rows=$rows sec=$sec%.1f" +
        (if (write) " (noop-write)" else ""))
      (n, rows, sec)
    }
    val ingest =
      if (new java.io.File(sfDir, "lineitem.parquet").exists())
        Bench.ingestBench(spark, sfDir)
      else ""
    val qJson = results.map { case (n, rows, sec) =>
      s""""$n":{"rows":$rows,"sec":$sec}""" }.mkString("{", ",", "}")
    val json =
      f"""{"metric":"scale_probe","dd_mbps":$dd%.0f,""" +
        f""""cpu_ref_sec":$cpuRef%.2f,""" +
        s""""queries":$qJson,$ingest"sf":"$sfDir"}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
