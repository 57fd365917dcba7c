package graft

import org.apache.spark.sql.SparkSession

/** One-shot sf10 rehearsal runner: each named query once, wall time +
  * output rows (the similarity family is OUTPUT-bound at 100-way
  * near-dup clusters, so rows are the normalizer — see
  * SCALE_REHEARSAL.md round-8 section). Bench's best-of-3 is the wrong
  * harness at this scale: 4 executions of a 25M-pair query measure
  * patience, not plans. */
object ScaleProbe10 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val names = args.lift(1).map(_.split(",").toSeq).getOrElse(Seq(
      "p02_ngram_jaccard", "p13_embed_neardup", "p15_neardup_components",
      "p40_pagerank"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sf10] $n rows=$rows sec=$sec%.1f")
    }
    spark.stop()
  }
}
