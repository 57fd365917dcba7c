package graft

import org.apache.spark.sql.SparkSession

/** Temporary: output-volume probe for the sf1 scale rehearsal. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Seq("p02_ngram_jaccard", "p13_embed_neardup",
                  "p15_neardup_components", "p18_graph_triangles");
         d <- Seq("/root/testdata/sf0.1", "/tmp/sf1")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, d).count()
      println(f"PROBE $q%-24s $d%-22s rows=$n%9d  ${(System.nanoTime()-t0)/1e9}%6.2f s")
    }
  }
}
