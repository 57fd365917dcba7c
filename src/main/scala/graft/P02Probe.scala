package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
object P02Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $tag%-30s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val par = spark.sparkContext.defaultParallelism
    val inv = df
      .select(col("doc_id").as("id"),
        filter(split(lower(col("text")), "\\s+"), w => length(w) > 0).as("ws"))
      .repartition(par)
      .select(col("id"), Dedup.shingleArray(col("ws"), 3).as("sh"))
      .select(col("id"), size(col("sh")).as("nsh"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), col("nsh"), xxhash64(col("s")).as("h"))
    time("inv cold")(inv.count()); time("inv warm")(inv.count())
    val l = inv.select(col("h"), col("id").as("id1"), col("nsh").as("n1"))
    val r = inv.select(col("h"), col("id").as("id2"), col("nsh").as("n2"))
    val joined = l.join(r, "h").filter(col("id1") < col("id2"))
    time("join cold")(joined.count()); time("join warm")(joined.count())
    val agg = joined.groupBy("id1","id2","n1","n2").agg(count(lit(1)).as("common"))
    time("agg cold")(agg.count()); time("agg warm")(agg.count())
    spark.stop()
  }
}
