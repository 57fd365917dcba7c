package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Does a multi-referenced EXPENSIVE projected alias survive Catalyst
  * (CollapseProject cost check + filter pushdown), or get re-inlined?
  * Decides whether staged compilation of SPARQL expressions can rely on
  * intermediate projections for sharing. */
object CseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(10).toDF("x")
    val heavy = regexp_replace(regexp_replace(concat(col("x").cast("string"),
      lit("y")), "y+", "z"), "z+", "w")
    // filter references the alias twice; then a second projection level
    val staged = df.select(col("x"), heavy.as("__h"))
      .filter(col("__h") > "a" && col("__h") < "zzz")
      .select(col("x"), concat(col("__h"), col("__h")).as("hh"))
    val opt = staged.queryExecution.optimizedPlan.toString
    println("[cse] regexp count in optimized plan: " +
      "regexp_replace".r.findAllIn(opt).size)
    println(opt.linesIterator.map(l => "[cse] " + l).mkString("\n"))
    spark.stop()
  }
}
