package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time the EXACT Bench ingest section (fromNTriples +
  * parallel saveBucketed) in a fresh JVM, to split "parallel saves are
  * slow" from "the Bench JVM is slow by ingest time". */
object IngestProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest2")
    val ntPath = dir.resolve("lineitem_nt").toString
    val subj = concat(lit("<urn:li/"), col("l_orderkey"), lit("/"),
      col("l_linenumber"), lit(">"))
    graft.core.Tables.t(spark, sfDir, "lineitem")
      .select(concat(
        subj, lit(" <urn:p/part> <urn:part/"), col("l_partkey"),
        lit("> .\n"),
        subj, lit(" <urn:p/qty> \""), col("l_quantity"),
        lit("\"^^<http://www.w3.org/2001/XMLSchema#decimal> .\n"),
        subj, lit(" <urn:p/flag> \""), col("l_returnflag"),
        lit("\" .").as("line")))
      .write.mode("overwrite").text(ntPath)
    val wh = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    (1 to 2).foreach { round =>
      Seq("bench_ingest_quads", "bench_ingest_resources").foreach { tn =>
        spark.sql(s"DROP TABLE IF EXISTS $tn")
        val loc = new java.io.File(wh, tn)
        if (loc.exists()) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(loc.toPath).iterator().asScala.toSeq
            .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
      }
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val st = graft.rdf.QuadStore.fromNTriples(spark, ntPath, "urn:g/bench")
      st.saveBucketed("bench_ingest")
      val n = spark.table("bench_ingest_quads").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"INGEST2 round=$round n=$n sec=$sec%.2f tps=${n / sec}%.0f")
    }
    spark.stop()
  }
}
