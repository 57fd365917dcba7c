package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: phase-split the ingest benchmark (parse+hash / quads save /
  * resources save) to localize throughput changes. Not driver contract. */
object IngestProbe {
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

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest")
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
    Seq("bench_ingest_quads", "bench_ingest_resources").foreach { tn =>
      spark.sql(s"DROP TABLE IF EXISTS $tn")
      val loc = new java.io.File(wh, tn)
      if (loc.exists()) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(loc.toPath).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
    }
    def phase[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"INGEST $name%-20s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val st = phase("fromNTriples(lazy)") {
      graft.rdf.QuadStore.fromNTriples(spark, ntPath, "urn:g/bench")
    }
    phase("quads.count") { println("  n=" + st.quads.count()) }
    phase("save quads") {
      st.quads.write.mode("overwrite")
        .bucketBy(32, "s").sortBy("s")
        .format("parquet").saveAsTable("bench_ingest_quads")
    }
    phase("save resources") {
      st.resources.write.mode("overwrite")
        .bucketBy(32, "rid").sortBy("rid")
        .format("parquet").saveAsTable("bench_ingest_resources")
    }
    phase("final count") { println("  n=" +
      spark.table("bench_ingest_quads").count()) }
    spark.stop()
  }
}
