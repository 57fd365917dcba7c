package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.rdf.QuadStore
import graft.sinks.Results
import graft.sparql.{Sparql, Update}

/** CLI query tool mirroring the reference's `4s-query`
  * (`src/frontend/4s-query.c:60-140`): run SPARQL against a KB from the
  * command line, choose an output format, and accept `#EOQ`-separated
  * batch input on stdin (the reference's programmatic batch mode).
  *
  * Usage:
  *   QueryCli <data> [format] <query | ->
  *
  *   data    .nt/.nq file -> N-Triples/N-Quads import;
  *           directory    -> driver parquet tables, direct-mapped to RDF
  *   format  text (TSV, default) | csv | json | xml | ascii
  *   query   SPARQL text, or "-" to read stdin queries separated by #EOQ
  *
  * SPARQL Update texts (INSERT/DELETE/...) are detected and applied to the
  * in-session store snapshot, like `4s-update`.
  */
object QueryCli {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: QueryCli <data> [format] <query | ->")
      sys.exit(2)
    }
    val data = args(0)
    val formats = Set("text", "csv", "json", "xml", "ascii")
    val (format, queryArg) =
      if (args.length >= 3 && formats(args(1))) (args(1), args(2))
      else ("text", args(1))

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var store =
      if (data.endsWith(".nt") || data.endsWith(".nq"))
        QuadStore.fromNTriples(spark, data)
      else {
        val dir = new java.io.File(data)
        val tables = graft.core.Tables.names.filter(t =>
          new java.io.File(dir, s"$t.parquet").exists())
        QuadStore.rdfizeDir(spark, data, tables)
      }

    val updateRe =
      "(?is)^\\s*(INSERT|DELETE|CLEAR|DROP|CREATE|ADD|MOVE|COPY)\\b".r
    def runOne(q: String): Unit =
      if (updateRe.findFirstIn(q).isDefined) {
        store = Update(store, spark, q)
        println("# ok")
      } else emit(Sparql.run(store, spark, q), format)

    val queries: Seq[String] =
      if (queryArg == "-")
        scala.io.Source.stdin.mkString.split("(?m)^#EOQ\\s*$").toSeq
          .map(_.trim).filter(_.nonEmpty)
      else Seq(queryArg)
    queries.foreach(runOne)
    spark.stop()
  }

  private def emit(df: DataFrame, format: String): Unit = format match {
    case "json" => println(Results.toJson(df))
    case "xml"  => println(Results.toXml(df))
    case "csv" => Results.toCsvLines(df).foreach(println)
    case "ascii" => // the reference test harness format (FORMAT=ascii)
      df.collect().foreach(r => println((0 until r.length).map(i =>
        if (r.isNullAt(i)) "" else r.get(i).toString).mkString(" ")))
    case _ => // text: TSV with ?var header (output_text)
      Results.toTsvLines(df).collect().foreach(r => println(r.getString(0)))
  }
}
