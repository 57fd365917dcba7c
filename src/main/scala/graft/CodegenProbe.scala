package graft

import org.apache.spark.sql.SparkSession
import graft.rdf._
import graft.sparql.Sparql

/** Diagnostic: per-WholeStageCodegen generated-code sizes for query
  * shapes that have overflowed janino's 64 KB method limit; a subtree
  * reporting maxMethodCodeSize:-1 failed to compile and fell back. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val foaf = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:alice"), Uri("urn:name"), Lit("Alice")),
      (Uri("urn:alice"), Uri("urn:age"), Lit("30", Xsd.integer)),
      (Uri("urn:bob"), Uri("urn:name"), Lit("Bob")),
      (Uri("urn:bob"), Uri("urn:age"), Lit("25", Xsd.integer))))
    val ops = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:v"), Lit("1", Xsd.integer)),
      (Uri("urn:b"), Uri("urn:v"), Lit("2", Xsd.integer)),
      (Uri("urn:c"), Uri("urn:v"), Lit("2.5", Xsd.decimal)),
      (Uri("urn:d"), Uri("urn:v"), Lit("4.0e0", Xsd.double))))
    val mbox = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:x1"), Uri("urn:sha"), Lit("aaa")),
      (Uri("urn:x2"), Uri("urn:sha"), Lit("bbb")),
      (Uri("urn:x3"), Uri("urn:sha"), Lit("ccc"))))

    val cases: Seq[(String, QuadStore, String)] = Seq(
      ("filt-arith", foaf, """SELECT ?n WHERE {
        ?p <urn:name> ?n ; <urn:age> ?a . FILTER(?a * 2 >= 55) } ORDER BY ?n"""),
      ("ops-minus1", ops,
        "SELECT ?s WHERE { ?s <urn:v> ?v FILTER (?v - 1 = 1) }"),
      ("or-true-err", ops,
        "SELECT ?s WHERE { ?s <urn:v> ?v . FILTER(?v > 0 || 1/0 > 0) } ORDER BY ?s"),
      ("bind-arith", ops,
        """SELECT ?s ?w WHERE { ?s <urn:v> ?v . BIND(?v * 10 + 1 AS ?w) } ORDER BY ?s"""),
      ("not-filter", ops,
        "SELECT ?s WHERE { ?s <urn:v> ?v . FILTER(!(?v < 0 && 1/0 > 0)) } ORDER BY ?s"),
      ("minus-values", mbox, """SELECT DISTINCT ?x WHERE {
        ?x <urn:sha> ?s .
        MINUS { ?x <urn:sha> "aaa", "bbb" } } ORDER BY ?x"""),
      ("agg-deep-arg", ops,
        "SELECT (SUM(?v * 2 + 1) AS ?sm) WHERE { ?s <urn:v> ?v }"),
      ("opt-deep-cond", foaf, """SELECT ?n ?a WHERE {
        ?p <urn:name> ?n .
        OPTIONAL { ?q <urn:age> ?a . FILTER(?a * 2 >= 55 || ?n = "Bob") } }"""),
      ("groupby-expr-key", ops,
        "SELECT (COUNT(?s) AS ?c) WHERE { ?s <urn:v> ?v } GROUP BY (?v * 2 + 1)"))

    cases.foreach { case (name, store, q) =>
      val df = Sparql.run(store, spark, q)
      df.collect()
      val cg = df.queryExecution.explainString(
        org.apache.spark.sql.execution.CodegenMode)
      var cur = ""; var count = 0
      def flush(): Unit = if (cur.nonEmpty) {
        val failed = cur.contains("maxMethodCodeSize:-1")
        val sz = "maxMethodCodeSize:(-?\\d+)".r
          .findFirstMatchIn(cur).map(_.group(1)).getOrElse("?")
        println(s"[cg] $name ${if (failed) "FAILED" else "ok"} " +
          s"maxMethod=$sz lines=$count")
      }
      var show = 0
      cg.linesIterator.foreach { l =>
        if (l.contains("== Subtree")) { flush(); cur = l.trim; count = 0
          show = if (name == "ops-minus1") 14 else 0 }
        else { count += 1
          if (show > 0 && !l.contains("Generated code")) {
            println(s"[cg]   ${l.take(170)}"); show -= 1 } }
      }
      flush()
    }
    spark.stop()
  }
}
