package graft

import org.apache.spark.sql.SparkSession
import graft.queries.SparqlQueries
import graft.sparql.{Sparql, Update}

/** sf10 rehearsal for the SPARQL QUERY ENGINE (the pipeline family has
  * its own — ScaleProbe10): times the rdfize/import phase and the join/
  * aggregate/closure/update query shapes at 100× the correctness-gate
  * scale, and runs the compat-branch PINNING A/B that the round-9
  * verdict asked to measure rather than assert — the same multi-branch
  * compatibility join executed with the `localCheckpoint` operand pin
  * (production default) and with it disabled (`graft.compat.pin=off`),
  * so the artifact records what the pin actually buys when each of the
  * 2^k branches would otherwise re-execute the upstream join.
  *
  * Store shape at copies=100 of sf0.1 (Sf1Gen): customer 1.5M rows /
  * orders 15M rows, rdfized to ~12M + ~135M quads. Queries run ONCE
  * (single-execution probes, like ScaleProbe10: at this scale repeats
  * measure patience, not plans) except the A/B pair, which runs twice
  * per arm so the artifact shows its own noise floor.
  *
  * Usage: runMain graft.ScaleProbeSparql <sfDir> [outJson]
  */
object ScaleProbeSparql {
  // Second OPTIONAL shares ?tp, bound only for high-value orders after
  // the first OPTIONAL -> maybe-null shared var -> compatBranches with
  // 2^1 = 2 branches whose LEFT operand is the (expensive) first
  // left-outer join over 15M orders. The two texts differ only in a
  // comment so the plan cache (keyed on text) cannot hand the pinned
  // plan to the unpinned arm.
  private def compatQ(tag: String): String =
    s"""# compat-pin probe [$tag]
       |SELECT ?cname ?tp WHERE {
       |  ?c <urn:p:customer:c_custkey> ?ck ;
       |     <urn:p:customer:c_name> ?cname .
       |  OPTIONAL { ?o <urn:p:orders:o_custkey> ?ck ;
       |                <urn:p:orders:o_totalprice> ?tp .
       |             FILTER(?tp > 300000) }
       |  OPTIONAL { ?o2 <urn:p:orders:o_custkey> ?ck ;
       |                 <urn:p:orders:o_totalprice> ?tp .
       |             FILTER(?tp < 10000) }
       |}""".stripMargin

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sfq10")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // import phase, timed separately (the gates' warm() analog): the
    // co-resident stores the probes use
    val (_, importSec) = timed {
      val co = SparqlQueries.adhocStore(spark, sfDir, "customer", "orders")
      co.quads.count()
      val ord = SparqlQueries.adhocStore(spark, sfDir, "orders")
      ord.quads.count()
      val cust = SparqlQueries.adhocStore(spark, sfDir, "customer")
      cust.quads.count()
      val loc = SparqlQueries.adhocLocStore(spark, sfDir)
      loc.quads.count()
    }
    val storeQuads =
      SparqlQueries.adhocStore(spark, sfDir, "customer", "orders")
        .quads.count() +
      SparqlQueries.adhocLocStore(spark, sfDir).quads.count()
    println(f"[sfq10] import+cache $importSec%.1f s")

    val gateNames = Seq(
      "s01_sparql_bgp_join",     // dim-dim BGP join (stays tiny)
      "s02_sparql_optional",     // left join, 1.5M x 15M
      "s04_sparql_minus",        // compat anti-join at the same scale
      "s05_sparql_agg",          // decimal-exact agg over 1.5M customers
      "s07_sparql_order_limit",  // TakeOrdered over 15M orders
      "s17_sparql_path",         // locIn+ closure over 1.5M edges
      "s18_sparql_subselect")    // agg subquery over 15M orders
    val gates = gateNames.map { n =>
      val (rows, sec) = timed(SparkEntry.queries(n)(spark, sfDir).count())
      println(f"[sfq10] $n rows=$rows sec=$sec%.1f")
      (n, rows, sec)
    }

    // update at scale: INSERT..WHERE touching ~a fifth of 15M orders on
    // the immutable snapshot, then a count over the inserted predicate
    val (updRows, updSec) = timed {
      val st = SparqlQueries.adhocStore(spark, sfDir, "customer", "orders")
      val updated = Update(st, spark,
        """INSERT { ?o <urn:flag> "big" } WHERE {
             ?o <urn:p:orders:o_totalprice> ?tp . FILTER(?tp > 400000) }""")
      Sparql.run(updated, spark,
        """SELECT ?o WHERE { ?o <urn:flag> "big" }""").count()
    }
    println(f"[sfq10] s16x_update_insert_where rows=$updRows sec=$updSec%.1f")

    // value-decode axis (the reference's need_val gate,
    // src/frontend/query.c:1155-1194): FILTER on LEXICAL VALUES is the
    // one SPARQL cost profile that changes qualitatively at scale — it
    // either scans the inline-value form or pays a dictionary decode
    // join. s06x: REGEX + STRLEN over 1.5M customer-name literals
    // (12M-quad store). The plan join count is recorded so the artifact
    // itself shows whether the scan stayed decode-free.
    val s06xQ =
      """SELECT ?cname WHERE {
        |  ?c <urn:p:customer:c_name> ?cname .
        |  FILTER(REGEX(?cname, "#0000000(4[0-9])") &&
        |         STRLEN(?cname) > 8) }""".stripMargin
    val s06xDf = SparqlQueries.adhoc(spark, sfDir, Seq("customer"), s06xQ)
    val s06xJoins = s06xDf.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Join"))
    val (s06xRows, s06xSec) = timed(s06xDf.count())
    println(f"[sfq10] s06x_regex_lexical rows=$s06xRows sec=$s06xSec%.1f joins=$s06xJoins")

    // s15x: full-text token join over the 500k-doc corpus (derived
    // fs:token quads). First run pays the index DERIVATION (tokenize +
    // dedupe + cache of the derived store) — the import-side cost the
    // reference pays on every import (import.c:706-760); second run is
    // the query against the warm index.
    val docsDir = args.lift(2).getOrElse("/tmp/sf10d")
    val (ftRows1, ftSec1) = timed(
      SparkEntry.queries("s15_sparql_fulltext")(spark, docsDir).count())
    val (ftRows2, ftSec2) = timed(
      SparkEntry.queries("s15_sparql_fulltext")(spark, docsDir).count())
    println(f"[sfq10] s15x_fulltext build+query=$ftSec1%.1f s " +
      f"warm=$ftSec2%.1f s rows=$ftRows2")

    // compat-pin A/B: three runs per arm (the artifact carries its own
    // noise floor); property restored afterwards
    def runCompat(tag: String): Seq[Double] =
      (1 to 3).map { i =>
        val (rows, sec) = timed(
          SparqlQueries.adhoc(spark, sfDir, Seq("customer", "orders"),
            compatQ(s"$tag$i")).count())
        println(f"[sfq10] compat[$tag] run$i rows=$rows sec=$sec%.1f")
        sec
      }
    val pinned = runCompat("pin")
    System.setProperty("graft.compat.pin", "off")
    val unpinned =
      try runCompat("nopin")
      finally System.clearProperty("graft.compat.pin")

    val gJson = gates.map { case (n, rows, sec) =>
      s""""$n":{"rows":$rows,"sec":$sec}""" }.mkString(",")
    val json =
      s"""{"metric":"scale_probe_sparql","sf":"$sfDir",""" +
      s""""import_sec":$importSec,"store_quads":$storeQuads,""" +
      s""""queries":{$gJson,""" +
      s""""s16x_update_insert_where":{"rows":$updRows,"sec":$updSec},""" +
      s""""s06x_regex_lexical":{"rows":$s06xRows,"sec":$s06xSec,""" +
      s""""plan_joins":$s06xJoins},""" +
      s""""s15x_fulltext":{"rows":$ftRows2,"build_plus_query_sec":$ftSec1,""" +
      s""""warm_query_sec":$ftSec2}},""" +
      s""""compat_pin_ab":{"pinned_sec":[${pinned.mkString(",")}],""" +
      s""""unpinned_sec":[${unpinned.mkString(",")}]}}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
