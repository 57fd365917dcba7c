package graft

import graft.sparql.Sparql

/** Run the reference's TIGER benchmark workload AS WRITTEN
  * (`tests/benchmark/benchmark.rq`, per-query files under `tests/benchmark/queries/`,
  * driven by `tests/benchmark/run.pl:40-80`) against the synthetic TIGER
  * fixture. The reference harness stores no golden results — it reports
  * timings — so correctness here is row-count agreement with the
  * query-suite exemplars that share these queries' shapes
  * (`tests/query/exemplar/tiger-*`), and execution-without-error for the
  * rest.
  *
  * run.pl substitutions reproduced: the install-specific GRAPH IRI
  * (`file:///usr/local/tiger/...` -> the fixture graph) and the
  * `@roadname@` placeholder (bound to "Broadway", run.pl's default
  * workload road).
  */
class RefBenchSpec extends SparkTestBase {

  private val benchDir = "/root/reference/tests/benchmark"

  private def read(path: String): String = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.mkString finally src.close()
  }

  /** #EOQ-separated batch, dropping fully-commented sections (the
    * landmark query is checked in with a leading `#` on every line) */
  private def sections(text: String): List[String] =
    text.split("(?m)^#+EOQ\\s*$").toList.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.linesIterator.forall(l =>
        l.trim.isEmpty || l.trim.startsWith("#")))

  private def subst(q: String): String = q
    .replace("<file:///usr/local/tiger/CA/TGR06001.ttl>",
      s"<${RefParity.tigerGraph}>")
    .replace("@roadname@", "\"Broadway\"")

  private def run(q: String): Long = {
    val (st, _) = RefParity.store(spark)
    Sparql.run(st, spark, subst(q)).count()
  }

  test("benchmark.rq flagship batch runs as written") {
    val qs = sections(read(s"$benchDir/benchmark.rq"))
    assert(qs.size == 5, s"expected 5 active queries, got ${qs.size}")
    val counts = qs.map(run)
    // broadway / harold-ave / sugar-hill / sugar-hill-filter row counts
    // match the query-suite exemplars of the same queries (goldens have
    // a trailing ?-header line except tiger-broadway/harold: header+rows)
    assert(counts(0) == 106, s"broadway: ${counts(0)}") // 107 lines - header
    assert(counts(1) == 4, s"harold-ave: ${counts(1)}")
    assert(counts(2) == 4, s"sugar-hill: ${counts(2)}")
    assert(counts(3) == 2, s"sugar-hill-filter: ${counts(3)}")
    // feature-h12: the fixture's H12 water paths each have a labeled place
    assert(counts(4) >= 5, s"feature-h12: ${counts(4)}")
  }

  test("benchmark queries/ single-query files run as written") {
    for (f <- Seq("broadway-lat-long.rq", "harold-ave.rq",
        "sugar-hill-terrance-west.rq", "sugar-hill-terrance-west-filter.rq",
        "feature-h12.rq")) {
      val n = run(read(s"$benchDir/queries/$f"))
      assert(n > 0, s"$f returned no rows")
    }
  }

  test("roads.rq multi-section workload executes") {
    // 4-hop path joins over start/end points; the synthetic fixture
    // carries Broadway's golden start points but not a full road graph,
    // so the contract here is run.pl's: every section parses, plans, and
    // executes (the reference records timings, not results)
    val qs = sections(read(s"$benchDir/queries/roads.rq"))
    assert(qs.size >= 4)
    qs.foreach(q => assert(run(q) >= 0))
  }
}
