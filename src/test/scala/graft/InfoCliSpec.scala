package graft

import graft.rdf._

/** InfoCli = the reference's 4s-info / 4s-size / 4s-bind / 4s-resolve
  * debug surface over a store. */
class InfoCliSpec extends SparkTestBase {

  private def st = QuadStore.fromTerms(spark, Seq(
    (Uri("urn:a"), Uri("urn:name"), Lit("Alice")),
    (Uri("urn:b"), Uri("urn:name"), Lit("Bob")),
    (Uri("urn:a"), Uri("urn:age"), Lit("30", Xsd.integer))))

  test("freq lists predicates by descending count") {
    val out = InfoCli.run(st, "freq")
    assert(out == Seq("2\turn:name", "1\turn:age"))
  }

  test("size totals per graph") {
    val out = InfoCli.run(st, "size")
    assert(out.last.startsWith("TOTAL") && out.last.trim.endsWith("3"))
  }

  test("bind filters by hex rid slots; resolve round-trips") {
    val p = f"${Rid.uri("urn:name")}%016x"
    val rows = InfoCli.run(st, "bind", Seq("-", "-", p, "-"))
    assert(rows.size == 2)
    // third column of every row is the bound predicate rid
    assert(rows.forall(_.split(" ")(2) == p))
    val res = InfoCli.run(st, "resolve", Seq(p))
    assert(res == Seq(s"$p\turn:name"))
  }

  test("noop and uuid emit one line") {
    assert(InfoCli.run(st, "noop").size == 1)
    val u = InfoCli.run(st, "uuid")
    assert(u.size == 1 && u.head.length == 16)
    // identity is content-derived: same store -> same uuid
    assert(InfoCli.run(st, "uuid") == u)
  }
}
