package graft.sparql

import graft.SparkTestBase
import graft.rdf._

/** `{ SELECT ... }` subqueries (SPARQL 1.1 §12) — extension: the
  * reference explicitly rejects subSELECT
  * (`src/frontend/query.c:1388-1390`). */
class SubSelectSpec extends SparkTestBase {

  lazy val store: QuadStore = QuadStore.fromTerms(spark, Seq(
    (Uri("urn:alice"), Uri("urn:name"), Lit("Alice")),
    (Uri("urn:alice"), Uri("urn:score"), Lit("10", Xsd.integer)),
    (Uri("urn:alice"), Uri("urn:score"), Lit("20", Xsd.integer)),
    (Uri("urn:bob"), Uri("urn:name"), Lit("Bob")),
    (Uri("urn:bob"), Uri("urn:score"), Lit("5", Xsd.integer)),
    (Uri("urn:carol"), Uri("urn:name"), Lit("Carol"))))

  private def rows(q: String): Seq[Seq[String]] =
    Sparql.run(store, spark, q).collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).orNull))

  test("aggregate subquery joined with outer pattern") {
    val r = rows("""SELECT ?n ?total WHERE {
        ?p <urn:name> ?n .
        { SELECT ?p (SUM(?s) AS ?total) WHERE {
            ?p <urn:score> ?s } GROUP BY ?p }
      } ORDER BY ?n""")
    assert(r == Seq(Seq("Alice", "30"), Seq("Bob", "5")))
  }

  test("subquery LIMIT applies before the outer join") {
    val r = rows("""SELECT ?n WHERE {
        ?p <urn:name> ?n .
        { SELECT ?p WHERE { ?p <urn:score> ?s }
          ORDER BY DESC(?s) LIMIT 1 }
      }""")
    assert(r == Seq(Seq("Alice")))
  }

  test("subquery projection hides inner-only variables") {
    val r = rows("""SELECT ?v WHERE {
        { SELECT ?p WHERE { ?p <urn:score> ?s . FILTER(?s > 7) } }
        ?p <urn:name> ?v
      } ORDER BY ?v""")
    assert(r.map(_.head) == Seq("Alice", "Alice"))
  }

  test("DISTINCT subquery") {
    val r = rows("""SELECT ?v WHERE {
        { SELECT DISTINCT ?p WHERE { ?p <urn:score> ?s } }
        ?p <urn:name> ?v
      } ORDER BY ?v""")
    assert(r.map(_.head) == Seq("Alice", "Bob"))
  }

  test("subquery inside UNION branch") {
    val r = rows("""SELECT ?n WHERE {
        { { SELECT ?p WHERE { ?p <urn:score> ?s . FILTER(?s = 5) } }
          ?p <urn:name> ?n }
        UNION { <urn:carol> <urn:name> ?n }
      } ORDER BY ?n""")
    assert(r.map(_.head) == Seq("Bob", "Carol"))
  }
}
