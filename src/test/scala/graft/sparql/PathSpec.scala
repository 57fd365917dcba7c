package graft.sparql

import graft.SparkTestBase
import graft.rdf._

/** SPARQL 1.1 property paths (§9) — an extension over the reference
  * (Rasqal-era 4store rejects paths); semantics follow the W3C spec:
  * bag semantics for link/inverse/sequence/alternative, set semantics
  * (ALP) for `*`/`+`/`?`, zero-length paths relate terms to themselves.
  */
class PathSpec extends SparkTestBase {

  lazy val store: QuadStore = QuadStore.fromTerms(spark, Seq(
    (Uri("urn:alice"), Uri("urn:knows"), Uri("urn:bob")),
    (Uri("urn:bob"), Uri("urn:knows"), Uri("urn:carol")),
    (Uri("urn:carol"), Uri("urn:knows"), Uri("urn:dave")),
    (Uri("urn:alice"), Uri("urn:name"), Lit("Alice")),
    (Uri("urn:bob"), Uri("urn:name"), Lit("Bob")),
    (Uri("urn:carol"), Uri("urn:name"), Lit("Carol")),
    (Uri("urn:dave"), Uri("urn:name"), Lit("Dave")),
    (Uri("urn:alice"), Uri(Rdf.typ), Uri("urn:Person"))))

  private def rows(q: String): Seq[Seq[String]] =
    Sparql.run(store, spark, q).collect().toSeq.map(r =>
      (0 until r.length).map(i => Option(r.get(i)).map(_.toString).orNull))

  test("one-or-more closure: knows+") {
    val r = rows("""SELECT ?x ?y WHERE { ?x <urn:knows>+ ?y }
      ORDER BY ?x ?y""").map(_.mkString(">"))
    assert(r == Seq(
      "urn:alice>urn:bob", "urn:alice>urn:carol", "urn:alice>urn:dave",
      "urn:bob>urn:carol", "urn:bob>urn:dave",
      "urn:carol>urn:dave"))
  }

  test("seeded closure from a constant subject: <bob> knows+ ?y") {
    val r = rows("""SELECT ?y WHERE { <urn:bob> <urn:knows>+ ?y }
      ORDER BY ?y""").map(_.head)
    assert(r == Seq("urn:carol", "urn:dave"))
  }

  test("zero-or-more includes the zero-length self pair") {
    val r = rows("""SELECT ?y WHERE { <urn:bob> <urn:knows>* ?y }
      ORDER BY ?y""").map(_.head)
    assert(r == Seq("urn:bob", "urn:carol", "urn:dave"))
  }

  test("zero-or-more with a term absent from the graph matches itself") {
    val r = rows("""SELECT ?y WHERE { <urn:nobody> <urn:knows>* ?y }""")
      .map(_.head)
    assert(r == Seq("urn:nobody"))
  }

  test("sequence: knows/name") {
    val r = rows("""SELECT ?n WHERE { <urn:alice> <urn:knows>/<urn:name> ?n }""")
      .map(_.head)
    assert(r == Seq("Bob"))
  }

  test("sequence with closure: knows+/name") {
    val r = rows("""SELECT ?n WHERE { <urn:alice> <urn:knows>+/<urn:name> ?n }
      ORDER BY ?n""").map(_.head)
    assert(r == Seq("Bob", "Carol", "Dave"))
  }

  test("inverse: ^knows") {
    val r = rows("""SELECT ?x WHERE { <urn:carol> ^<urn:knows> ?x }""")
      .map(_.head)
    assert(r == Seq("urn:bob"))
  }

  test("alternative: name|type edges from alice") {
    val r = rows("""SELECT ?v WHERE { <urn:alice> (<urn:name>|a) ?v }
      ORDER BY ?v""").map(_.head)
    assert(r == Seq("urn:Person", "Alice"))
  }

  test("zero-or-one: knows?") {
    val r = rows("""SELECT ?y WHERE { <urn:bob> <urn:knows>? ?y }
      ORDER BY ?y""").map(_.head)
    assert(r == Seq("urn:bob", "urn:carol"))
  }

  test("negated property set: !(knows|a)") {
    val r = rows("""SELECT ?v WHERE {
        <urn:alice> !(<urn:knows>|a) ?v }""").map(_.head)
    assert(r == Seq("Alice"))
  }

  test("negated property set, inverse member only: !(^knows)") {
    // reverse edges whose predicate is not knows: name/type literals have
    // no outgoing edges, so only ^name / ^type style reversals qualify —
    // from bob the only non-knows reverse edge is none
    val r = rows("""SELECT ?v WHERE { <urn:bob> !(^<urn:knows>) ?v }
      ORDER BY ?v""").map(_.head)
    assert(r == Seq())
  }

  test("closure terminates on cycles and includes back-pairs") {
    val cyc = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:x"), Uri("urn:next"), Uri("urn:y")),
      (Uri("urn:y"), Uri("urn:next"), Uri("urn:x"))))
    val r = Sparql.run(cyc, spark,
      """SELECT ?a ?b WHERE { ?a <urn:next>+ ?b } ORDER BY ?a ?b""")
      .collect().toSeq.map(x => s"${x.get(0)}>${x.get(1)}")
    assert(r == Seq("urn:x>urn:x", "urn:x>urn:y",
      "urn:y>urn:x", "urn:y>urn:y"))
  }

  test("path joins with surrounding BGP") {
    val r = rows("""SELECT ?n WHERE {
        ?p a <urn:Person> . ?p <urn:knows>+/<urn:name> ?n }
      ORDER BY ?n""").map(_.head)
    assert(r == Seq("Bob", "Carol", "Dave"))
  }

  test("closure under GRAPH ?g stays scoped per named graph") {
    // two graphs with disjoint chains: closure must not hop across
    val gstore = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:next"), Uri("urn:b")),
      (Uri("urn:b"), Uri("urn:next"), Uri("urn:c"))), graph = "urn:g1")
      .union(QuadStore.fromTerms(spark, Seq(
        (Uri("urn:c"), Uri("urn:next"), Uri("urn:d"))), graph = "urn:g2"))
    val r = Sparql.run(gstore, spark,
      """SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x <urn:next>+ ?y } }
         ORDER BY ?g ?x ?y""")
      .collect().toSeq.map(x => s"${x.get(0)}|${x.get(1)}>${x.get(2)}")
    assert(r == Seq(
      "urn:g1|urn:a>urn:b", "urn:g1|urn:a>urn:c", "urn:g1|urn:b>urn:c",
      "urn:g2|urn:c>urn:d"))
  }

  test("inverse inside a sequence: name of who knows carol") {
    val r = rows("""SELECT ?n WHERE {
        <urn:carol> ^<urn:knows>/<urn:name> ?n }""").map(_.head)
    assert(r == Seq("Bob"))
  }

  test("mixed negated property set: !(name|^knows)") {
    // forward edges not named `name` from alice: knows + rdf:type
    // reverse edges not `knows` into alice: none
    val r = rows("""SELECT ?v WHERE { <urn:alice> !(<urn:name>|^<urn:knows>) ?v }
      ORDER BY ?v""").map(_.head)
    assert(r == Seq("urn:Person", "urn:bob"))
  }

  test("parenthesized alternation under closure: (knows|name)+") {
    val r = rows("""SELECT ?v WHERE { <urn:carol> (<urn:knows>|<urn:name>)+ ?v }
      ORDER BY ?v""").map(_.head)
    // carol knows dave; dave has a name; carol has a name
    assert(r == Seq("urn:dave", "Carol", "Dave"))
  }

  test("FROM dataset restriction scopes path edges") {
    val g1 = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:next"), Uri("urn:b"))), graph = "urn:g1")
    val g2 = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:b"), Uri("urn:next"), Uri("urn:c"))), graph = "urn:g2")
    val both = g1.union(g2)
    val r = Sparql.run(both, spark,
      """SELECT ?y FROM <urn:g1> WHERE { <urn:a> <urn:next>+ ?y }""")
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("urn:b")) // g2's hop b->c is outside the dataset
  }

  test("closure covers chains far beyond the BFS round budget") {
    // a 100-hop chain forces the doubling phase (BFS alone would need
    // 100 rounds); pair count of a full chain closure = n*(n+1)/2
    val n = 100
    val chain = QuadStore.fromTerms(spark,
      (0 until n).map(i =>
        (Uri(s"urn:n$i"), Uri("urn:next"), Uri(s"urn:n${i + 1}"))))
    val all = Sparql.run(chain, spark,
      "SELECT ?a ?b WHERE { ?a <urn:next>+ ?b }")
    assert(all.count() == n.toLong * (n + 1) / 2)
    // seeded walk past depth 16 falls back to filtered full closure
    val fromHead = Sparql.run(chain, spark,
      "SELECT ?b WHERE { <urn:n0> <urn:next>+ ?b }")
    assert(fromHead.count() == n.toLong)
  }

  test("plain predicates still parse as ordinary triples") {
    val r = rows("""SELECT ?n WHERE { ?x <urn:name> ?n . } ORDER BY ?n""")
      .map(_.head)
    assert(r == Seq("Alice", "Bob", "Carol", "Dave"))
  }
}
