package graft

import graft.rdf.{QuadStore, Turtle}
import graft.sparql.{Sparql, Update}

/** Semantic parity over the reference's remaining shipped fixtures
  * (`data/dates.ttl`, `data/numbers.ttl`, `data/group-by.ttl`) — the
  * queries its HTTP golden suite (`tests/httpd/scripts`) runs against
  * them, asserted at the VALUE level. Byte-level output parity is not
  * the target here: those goldens encode C printf float formatting
  * (`2.500000e0`, `1.23457e+19`) and the reference's decimal-division
  * artifacts (`avg = 2.9999999999999999985` where the exact answer is
  * 3), which we deliberately do not reproduce.
  */
class RefFixtureSpec extends SparkTestBase {

  // base = graph URI, as the reference's HTTP PUT resolves relative
  // subjects (`<a>` in dates.ttl -> http://example.com/a)
  private lazy val dates = QuadStore.fromTerms(spark,
    Turtle.parseFile("/root/reference/data/dates.ttl",
      "http://example.com/dates.ttl"),
    "http://example.com/dates.ttl")
  private lazy val numbers = QuadStore.fromTerms(spark,
    Turtle.parseFile("/root/reference/data/numbers.ttl",
      "http://example.com/numbers.ttl"),
    "http://example.com/numbers.ttl")
  private lazy val groupBy = QuadStore.fromTerms(spark,
    Turtle.parseFile("/root/reference/data/group-by.ttl",
      "http://example.com/group-by.ttl"),
    "http://example.com/group-by.ttl")

  // ---- tests/httpd/scripts/date-comparison ----

  test("date-comparison: ORDER BY over mixed date/dateTime lexicals") {
    val rows = Sparql.run(dates, spark,
      """SELECT ?o ?v WHERE { GRAPH <http://example.com/dates.ttl>
        |{ ?o <test:date> ?v }} ORDER BY ?v""".stripMargin)
      .collect().map(_.getString(0).stripPrefix("http://example.com/"))
      .toSeq
    // the reference's golden order (date-only lexicals sort at midnight)
    assert(rows == Seq("a", "b", "c", "d", "e", "f", "h", "g", "i"))
  }

  test("date-comparison: <, =, <= filters and constant comparison") {
    def one(q: String) = Sparql.run(dates, spark, q).collect()
    assert(one(
      """BASE <http://example.com/> SELECT * WHERE {
        |  GRAPH <http://example.com/dates.ttl> {
        |    <a> <test:date> ?date1 . <h> <test:date> ?date2 .
        |    FILTER ( ?date1 < ?date2 ) }}""".stripMargin).length == 1)
    assert(one(
      """BASE <http://example.com/> ASK WHERE {
        |  GRAPH <http://example.com/dates.ttl> {
        |    <g> <test:date> ?date1. <h> <test:date> ?date2.
        |    FILTER ( ?date1 = ?date2 ) .}}""".stripMargin)(0)
      .getBoolean(0) == false)
    assert(one(
      """BASE <http://example.com/> ASK WHERE {
        |  GRAPH <http://example.com/dates.ttl> {
        |    <a> <test:date> ?date1. <h> <test:date> ?date2.
        |    FILTER ( ?date1 <= ?date2 ) .}}""".stripMargin)(0)
      .getBoolean(0) == true)
    assert(one(
      """BASE <http://example.com/>
        |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT * WHERE { GRAPH <http://example.com/dates.ttl> {
        |  <a> <test:date> ?date1 .
        |  FILTER (?date1 < "2010-03-09T00:00:01Z"^^xsd:dateTime) } }"""
        .stripMargin).length == 1)
  }

  // ---- tests/httpd/scripts/count-sum-avg-distinct ----

  test("count/sum/avg DISTINCT over inserted numeric graph") {
    val empty = QuadStore.fromTerms(spark, Nil)
    val st = Update(empty, spark,
      """INSERT DATA { GRAPH <g> {
        |<r> <y> 1 . <t> <y> 2 . <z> <y> 3 .
        |<r1> <y> 4 . <t1> <y> 5 . <z1> <y> 1 .
        |<r2> <y> 2 . <t2> <y> 3 . <z3> <y> 4 .
        |} }""".stripMargin)
    def scalar(q: String): String =
      Sparql.run(st, spark, q).collect()(0).getString(0)
    assert(scalar("SELECT (count(DISTINCT ?o) as ?c) WHERE { ?s <y> ?o }")
      == "5")
    assert(scalar("SELECT (sum(DISTINCT ?o) as ?c) WHERE { ?s <y> ?o }")
      == "15")
    // exact decimal average: 15/5 (the reference's fs_decimal division
    // prints 2.9999999999999999985 — we are exact)
    assert(scalar("SELECT (avg(DISTINCT ?o) as ?c) WHERE { ?s <y> ?o }")
      .toDouble == 3.0)
    assert(scalar("SELECT (count(?o) as ?c) WHERE { ?s <y> ?o }") == "9")
    assert(scalar(
      """SELECT (COUNT(DISTINCT ?o) as ?c) WHERE {
        |  ?s <y> ?o . FILTER( ?o > 2) }""".stripMargin) == "3")
  }

  // ---- tests/httpd/scripts/groupby-order-limit ----

  test("groupby-order-limit: FROM dataset + OPTIONAL count + order") {
    val rows = Sparql.run(groupBy, spark,
      """PREFIX owl: <http://www.w3.org/2002/07/owl#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT DISTINCT ?child (COUNT(?sub_child) as ?c)
        |FROM <http://example.com/group-by.ttl>
        |WHERE {
        |       ?child a owl:Class .
        |       ?child rdfs:subClassOf <http://foaf.qdos.com/0> .
        |       OPTIONAL { ?sub_child rdfs:subClassOf ?child . }
        |} GROUP BY ?child ORDER BY DESC(xsd:integer(?c)) LIMIT 2"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("http://foaf.qdos.com/1", "3"),
      ("http://foaf.qdos.com/2", "1")))
  }

  test("FROM restricts the default graph") {
    val both = dates.union(numbers)
    val all = Sparql.run(both, spark,
      "SELECT ?s WHERE { ?s ?p ?o }").count()
    val only = Sparql.run(both, spark,
      """SELECT ?s FROM <http://example.com/dates.ttl>
        |WHERE { ?s ?p ?o }""".stripMargin).count()
    assert(only == 9 && all > only)
  }

  test("FROM NAMED scopes GRAPH patterns; FROM-only empties them") {
    val both = dates.union(numbers)
    // FROM NAMED: GRAPH ?g ranges over exactly the named set
    val named = Sparql.run(both, spark,
      """SELECT ?s FROM NAMED <http://example.com/dates.ttl>
        |WHERE { GRAPH ?g { ?s ?p ?o } }""".stripMargin).count()
    assert(named == 9)
    // FROM only: the named-graph scope is empty (SPARQL 1.1 §13.2)
    val fromOnly = Sparql.run(both, spark,
      """SELECT ?s FROM <http://example.com/dates.ttl>
        |WHERE { GRAPH ?g { ?s ?p ?o } }""".stripMargin).count()
    assert(fromOnly == 0)
    // a constant GRAPH outside FROM NAMED matches nothing
    val outside = Sparql.run(both, spark,
      """SELECT ?s FROM NAMED <http://example.com/dates.ttl>
        |WHERE { GRAPH <http://example.com/numbers.ttl> { ?s ?p ?o } }"""
        .stripMargin).count()
    assert(outside == 0)
  }

  test("BIND after OPTIONAL sees the optional variable") {
    val st = dates // any store; vars come from the pattern
    val rows = Sparql.run(st, spark,
      """BASE <http://example.com/>
        |SELECT ?z WHERE {
        |  <a> <test:date> ?d
        |  OPTIONAL { <a> <test:missing> ?y }
        |  BIND(COALESCE(?y, ?d) AS ?z)
        |}""".stripMargin).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "2010-03-09")
  }

  test("PNAME followed by statement dot lexes as name + terminator") {
    val rows = Sparql.run(dates, spark,
      """PREFIX t: <test:>
        |BASE <http://example.com/>
        |SELECT ?v WHERE { <a> t:date ?v. }""".stripMargin).collect()
    assert(rows.length == 1 && rows(0).getString(0) == "2010-03-09")
  }

  test("Turtle lexes integer+statement-dot and decimals correctly") {
    val ts = Turtle.parse("@prefix : <urn:x:> .\n:s :p 1 .\n:q :r 2.5 .")
    val objs = ts.map { case (_, _, o) => o }
    assert(objs.contains(graft.rdf.Lit("1",
      "http://www.w3.org/2001/XMLSchema#integer")))
    assert(objs.contains(graft.rdf.Lit("2.5",
      "http://www.w3.org/2001/XMLSchema#decimal")))
  }

  // ---- tests/import/scripts/lengthy over data/lengthy.nt ----

  test("lengthy.nt: long multi-line and empty literals round-trip") {
    val st = QuadStore.fromFile(spark, "/root/reference/data/lengthy.nt")
    assert(st.quads.count() == 3)
    val lex = Sparql.run(st, spark,
      """SELECT ?o WHERE {
        |  <http://example.org/word/a> <http://example.org/definition> ?o
        |}""".stripMargin).collect()(0).getString(0)
    assert(lex.startsWith("1. The first letter of the alphabet.\n"))
    assert(Sparql.run(st, spark,
      """SELECT ?s WHERE { ?s <http://example.org/value> "" }""")
      .collect()(0).getString(0) == "http://example.org/empty")
  }

  // ---- tests/httpd/scripts/multiple-predicate over loves-hates.ttl ----

  test("multiple-predicate: repeated predicate var across patterns") {
    val st = QuadStore.fromTerms(spark,
      Turtle.parseFile("/root/reference/data/loves-hates.ttl"),
      "http://example.com/loves-hates.ttl")
    val rows = Sparql.run(st, spark,
      """PREFIX : <http://example.com/>
        |SELECT ?s ?p ?o WHERE { ?s ?p :sushi . ?s ?p ?o }
        |ORDER BY ?s ?p ?o""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      ("http://example.com/Frank", "http://example.com/hates",
        "http://example.com/sushi"),
      ("http://example.com/John", "http://example.com/loves",
        "http://example.com/Mary"),
      ("http://example.com/John", "http://example.com/loves",
        "http://example.com/sushi")))
  }

  // ---- data/illegal.ttl: UCHAR escapes parse; raw whitespace rejects ----

  test("IRI unicode escapes parse; illegal raw-whitespace IRIs reject") {
    val bs = "\\" // literal backslash, built outside triple quotes
    val ts = Turtle.parse(
      "@prefix : <foo:> .\n" +
        s":c :esc-angle <http://example.org/${bs}u003Eangle> .\n" +
        s":h :goat <http://example.org/${bs}U00010052goat> .\n")
    assert(ts.map { case (_, _, graft.rdf.Uri(u)) => u }.toSet ==
      Set("http://example.org/>angle",
        "http://example.org/" + new String(Character.toChars(0x10052)) +
          "goat"))
    // the reference's Raptor rejects the raw-newline/tab/space IRIs in
    // data/illegal.ttl; our reader rejects the document the same way
    intercept[IllegalArgumentException] {
      Turtle.parseFile("/root/reference/data/illegal.ttl")
    }
  }

  // ---- tests/httpd/scripts/number-comparison ----

  test("number-comparison: mixed integer/decimal/float/double filters") {
    // counts derived from data/numbers.ttl (39 values; the overflowing
    // float lexicals decode to +/-inf and compare numerically)
    def n(filter: String): Long = Sparql.run(numbers, spark,
      s"""BASE <http://example.com/>
         |SELECT ?o WHERE { GRAPH <http://example.com/numbers.ttl> {
         |  ?s <test:num> ?o . $filter }}""".stripMargin).count()
    assert(n("FILTER (?o < -2)") == 15)
    assert(n("FILTER (?o > -2)") == 24)
    assert(n("FILTER (?o < -2.5)") == 8)
    assert(n("FILTER (?o > -2.5)") == 28)
    assert(n("FILTER (?o > -2.51) . FILTER (?o < -2.49)") == 9)
  }

  // ---- tests/httpd/scripts/groupby-multiple-joins ----

  test("groupby-multiple-joins: full ascending group ordering") {
    val rows = Sparql.run(groupBy, spark,
      """PREFIX owl: <http://www.w3.org/2002/07/owl#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT DISTINCT ?child (COUNT(?sub_child) as ?c)
        |FROM <http://example.com/group-by.ttl>
        |WHERE {
        |       ?child a owl:Class .
        |       ?child rdfs:subClassOf <http://foaf.qdos.com/0> .
        |       OPTIONAL { ?sub_child rdfs:subClassOf ?child . }
        |} GROUP BY ?child ORDER BY ASC(xsd:integer(?c)) ?child"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // matches tests/httpd/exemplar/groupby-multiple-joins exactly:
    // class 3 has no subclasses -> COUNT over its unmatched OPTIONAL = 0
    assert(rows == Seq(
      ("http://foaf.qdos.com/3", "0"),
      ("http://foaf.qdos.com/2", "1"),
      ("http://foaf.qdos.com/1", "3")))
  }

  // ---- tests/httpd/scripts/union-logic ----

  test("union-logic: BIND inside UNION branches tags each branch") {
    val st = Update(QuadStore.fromTerms(spark, Nil), spark,
      "INSERT DATA { GRAPH <a> { <x> <y> <z> . <a> <b> <c> . } }")
    val rows = Sparql.run(st, spark,
      """SELECT DISTINCT * WHERE {
        |{ ?s <b> ?o BIND(1 as ?union) . }
        |UNION
        |{ ?s <b> ?o BIND(2 as ?union) . }
        |} ORDER BY ?s""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(_._3)
    assert(rows.toSeq == Seq(("a", "c", "1"), ("a", "c", "2")))
  }

  // ---- tests/httpd/scripts/functions-abs over data/numbers.ttl ----

  test("ABS is decimal-exact (no double rounding)") {
    def absOf(subj: String): String = Sparql.run(numbers, spark,
      s"""BASE <http://example.com/>
         |SELECT (ABS(?d) AS ?a) WHERE { <$subj> <test:num> ?d }"""
        .stripMargin).collect()(0).getString(0)
    assert(absOf("k") == "1234567890.232393") // decimal, not 1.23456789E9
    assert(absOf("h") == "1234567890123456789") // 19-digit integer exact
    assert(absOf("e") == "1234")
    assert(absOf("y") == "0.0004999")
    assert(absOf("za") == "2.0005")
  }

  // ---- tests/httpd/scripts/functions-round over data/numbers.ttl ----

  test("ROUND rounds half toward +infinity, decimal-exact, inf-safe") {
    def roundOf(subj: String): String = Sparql.run(numbers, spark,
      s"""BASE <http://example.com/>
         |SELECT (ROUND(?d) AS ?r) WHERE { <$subj> <test:num> ?d }"""
        .stripMargin).collect()(0).getString(0)
    // exemplar functions-round rows j/k: ±1234567890.23239300
    assert(roundOf("j") == "1234567890")
    assert(roundOf("k") == "-1234567890") // toward +inf, not away from 0
    assert(roundOf("g") == "1234567890123456789") // integer identity
    def expr(e: String): String = Sparql.run(numbers, spark,
      s"SELECT ($e AS ?r) WHERE {}").collect()(0).getString(0)
    assert(expr("ROUND(2.5)") == "3")
    assert(expr("ROUND(-2.5)") == "-2")
    assert(expr("FLOOR(-2.5)") == "-3")
    assert(expr("CEIL(-2.5)") == "-2")
  }

  // ---- tests/httpd/scripts/functions-substr over data/nasty.ttl's
  // <test:data> <test:bcd> plain strings (the exemplar's typed-literal
  // rows document 4store DROPPING rows whose projection expression
  // errors — we follow the spec instead: error -> unbound) ----

  private lazy val nasty = QuadStore.fromTerms(spark,
    Turtle.parseFile("/root/reference/data/nasty.ttl",
      "http://example.com/nasty.ttl"))

  test("SUBSTR follows fn:substring: 0 start, fractional rounding, window") {
    def ss(args: String, in: String): String = Sparql.run(nasty, spark,
      s"""SELECT (SUBSTR("$in"$args) AS ?ss) WHERE {}""")
      .collect()(0).getString(0)
    // exemplar functions-substr rows (plain-literal subset)
    assert(ss(", 0", "0123............3210") == "0123............3210")
    assert(ss(", 2", "-1234567890.23239300") == "1234567890.23239300")
    assert(ss(", 10, 2", "0123456789.0123456789012345678") == "9.")
    assert(ss(", 15.4, 2.3", "-1234567890.23239300") == "23")
    assert(ss(", 15, 100", "0123............3210") == "..3210")
    // fn:substring window: start 0 with length counts position 0
    assert(ss(", 0, 3", "abcde") == "ab")
    assert(ss(", -1, 4", "abcde") == "ab")
  }

  test("STRBEFORE/STRAFTER: exemplar rows, kind preservation, lang rules") {
    def one(q: String): (String, String) = {
      val r = Sparql.runTerms(nasty, spark, q).collect()(0).getStruct(0)
      (r.getAs[String]("lex"), r.getAs[String]("lang"))
    }
    // exemplar functions-substr STRBEFORE/STRAFTER rows
    assert(one("""SELECT (STRBEFORE("-1234567890.23239300", "789") AS ?b)
      WHERE {}""")._1 == "-123456")
    assert(one("""SELECT (STRAFTER("0123456789.0123456789012345678", "789")
      AS ?b) WHERE {}""")._1 == ".0123456789012345678")
    assert(one("""SELECT (STRBEFORE(".-+e.-+e", "789") AS ?b)
      WHERE {}""") == (("", "")))
    // found match keeps arg1's language (exemplar's STRLANG variant)
    assert(one("""SELECT (STRBEFORE(STRLANG("0123456789", "en-GB"), "89")
      AS ?b) WHERE {}""") == (("01234567", "en-gb")))
    // no match -> empty SIMPLE literal (spec; the reference emits
    // ""@en-GB here, documented nonconformance)
    assert(one("""SELECT (STRAFTER(STRLANG("abc", "en-GB"), "z") AS ?b)
      WHERE {}""") == (("", "")))
    // incompatible language tags -> error (unbound)
    assert(one("""SELECT (STRBEFORE(STRLANG("abc", "en"),
      STRLANG("b", "cy")) AS ?b) WHERE {}""")._1 == null)
  }
}
