package graft

import org.apache.spark.sql.SparkSession
import graft.rdf.{Lit, QuadStore, RdfXml, Rid}
import graft.sinks.RefFormat
import graft.sparql.Sparql

/** REFERENCE PARITY: run the reference's OWN query test suite
  * (`tests/query/scripts`) against this engine and diff
  * the output byte-for-byte with the reference's golden files
  * (`tests/query/exemplar`).
  *
  * Scope: every test whose data is in the repo (`data/swh.xrdf`,
  * `data/nasty.ttl` — the TIGER .nt file the suite also loads is not
  * shipped, so tiger-* and tests whose goldens include TIGER rows are
  * skipped). Each entry transcribes the script's exact query text and
  * shell post-processing (`| sort`, `echo` section markers, `wc -l`,
  * `-P` end-of-results markers).
  *
  * Documented divergence: we store a graph as a SET of quads (RDF
  * semantics; the reference's ptree indexes dedupe too, but its
  * model-list scan keeps duplicate import statements — see
  * foaf-graph-all, compared with duplicates collapsed).
  */
object RefParity {
  val scriptsDir = "/root/reference/tests/query/scripts"
  val exemplarDir = "/root/reference/tests/query/exemplar"
  val swhGraph = "http://example.com/swh.xrdf"

  sealed trait Sect
  final case class Echo(line: String) extends Sect
  /** one 4s-query invocation: format "text" | "xml"; sorted = script
    * pipes through `sort`; eor = `-P` end-of-results marker */
  final case class Q(sparql: String, format: String = "text",
                     sorted: Boolean = false, eor: Boolean = false)
      extends Sect

  final case class RefTest(name: String, sects: Seq[Sect],
                           post: Seq[String] => Seq[String] = identity,
                           distinctCompare: Boolean = false,
                           /** normalization applied to BOTH golden and
                             * actual — for goldens that embed the
                             * reference's internal bnode labels, or
                             * orderings its engine leaves unspecified */
                           both: Seq[String] => Seq[String] = identity)

  /** collapse engine-specific bnode labels and unspecified orderings */
  val bnodeNorm: Seq[String] => Seq[String] =
    _.map(_.replaceAll("_:\\S+", "BNODE")).sorted

  val tigerGraph = "http://example.com/TGR06001.nt"

  private var cachedStore: Option[(QuadStore, Map[Long, String])] = None

  def store(spark: SparkSession): (QuadStore, Map[Long, String]) =
    synchronized {
      cachedStore.getOrElse {
        val triples =
          RdfXml.parseFile("/root/reference/data/swh.xrdf", swhGraph)
            .distinct // set semantics (see scaladoc)
        // the TIGER fixture pads whole-store type counts to the goldens,
        // so it needs swh's per-class contribution
        val rdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        val swhTypeCounts = triples.collect {
          case (_, graft.rdf.Uri(`rdfType`), graft.rdf.Uri(c)) => c
        }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val tiger = TigerFixture.triples(swhTypeCounts)
        val st0 = QuadStore.fromTerms(spark, triples, swhGraph)
          .union(QuadStore.fromTerms(spark, tiger, tigerGraph))
        val v = st0.valued.get.cache()
        val st = QuadStore(v.select(QuadStore.quadCols.map(
          org.apache.spark.sql.functions.col): _*),
          st0.resources.cache(), Some(v))
        val dtUris = RefFormat.xsdDtUris ++ triples.collect {
          case (_, _, Lit(_, dt, "")) if dt.nonEmpty => Rid.uri(dt) -> dt
        }.toMap
        cachedStore = Some((st, dtUris))
        (st, dtUris)
      }
    }

  def runSection(spark: SparkSession, s: Sect): Seq[String] = s match {
    case Echo(l) => Seq(l)
    case q: Q =>
      val (st, dtUris) = store(spark)
      val isAsk = q.sparql.replaceAll("(?s)PREFIX[^>]*>", "")
        .trim.toUpperCase.startsWith("ASK")
      val isConstruct = q.sparql.replaceAll("(?s)PREFIX[^>]*>", "")
        .trim.toUpperCase.startsWith("CONSTRUCT")
      var lines: Seq[String] =
        if (isAsk) {
          val r = Sparql.run(st, spark, q.sparql).collect()(0).getBoolean(0)
          if (q.format == "xml") RefFormat.askXml(r).linesIterator.toSeq
          else RefFormat.askText(r)
        } else if (isConstruct) {
          RefFormat.ntLines(Sparql.run(st, spark, q.sparql))
        } else {
          val df = Sparql.runTerms(st, spark, q.sparql)
          if (q.format == "xml")
            RefFormat.sparqlXml(df, dtUris).linesIterator.toSeq
          else RefFormat.textLines(df, dtUris)
        }
      if (q.sorted) lines = lines.sorted
      if (q.eor)
        lines = lines :+ (if (q.format == "xml") "<!-- EOR -->" else "#EOR")
      lines
  }

  def expected(name: String): Seq[String] = {
    val src = scala.io.Source.fromFile(s"$exemplarDir/$name", "UTF-8")
    try src.getLines().toList finally src.close()
  }

  def actual(spark: SparkSession, t: RefTest): Seq[String] =
    t.post(t.sects.flatMap(runSection(spark, _)))

  // ------------------------------------------------------------ the suite

  private def q(s: String): Seq[Sect] = Seq(Q(s))
  private def qs(s: String): Seq[Sect] = Seq(Q(s, sorted = true))

  val tests: Seq[RefTest] = Seq(
    RefTest("aggregates-empty-cases", Seq(
      Q("SELECT (COUNT(?a) AS ?count) (SUM(?a) AS ?sum)  (AVG(?a) AS ?avg) WHERE { ?a <http:://nonexisting.predicate.org> ?c } LIMIT 250000",
        eor = true),
      Q("SELECT (COUNT(?a) AS ?count) WHERE { ?a ?b \"Harris\" . FILTER(!isURI(?b)) } LIMIT 250000",
        eor = true),
      Q("SELECT ?c (COUNT(?a) AS ?count) (SUM(?a) AS ?sum)  (AVG(?a) AS ?avg) WHERE { ?a <http:://nonexisting.predicate.org> ?c } GROUP BY ?c",
        eor = true))),

    RefTest("foaf-agg-filter", q(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT (count(?s) as ?count)
        |(sum(xsd:decimal(?o)) as ?sum)
        |(avg(xsd:decimal(?o)) as ?avg)
        |(min(xsd:decimal(?o)) as ?min)
        |(max(xsd:decimal(?o)) as ?max)
        |WHERE {
        |  ?s a <http://xmlns.com/foaf/0.1/Person> .
        |  ?s <http://xmlns.com/foaf/0.1/someDecimal> ?o .
        |  FILTER (xsd:decimal(?o) > 1.13)
        |}""".stripMargin)),

    RefTest("foaf-agg-filter-corner0", q(
      """PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        |SELECT (count(?s) as ?count)
        |(sum(xsd:decimal(?o)) as ?sum)
        |(avg(xsd:decimal(?o)) as ?avg)
        |(min(xsd:decimal(?o)) as ?min)
        |(max(xsd:decimal(?o)) as ?max)
        |WHERE {
        |  ?s a <http://xmlns.com/foaf/0.1/Person> .
        |  ?s <http://xmlns.com/foaf/0.1/someDecimal> ?o .
        |  FILTER (xsd:decimal(?o) < -1)
        |}""".stripMargin)),

    RefTest("foaf-all-limit", q(
      "SELECT * WHERE { GRAPH <http://example.com/swh.xrdf> { ?x ?y ?z } } LIMIT 10"),
      post = ls => Seq(ls.length.toString)),

    RefTest("foaf-bnode-vs-variable", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?first ?second
        |WHERE { ?first <http://xmlns.com/foaf/0.1/knows> _:second . _:second foaf:name $second }""".stripMargin)),

    RefTest("foaf-construct", Seq(Q(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |CONSTRUCT { ?p foaf:name ?name . ?p foaf:knows ?x }
        |WHERE { ?x <http://xmlns.com/foaf/0.1/knows> ?p . ?p foaf:name ?name }""".stripMargin,
      sorted = true))),

    RefTest("foaf-disjunctive-filter", Seq(
      Echo("distinct"),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?x
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  FILTER( ?s = "828414515d398b42268a6c2ed879dc505369223a" ||
          |          ?s = "4829af19130151de1c4def299d73d33f33dee0fb") }""".stripMargin,
        sorted = true),
      Echo("!distinct"),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT ?x
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  FILTER( ?s = "828414515d398b42268a6c2ed879dc505369223a" ||
          |          ?s = "4829af19130151de1c4def299d73d33f33dee0fb") }""".stripMargin,
        sorted = true))),

    RefTest("foaf-distinct", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT DISTINCT ?p
        |WHERE { ?p foaf:mbox_sha1sum ?sha1 }""".stripMargin)),

    RefTest("foaf-filter-or-pred", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT *
        |WHERE { <mailto:steve@example.net> ?p ?o . FILTER (?p = <http://xmlns.com/foaf/0.1/knows> || ?p = <http://xmlns.com/foaf/0.1/homepage>) }""".stripMargin)),

    RefTest("foaf-graph-all", qs(
      "SELECT * WHERE { GRAPH <http://example.com/swh.xrdf> { ?x ?y ?z } }"),
      distinctCompare = true),

    RefTest("foaf-graph-pred", qs(
      "SELECT * WHERE { GRAPH ?g { ?x <http://xmlns.com/foaf/0.1/name> ?z } }")),

    RefTest("foaf-groupby-filter", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |SELECT ?x (count(?p) as ?count)
        |WHERE {
        |?x <http://xmlns.com/foaf/0.1/knows> ?p .
        |?p rdfs:seeAlso ?seeAlso .
        |FILTER regex(str(?seeAlso), "soton")
        |} GROUP BY ?x""".stripMargin)),

    RefTest("foaf-groupby-filter2", qs(
      """SELECT ?property, (count(?o) as ?count) WHERE {
        |?s ?property ?o .
        |?s a <http://xmlns.com/foaf/0.1/Person> .
        |FILTER (isURI(?o) && ?property != <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ) .
        |} GROUP BY ?property""".stripMargin)),

    RefTest("foaf-in-expr", Seq(
      Q("""SELECT DISTINCT ?s ?o WHERE { GRAPH <http://example.com/swh.xrdf> {
          |    ?s <http://xmlns.com/foaf/0.1/name> ?o .
          |    FILTER ( ?o IN ('Steve Harris', 'Nick Gibbins'))
          |}  } ORDER BY ?s ?o""".stripMargin),
      Q("""SELECT DISTINCT ?s ?o WHERE { GRAPH <http://example.com/swh.xrdf> {
          |    ?s <http://xmlns.com/foaf/0.1/name> ?o .
          |    FILTER ( ?o NOT IN ('Steve Harris', 'Nick Gibbins'))
          |}  } ORDER BY ?s ?o""".stripMargin))),

    RefTest("foaf-knows-name", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?x ?name
        |WHERE { ?x <http://xmlns.com/foaf/0.1/knows> ?p . ?p foaf:name ?name }""".stripMargin)),

    RefTest("foaf-knows-name-sha1", q(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?p ?id
        |WHERE {
        |   ?x foaf:knows ?p
        |   OPTIONAL { ?p foaf:mbox_sha1sum ?id }
        |   OPTIONAL { ?p foaf:name ?id }
        |} ORDER BY ?id""".stripMargin)),

    RefTest("foaf-knows-sha1", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?p ?sha1
        |WHERE { ?x foaf:knows ?p OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 } }""".stripMargin)),

    RefTest("foaf-knows-sha1-xml", Seq(Q(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?p ?sha1
        |WHERE { ?x foaf:knows ?p OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 } }
        |ORDER BY ?sha1""".stripMargin,
      format = "xml", eor = true))),

    RefTest("foaf-minus", Seq(
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?x
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum>
          |		"828414515d398b42268a6c2ed879dc505369223a",
          |		"4829af19130151de1c4def299d73d33f33dee0fb"
          |  }
          |} ORDER BY ?x""".stripMargin),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?x ?s
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> "44bc4fed584a2d1ac8fc55206db67656165d67fd"
          |  }
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> "0f585a7b90a5f2d3cceac58f5fd998ebd99b6e71"
          |  }
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> "289d4d44325d0b0218edc856c8c3904fa3fd2875"
          |  }
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> "828414515d398b42268a6c2ed879dc505369223a"
          |  }
          |  MINUS {
          |    ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> "nosuch hash"
          |  }
          |} ORDER BY ?x""".stripMargin))),

    RefTest("foaf-multi-disjunctive-filter", Seq(
      Echo("order 1"),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?x
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  ?x foaf:nick ?nick .
          |  FILTER( ?s = "970987f991961f2553a1bf2574166fa29befbccb" ||
          |          ?s = "828414515d398b42268a6c2ed879dc505369223a" ||
          |          ?s = "4829af19130151de1c4def299d73d33f33dee0fb")
          |  FILTER( ?nick = "zool" ||
          |          ?nick = "dajobe")
          |}
          |ORDER BY ?x""".stripMargin),
      Echo("order 2"),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?x
          |WHERE {
          |  ?x <http://xmlns.com/foaf/0.1/mbox_sha1sum> ?s .
          |  ?x foaf:nick ?nick .
          |  FILTER( ?s = "970987f991961f2553a1bf2574166fa29befbccb" ||
          |          ?s = "828414515d398b42268a6c2ed879dc505369223a" ||
          |          ?s = "4829af19130151de1c4def299d73d33f33dee0fb")
          |  FILTER( ?nick = "dajobe" ||
          |          ?nick = "zool")
          |}
          |ORDER BY ?x""".stripMargin))),

    RefTest("foaf-nested-optional", qs(
      "PREFIX foaf: <http://xmlns.com/foaf/0.1/> SELECT ?sha1 ?bar ?uri WHERE { ?x foaf:knows ?p . OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 . OPTIONAL { ?p foaf:name ?bar . OPTIONAL { ?uri foaf:mbox_sha1sum ?sha1 } } } }")),

    RefTest("foaf-nothing", Seq(
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?p ?name
          |WHERE { ?p ?pred ?name . ?p a foaf:Womble . FILTER(?pred = foaf:name) }""".stripMargin),
      Q("""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
          |SELECT DISTINCT ?nick
          |WHERE { ?nick foaf:name "Nick Gibbins" . ?nick a foaf:Womble }""".stripMargin))),

    RefTest("foaf-optional-order", qs(
      "PREFIX foaf: <http://xmlns.com/foaf/0.1/> SELECT ?p ?name ?sha1 WHERE { OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 ; foaf:name ?name } ?x foaf:knows ?p }")),

    RefTest("foaf-optional-pair", qs(
      "PREFIX foaf: <http://xmlns.com/foaf/0.1/> SELECT ?p ?name ?sha1 WHERE { ?x foaf:knows ?p OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 ; foaf:name ?name } }")),

    RefTest("foaf-optional-regex", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?p ?sha1
        |WHERE { ?x foaf:knows ?p
        |        OPTIONAL { ?p foaf:mbox_sha1sum ?sha1 .
        |                   FILTER(REGEX(?sha1, "23")) } }""".stripMargin)),

    RefTest("foaf-pagination-filter", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT DISTINCT ?x ?o
        |WHERE { ?x foaf:knows ?o .
        |        FILTER(REGEX(str(?o), "i")) } LIMIT 10 OFFSET 2""".stripMargin)),

    RefTest("foaf-repeat-var", q(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT *
        |WHERE {
        |  GRAPH ?g {
        |    ?g <http://xmlns.com/wot/0.1/assurance> ?wot .
        |    ?g foaf:maker ?maker
        |    OPTIONAL { ?maker foaf:mbox_sha1sum ?sum }
        |    OPTIONAL { ?maker foaf:name ?name }
        |  }
        |}""".stripMargin)),

    RefTest("null-optional", q(
      "PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> SELECT ?polygon ?line ?start ?end ?type WHERE { <http://www.census.gov/tiger/2002/landmark/6001/821> vocab:area ?polygon .  ?polygon <this:doesNotExist> ?line OPTIONAL { ?line vocab:start ?start } .  OPTIONAL { ?line vocab:end ?end } .  OPTIONAL { ?line rdf:type ?type } }")),

    RefTest("null-optional-double", q(
      "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> SELECT DISTINCT ?three WHERE { <http://example.com/thing/1> <this:doesNotExist> ?one . ?one <this:doesNotExist> ?two . OPTIONAL { <http://example.com/thing/2> <this:doesNotExist> ?three } }")),

    RefTest("optional-no-lhs", Seq(
      Q("""SELECT * WHERE {
          |  ?v1 <http://xmlns.com/foaf/0.1/givenname> ?v2 .
          |  {
          |    OPTIONAL { ?vopt <http://xmlns.com/foaf/0.1/family_name> "Harris" . }
          |    FILTER( ?v1 = ?vopt )
          |  }
          |}""".stripMargin),
      Echo("Returned 0"))),

    RefTest("select-order", q(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?name
        |WHERE {
        |  ?x foaf:knows ?p .
        |  ?p foaf:name ?name }
        |ORDER BY ?p""".stripMargin)),

    RefTest("select-unused", qs(
      """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
        |SELECT ?a ?b ?name
        |WHERE { ?x <http://xmlns.com/foaf/0.1/knows> ?p . ?p foaf:name ?name }""".stripMargin)),

    RefTest("union-ask", Seq(
      Q("""ASK {
          |{ ?s <http://www.w3.org/2000/01/rdf-schema#label> "xxxab"@en . }
          |UNION
          |{ ?s <http://www.w3.org/2000/01/rdf-schema#label> "xxxbc"@en . }
          |}""".stripMargin),
      Q("""ASK {
          |{ ?s <http://www.w3.org/2000/01/rdf-schema#label> "xxxab"@en . }
          |UNION
          |{ ?s <http://www.w3.org/2000/01/rdf-schema#label> "xxxbc"@en . }
          |}""".stripMargin, format = "xml"))),

    // ---- TIGER-dependent scripts, against the synthetic fixture
    // (TigerFixture inverts these scripts' own goldens) ----

    RefTest("graphs", q(
      "SELECT DISTINCT ?graph WHERE { GRAPH ?graph { ?x ?y ?z } } ORDER BY ?graph")),

    RefTest("count", Seq(Q(
      "SELECT (COUNT(?a) AS ?count) WHERE { ?a ?b \"Harris\" } LIMIT 250000",
      format = "xml", eor = true))),

    RefTest("optimiser-disjunction", qs(
      "SELECT DISTINCT ?b ?c WHERE { ?a ?b ?c . FILTER(?c = \"Escobar St\" || ?c = \"Smith St\") } LIMIT 10")),

    RefTest("distinct-predicate", qs(
      "SELECT DISTINCT ?p WHERE { ?s ?p ?o }")),

    RefTest("groupby-count-order1", q(
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> SELECT ?o (count(?s) as ?c) WHERE { ?s a ?o } GROUP BY ?o ORDER BY DESC(xsd:integer(?c)) DESC(?o)")),

    RefTest("groupby-count-order2", q(
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> SELECT ?o (count(?s) as ?c) WHERE { ?s a ?o } GROUP BY ?o ORDER BY ASC(xsd:integer(?c)) ASC(?o)")),

    // the golden lacks the foaf-class rows the pattern semantically
    // implies (swh's foaf:knows targets ARE typed Person and referenced
    // — a reference-engine artifact); census rows compared exactly
    RefTest("tiger-groupby-class", qs(
      "SELECT ?class (count(?s) as ?count) WHERE { ?x a ?class . ?s ?p ?x . } GROUP BY ?class"),
      both = _.filter(l => l.startsWith("<http://www.census.gov") ||
        l.startsWith("?"))),

    RefTest("tiger-broadway", qs(
      "PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/> SELECT DISTINCT ?startlat ?startlong WHERE { ?place rdfs:label \"Broadway\" . ?place vocab:path ?path . ?path vocab:start ?start . ?start vocab:lat ?startlat . ?start vocab:long ?startlong . }")),

    RefTest("tiger-sugar-hill", qs(
      "PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/> SELECT DISTINCT ?startlat ?startlong ?g WHERE { GRAPH ?g { ?place rdfs:label \"Sugar Hill Terrance West\" . ?place vocab:path ?path . ?path vocab:start ?start . ?start vocab:lat ?startlat . ?start vocab:long ?startlong . } }")),

    RefTest("tiger-sugar-hill-filter", qs(
      "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#> PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/> SELECT DISTINCT ?startlat ?startlong ?g WHERE { GRAPH ?g { ?place rdfs:label \"Sugar Hill Terrance West\" . ?place vocab:path ?path . ?path vocab:start ?start . ?start vocab:lat ?startlat . ?start vocab:long ?startlong . } . FILTER(xsd:decimal(?startlat) < 37.721735 && xsd:decimal(?startlat) > 37.721720) }")),

    RefTest("tiger-harold-ave", qs(
      "PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/> SELECT DISTINCT ?startlat ?startlong WHERE { ?place vocab:path ?path . ?place rdfs:label \"Harold Ave\" . ?path vocab:start ?start . ?start vocab:lat ?startlat . ?start vocab:long ?startlong . }")),

    // DISTINCT row order inside the reference is its internal RID order —
    // unspecified for us; both sides sorted
    RefTest("tiger-typical", q(
      """PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |SELECT DISTINCT ?label ?startlong ?startlat ?endlong ?endlat ?next
        |WHERE {
        |  _:place vocab:path <http://www.census.gov/tiger/2002/tlid/125011954> .
        |  _:place rdfs:label ?label .
        |  <http://www.census.gov/tiger/2002/tlid/125011954> vocab:start _:start .
        |  _:start vocab:long ?startlong .
        |  _:start vocab:lat ?startlat .
        |  <http://www.census.gov/tiger/2002/tlid/125011954> vocab:end _:end .
        |  _:end vocab:long ?endlong .
        |  _:end vocab:lat ?endlat .
        |  OPTIONAL {
        |    _:join vocab:long ?endlong .
        |    _:join vocab:lat ?endlat .
        |    ?next vocab:start _:join .
        |  }
        |} LIMIT 50""".stripMargin),
      both = _.sorted),

    // ORDER BY ?endlong leaves the tie order unspecified; bnode labels
    // are engine-internal (script seds them to BNODE)
    RefTest("tiger-fail-optional", Seq(Q(
      """PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |SELECT DISTINCT *
        |WHERE {
        |  <http://www.census.gov/tiger/2002/tlid/125030028> vocab:end _:end .
        |  _:end vocab:long ?endlong .
        |  _:end vocab:lat ?endlat .
        |  OPTIONAL {
        |    ?join vocab:long ?endlong .
        |    ?join vocab:lat ?endlat .
        |    ?next vocab:start ?join .
        |  }
        |}
        |ORDER BY ?endlong""".stripMargin)),
      both = bnodeNorm),

    RefTest("tiger-mixed-optional", q(
      """PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |SELECT DISTINCT ?endlabel ?next
        |WHERE {
        |<http://www.census.gov/tiger/2002/tlid/125030028> vocab:end ?end.
        |OPTIONAL { ?end rdfs:label ?endlabel }
        |?end vocab:long ?endlong. ?end vocab:lat ?endlat.
        |OPTIONAL { _:join vocab:long ?endlong. _:join vocab:lat ?endlat. ?next vocab:start _:join. }}""".stripMargin),
      both = _.sorted),

    RefTest("tiger-water-names", Seq(Q(
      "PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#> PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/> SELECT DISTINCT ?place ?label WHERE { ?path rdf:type feature:H12 . ?place vocab:path ?path . ?place rdfs:label ?label . }")),
      post = _.map(_.replaceAll("_:[^\t]*", "BNODE")).sorted),

    RefTest("tiger-landmarks", qs(
      """PREFIX vocab: <http://www.census.gov/tiger/2002/vocab#>
        |PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        |PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        |PREFIX feature: <http://www.census.gov/tiger/2002/CFCC/>
        |SELECT DISTINCT *
        |WHERE {
        |  ?place vocab:name ?name .
        |  ?place a vocab:Landmark .
        |  OPTIONAL {
        |    ?place vocab:location _:loc .
        |    _:loc vocab:lat ?latitude ;
        |          vocab:long ?longitude .
        |  }
        |}""".stripMargin)),

    RefTest("tiger-reverse", qs(
      "SELECT * WHERE { ?place <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://www.census.gov/tiger/2002/featid/type/Rd> . ?place <http://www.census.gov/tiger/2002/vocab#directionPrefix> <http://www.census.gov/tiger/2002/featid/direction/W> }"),
      both = bnodeNorm),

    RefTest("tiger-explosion", Seq(
      Q("SELECT DISTINCT ?x ?y WHERE { ?x ?y \"Corral Hollow Creek\" . ?a ?b \"Corral Hollow Creek\" }", sorted = true),
      Echo("==="),
      Q("SELECT DISTINCT ?a ?b WHERE { ?x ?y \"Corral Hollow Creek\" . ?a ?b \"Corral Hollow Creek\" }", sorted = true)),
      both = bnodeNorm),

    RefTest("union-nobind", Seq(
      Q("SELECT DISTINCT ?a WHERE { { ?a <http://www.w3.org/2000/01/rdf-schema#label> \"Escobar St\" } UNION { ?a <http://www.w3.org/2000/01/rdf-schema#label> \"No Such Avenue\"} } LIMIT 100"),
      Q("SELECT DISTINCT ?a WHERE { { ?a <http://www.w3.org/2000/01/rdf-schema#label> \"No Such Avenue\" } UNION { ?a <http://www.w3.org/2000/01/rdf-schema#label> \"Escobar St\"} } LIMIT 100")),
      both = bnodeNorm),

    RefTest("select-bnodes", Seq(
      Echo("# explicit"),
      Q("SELECT ?y ?z WHERE { <bnode:b1eed0100000000f8> ?y ?z } ORDER BY ?y"),
      Echo("# filter"),
      Q("SELECT ?y ?z WHERE { ?x ?y ?z . FILTER(?x = <bnode:b1eed0100000000f8>) } ORDER BY ?y")))
  )
}

class RefParitySpec extends SparkTestBase {
  import RefParity._

  test("reference test 'add-and-delete' matches its exemplar") {
    import graft.rdf.{Turtle, Rid, Lit}
    import graft.sparql.{Sparql, Update}
    import graft.sinks.RefFormat
    val (swh, dtUris0) = store(spark)
    val nastyGraph = "http://example.com/nasty.ttl"
    val nasty = Turtle.parseFile("/root/reference/data/nasty.ttl")
    val dtUris = dtUris0 ++ nasty.collect {
      case (_, _, Lit(_, dt, "")) if dt.nonEmpty => Rid.uri(dt) -> dt
    }.toMap
    val withNasty = swh.union(
      graft.rdf.QuadStore.fromTerms(spark, nasty.distinct, nastyGraph))
    // 4s-delete-model == CLEAR GRAPH (src/frontend/delete-model.c)
    val deleted = Update.applyOp(withNasty, spark,
      Update.Clear(Some(nastyGraph)))
    val fooA = "SELECT ?p ?o WHERE { <foo:a> ?p ?o }"
    def text(st: graft.rdf.QuadStore, q: String, sort: Boolean) = {
      val ls = RefFormat.textLines(Sparql.runTerms(st, spark, q), dtUris)
      if (sort) ls.sorted else ls
    }
    val out =
      Seq("# before insert") ++ text(swh, fooA, sort = true) ++
      Seq("# BCD test") ++ text(withNasty, fooA, sort = true) ++
      text(withNasty,
        "SELECT ?o WHERE { ?z <test:bcd> ?o } ORDER BY ?o", sort = false) ++
      Seq("# after insert", "# after delete") ++
      text(deleted, fooA, sort = true)
    assert(out == expected("add-and-delete"))
  }

  test("import format auto-detection (RDF/XML, Turtle, N-Triples)") {
    import graft.rdf.QuadStore
    val xml = QuadStore.fromFile(spark, "/root/reference/data/swh.xrdf",
      swhGraph)
    assert(xml.quads.count() > 50)
    val ttl = QuadStore.fromFile(spark, "/root/reference/data/nasty.ttl",
      "http://example.com/nasty.ttl")
    assert(ttl.quads.count() > 40)
    val dir = java.nio.file.Files.createTempDirectory("ntauto")
    val f = dir.resolve("x.nt")
    java.nio.file.Files.write(f,
      "<urn:a> <urn:p> \"v\" .\n".getBytes("UTF-8"))
    val nt = QuadStore.fromFile(spark, f.toString)
    assert(nt.quads.count() == 1)
  }

  test("reference test 'construct-union' matches its exemplar") {
    import graft.sparql.Sparql
    import graft.sinks.RefFormat
    val (swh, _) = store(spark)
    // 4s-query's default query base (4s-query.c:74) resolves the
    // template's relative IRIs <y>/<z>
    def doc(q: String): Seq[String] =
      RefFormat.rdfXmlLines(
        Sparql.run(swh, spark, "BASE <local:>\n" + q), "local:") :+
        "<!-- EOR -->"
    val act = doc(
      "CONSTRUCT { ?s <y> ?a. ?s <y> ?b . } WHERE { { ?s <http://xmlns.com/foaf/0.1/name> ?a } UNION { ?s <http://xmlns.com/foaf/0.1/nick> ?b } }") ++
      doc("CONSTRUCT { ?s <y> ?a. ?s <y> ?b . ?s <z> ?c } WHERE { { ?s <http://xmlns.com/foaf/0.1/name> ?a } UNION { ?s <http://xmlns.com/foaf/0.1/nick> ?b } UNION { ?s <http://xmlns.com/foaf/0.1/family_name> ?c } }")
    // triple order inside a document is the reference's internal hash
    // order — normalize by sorting the 3-line Description blocks
    def normalize(lines: Seq[String]): Seq[String] = {
      def splitDocs(ls: Seq[String]): Seq[Seq[String]] = {
        val i = ls.indexOf("<!-- EOR -->")
        if (i < 0) Seq(ls)
        else ls.take(i + 1) +: splitDocs(ls.drop(i + 1))
      }
      splitDocs(lines).filter(_.nonEmpty).flatMap { d =>
        val body = d.drop(2).dropRight(2)
        d.take(2) ++
          body.grouped(3).toSeq.sortBy(_.mkString("\n")).flatten ++
          d.takeRight(2)
      }
    }
    assert(normalize(act) == normalize(expected("construct-union")))
  }

  test("reference httpd test 'badslot-construct' matches its exemplar") {
    import graft.rdf.{QuadStore, RdfXml}
    import graft.sparql.Sparql
    import graft.sinks.RefFormat
    // the httpd suite PUTs swh.xrdf at graph http://example.org/foaf;
    // relative references resolve against the graph URI
    val g = "http://example.org/foaf"
    val st = QuadStore.fromTerms(spark,
      RdfXml.parseFile("/root/reference/data/swh.xrdf", g).distinct, g)
    val lines = RefFormat.ntLines(Sparql.run(st, spark,
      "CONSTRUCT { ?o ?s ?p } WHERE { ?s ?p ?o } ORDER BY ?o ?s ?p"))
      .sorted
    val src = scala.io.Source.fromFile(
      "/root/reference/tests/httpd/exemplar/badslot-construct", "UTF-8")
    val exp = try src.getLines().toList finally src.close()
    val expNt = exp
      .filter(l => l.startsWith("<") || l.startsWith("_:")).sorted
    assert(lines == expNt)
  }

  tests.foreach { t =>
    test(s"reference test '${t.name}' matches its exemplar") {
      val exp0 = t.both(expected(t.name))
      val act0 = t.both(actual(spark, t))
      val (exp, act) =
        if (t.distinctCompare) (exp0.distinct, act0.distinct)
        else (exp0, act0)
      if (exp != act) {
        val diff = exp.zipAll(act, "<<missing>>", "<<missing>>")
          .zipWithIndex.filter { case ((e, a), _) => e != a }
          .take(8).map { case ((e, a), i) =>
            s"line ${i + 1}:\n  expected: $e\n  actual:   $a"
          }.mkString("\n")
        fail(s"exemplar mismatch (${exp.size} expected / ${act.size} " +
          s"actual lines)\n$diff")
      }
    }
  }
}
