package graft.dawg

import java.io.File
import graft.SparkTestBase
import graft.rdf._
import graft.sparql.{Ast, Parser, Sparql}

/** W3C DAWG-style SPARQL conformance harness — the engine's analog of the
  * reference's manifest walker (`src/dawg-tests/run.sh`, `runtest.pl`):
  * walks `manifest.ttl` files under `src/test/resources/dawg/`, loads each
  * test's data into a fresh store, runs the query, and compares against
  * the expected result set (W3C result-set vocabulary in Turtle — the
  * same format the `testcase` sink emits, reference `output_testcase`,
  * `src/frontend/results.c:2397-2496`).
  *
  * The W3C test *data* is not shipped with the reference (its harness
  * downloads the DAWG manifests), so the suite under resources/dawg is
  * authored here from the published test-suite semantics, structured
  * exactly like data-r2: per-group directories of manifest + .rq + .ttl.
  *
  * Known-failure ledger: `resources/dawg/excuses.txt` (the reference's
  * `excuses.txt`) — excused tests cancel with the recorded reason, and
  * FAIL if they unexpectedly pass, so the ledger can't go stale.
  */
class DawgSpec extends SparkTestBase {

  private val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  private val QT = "http://www.w3.org/2001/sw/DataAccess/tests/test-query#"
  private val RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"
  private val RDFS = "http://www.w3.org/2000/01/rdf-schema#"
  private val UT = "http://www.w3.org/2009/sparql/tests/test-update#"
  /** harness vocabulary: gt:ExpectedErrorTest + gt:errorMatch — LOUD
    * failure modes (non-SILENT SERVICE errors) the W3C result-set
    * vocabulary cannot express */
  private val GT = "http://graft.invalid/tests/vocab#"

  /** tiny in-memory triple index over a parsed Turtle file */
  private final case class G(ts: List[(Term, Term, Term)]) {
    def objs(s: Term, p: String): List[Term] =
      ts.collect { case (`s`, Uri(`p`), o) => o }
    def obj(s: Term, p: String): Option[Term] = objs(s, p).headOption
    def subjsOfType(t: String): List[Term] =
      ts.collect { case (s, Uri(Rdf.typ), Uri(`t`)) => s }
    def list(head: Term): List[Term] = head match {
      case Uri(Rdf.nil) => Nil
      case n => obj(n, Rdf.first).toList :::
        obj(n, Rdf.rest).map(list).getOrElse(Nil)
    }
  }

  /** normalized term for comparison (datatype as URI, not rid) */
  private sealed trait NT
  private case class NUri(u: String) extends NT
  private case class NB(label: String) extends NT
  private case class NLit(lex: String, dt: String, lang: String) extends NT

  private def norm(t: Term): NT = t match {
    case Uri(u) => NUri(u)
    case BNode(b) => NB(b)
    case Lit(lex, dt, lang) =>
      NLit(lex, if (dt == Xsd.string) "" else dt, lang.toLowerCase)
  }

  // java.net.URI renders file URIs as `file:/abs/path`
  private def pathOf(u: String): String =
    u.stripPrefix("file://").stripPrefix("file:")

  // ------------------------------------------------------------ compare

  /** solution compare under a bnode bijection; returns the extended
    * mapping or None */
  private def matchSol(exp: Map[String, NT], got: Map[String, NT],
                       m: Map[String, String]): Option[Map[String, String]] = {
    if (exp.keySet != got.keySet) return None
    var cur = m
    for (k <- exp.keys) (exp(k), got(k)) match {
      case (NB(e), NB(g)) =>
        cur.get(e) match {
          case Some(mapped) => if (mapped != g) return None
          case None =>
            if (cur.valuesIterator.contains(g)) return None // injective
            cur += (e -> g)
        }
      case (a, b) => if (a != b) return None
    }
    Some(cur)
  }

  /** multiset match with backtracking over the bnode bijection */
  private def matchBag(exp: List[Map[String, NT]],
                       got: List[Map[String, NT]],
                       m: Map[String, String]): Boolean = exp match {
    case Nil => got.isEmpty
    case e :: rest =>
      got.indices.exists { i =>
        matchSol(e, got(i), m).exists(m2 =>
          matchBag(rest, got.patch(i, Nil, 1), m2))
      }
  }

  private def matchSeq(exp: List[Map[String, NT]],
                       got: List[Map[String, NT]],
                       m: Map[String, String]): Boolean =
    (exp, got) match {
      case (Nil, Nil) => true
      case (e :: er, g :: gr) =>
        matchSol(e, g, m).exists(m2 => matchSeq(er, gr, m2))
      case _ => false
    }

  /** graph (triple-set) isomorphism for CONSTRUCT results; triples as
    * 3-var solutions so the same matcher applies */
  private def tripleSols(ts: Seq[(Term, Term, Term)]): List[Map[String, NT]] =
    ts.map { case (s, p, o) =>
      Map("s" -> norm(s), "p" -> norm(p), "o" -> norm(o)) }.toList

  // ------------------------------------------------------------- runner

  private def dtUriMap(store: QuadStore): Map[Long, String] = {
    import org.apache.spark.sql.functions.col
    val dts = store.resources.filter(col("dt") =!= 0L).select("dt").distinct()
    graft.sinks.RefFormat.xsdDtUris ++ dts
      .join(store.resources, dts("dt") === store.resources("rid"))
      .select(col("rid"), col("lex")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
  }

  private def rowsOf(store: QuadStore, query: String)
      : List[Map[String, NT]] = {
    val df = Sparql.runTerms(store, spark, query)
    val dtm = dtUriMap(store)
    val vars = df.columns
    df.collect().toList.map { r =>
      vars.indices.flatMap { i =>
        if (r.isNullAt(i)) None
        else {
          val s = r.getStruct(i)
          if (s.isNullAt(0) && s.isNullAt(1)) None
          else {
            val lex = if (s.isNullAt(1)) "" else s.getString(1)
            val nt: NT =
              if (!s.isNullAt(0) && Rid.isUri(s.getLong(0))) NUri(lex)
              else if (!s.isNullAt(0) && Rid.isBNode(s.getLong(0))) NB(lex)
              else {
                val dtv = if (s.isNullAt(2)) 0L else s.getLong(2)
                val lang = if (s.isNullAt(3)) "" else s.getString(3)
                // a lang literal's attr rid is its language tag (the
                // reference's lang-as-attribute model), not a datatype
                NLit(lex,
                  if (dtv == 0L || lang.nonEmpty) ""
                  else dtm.getOrElse(dtv, s"?$dtv"),
                  lang.toLowerCase)
              }
            Some(vars(i) -> nt)
          }
        }
      }.toMap
    }
  }

  private def loadStore(data: List[String],
                        named: List[(String, String)]): QuadStore = {
    // per-document bnode scope (RDF 1.1 §3.4): `_:x` in two dataset
    // files must be two nodes, so MULTI-document datasets rename each
    // file's labels apart. A single-document dataset keeps the
    // author's labels (no collision possible, and the byte-compat
    // format tests assert them).
    val multi = data.size + named.size > 1
    def sc(f: String) = if (multi) Turtle.scopeFor(f) else ""
    val dflt = QuadStore.fromTerms(spark,
      data.flatMap(f => Turtle.parseFile(f, "file://" + f, sc(f))))
    named.foldLeft(dflt) { case (st, (f, g)) =>
      st.union(QuadStore.fromTerms(spark,
        Turtle.parseFile(f, "file://" + f, sc(f)), g))
    }
  }

  // ------------------------------------------- replayed-remote fixture

  /** Canned remote behaviors for the `service-result` group — the
    * SERVICE failure modes a loopback-self federation can never
    * produce (error status, malformed result syntax, a stream cut
    * mid-payload) plus a healthy recorded response, replayed by path.
    * Queries in that group carry the placeholder authority
    * `http://fixture.invalid`, rewritten to this live server when the
    * test runs, so the fixtures stay ordinary DAWG artifacts. */
  @volatile private var fixtureStarted = false
  private lazy val fixtureServer: com.sun.net.httpserver.HttpServer = {
    import java.nio.charset.StandardCharsets.UTF_8
    val hs = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("localhost", 0), 0)
    // without an executor every handler runs on the single dispatch
    // thread — the /slow/ handler would park it and serialize later
    // fixture requests behind the stall
    hs.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    def canned(code: Int, body: String)
        : com.sun.net.httpserver.HttpHandler = ex => {
      try {
        val b = body.getBytes(UTF_8)
        ex.sendResponseHeaders(code, b.length)
        ex.getResponseBody.write(b)
      } catch { case _: Exception => () }
      finally ex.close()
    }
    hs.createContext("/e500/sparql/", canned(500, "internal error"))
    hs.createContext("/malformed/sparql/",
      canned(200, "?s\t?age\n<urn:unclosed\t\"5\"\n"))
    hs.createContext("/empty/sparql/", canned(200, "?s\t?age\n"))
    // the second row's subject matches nothing locally — the join must
    // DROP it, which the expected result file asserts by omission
    hs.createContext("/ages/sparql/", canned(200,
      "?s\t?age\n<urn:a>\t\"4\"^^<http://www.w3.org/2001/XMLSchema#integer>\n" +
      "<urn:zzz>\t\"9\"^^<http://www.w3.org/2001/XMLSchema#integer>\n"))
    // a peer slower than the read timeout (service-result2): stall
    // past the group's pinned 300 ms readTimeoutMs, then answer — the
    // client must have given up long before (1.2 s, not longer: the
    // handler thread is parked for the full sleep either way)
    hs.createContext("/slow/sparql/", ex => {
      try {
        Thread.sleep(1200)
        canned(200, "?s\t?age\n").handle(ex)
      } catch { case _: Exception => () }
    })
    hs.createContext("/cut/sparql/", ex => {
      // promise more bytes than are sent, then close: the client sees
      // a premature EOF (Content-Length mismatch) inside the body read
      try {
        val partial = "?s\t?age\n<urn:a>\t\"4".getBytes(UTF_8)
        ex.sendResponseHeaders(200, partial.length + 64)
        ex.getResponseBody.write(partial)
        ex.getResponseBody.flush()
      } catch { case _: Exception => () }
      finally ex.close()
    })
    hs.start()
    fixtureStarted = true
    hs
  }

  override def afterAll(): Unit = {
    if (fixtureStarted) fixtureServer.stop(0)
    super.afterAll()
  }

  /** Query text with the `service-result` placeholder authority
    * rewritten to the live replayed-remote fixture server. */
  private def loadQuery(queryPath: String): String = {
    val src = scala.io.Source.fromFile(queryPath, "UTF-8")
    val raw = try src.mkString finally src.close()
    if (raw.contains("http://fixture.invalid"))
      raw.replace("http://fixture.invalid",
        s"http://localhost:${fixtureServer.getAddress.getPort}")
    else raw
  }

  /** gt:ExpectedErrorTest: the query must FAIL and the failure message
    * must carry the classified error (gt:errorMatch substring). */
  private def runExpectedErrorTest(queryPath: String, data: List[String],
                                   named: List[(String, String)],
                                   errorMatch: String): Option[String] = {
    val query = loadQuery(queryPath)
    val store = loadStore(data, named)
    try {
      val n = Sparql.run(store, spark, query).collect().length
      Some(s"expected failure matching '$errorMatch', query SUCCEEDED " +
        s"with $n rows")
    } catch {
      case e: Throwable =>
        val m = String.valueOf(e.getMessage)
        if (m.contains(errorMatch)) None
        else Some(s"failed as expected but message lacks " +
          s"'$errorMatch': $m")
    }
  }

  private def runTest(queryPath: String, data: List[String],
                      named: List[(String, String)], resultPath: String)
      : Option[String] = {
    val query = loadQuery(queryPath)
    val store = loadStore(data, named)
    val resBase = "file://" + resultPath
    val rg = G(Turtle.parseFile(resultPath, resBase))
    val rsNode = rg.subjsOfType(RS + "ResultSet").headOption

    Parser.parse(query) match {
      case _: Ast.AskQ =>
        val want = rg.obj(rsNode.get, RS + "boolean")
          .collect { case Lit(l, _, _) => l == "true" }.get
        val got = Sparql.run(store, spark, query).collect()(0).getBoolean(0)
        if (got == want) None else Some(s"ASK: expected $want, got $got")

      case _: Ast.ConstructQ | _: Ast.DescribeQ =>
        val expected = tripleSols(rg.ts)
        val gotTs = Sparql.run(store, spark, query).collect().toSeq
          .flatMap(r => NTriples.parseLine(
            s"${r.getString(0)} ${r.getString(1)} ${r.getString(2)} ."))
          .map { case (s, p, o, _) => (s, p, o) }
        val got = tripleSols(gotTs)
        if (got.size == expected.size && matchBag(expected, got, Map.empty))
          None
        else Some(s"graph mismatch: expected ${expected.size} triples, " +
          s"got ${got.size}\n  expected: $expected\n  got: $got")

      case _ =>
        val sols = rg.objs(rsNode.get, RS + "solution")
        val expected = sols.map { sol =>
          val idx = rg.obj(sol, RS + "index")
            .collect { case Lit(l, _, _) => l.toInt }
          val bindings = rg.objs(sol, RS + "binding").flatMap { b =>
            for {
              v <- rg.obj(b, RS + "variable").collect { case Lit(l, _, _) => l }
              value <- rg.obj(b, RS + "value")
            } yield v -> norm(value)
          }.toMap
          (idx, bindings)
        }
        val ordered = expected.exists(_._1.isDefined)
        val got = rowsOf(store, query)
        val exp =
          if (ordered) expected.sortBy(_._1.getOrElse(Int.MaxValue)).map(_._2)
          else expected.map(_._2)
        val ok =
          if (ordered) matchSeq(exp, got, Map.empty)
          else exp.size == got.size && matchBag(exp, got, Map.empty)
        if (ok) None
        else Some(s"result mismatch (${if (ordered) "ordered" else "bag"})" +
          s"\n  expected (${exp.size}): ${exp.mkString("\n    ", "\n    ", "")}" +
          s"\n  got (${got.size}): ${got.mkString("\n    ", "\n    ", "")}")
    }
  }

  // ------------------------------------------------- result-format tests

  /** W3C `csv-tsv-res` / `json-res` style tests: run the query, emit the
    * serialization the HTTP endpoint would (the same
    * [[graft.sinks.Results]] writers), and compare BYTES against the
    * expected `.csv`/`.tsv`/`.srj` file (CRLF and trailing-newline
    * normalized — the writers end without a newline). */
  private def runFormatTest(queryPath: String, data: List[String],
                            named: List[(String, String)],
                            resultPath: String): Option[String] = {
    val query = {
      val src = scala.io.Source.fromFile(queryPath, "UTF-8")
      try src.mkString finally src.close()
    }
    val store = loadStore(data, named)
    val fmt = resultPath.substring(resultPath.lastIndexOf('.') + 1)
    val out = new java.io.StringWriter()
    Parser.parse(query) match {
      case _: Ast.AskQ =>
        val got = Sparql.run(store, spark, query).collect()(0).getBoolean(0)
        out.write(graft.sinks.Results.toAskJson(got))
      case _ =>
        val df = Sparql.runNt(store, spark, query)
        fmt match {
          case "csv" => graft.sinks.Results.writeCsv(df, out)
          case "tsv" => graft.sinks.Results.writeTsv(df, out)
          case "srj" => graft.sinks.Results.writeJson(df, out)
          case other => return Some(s"unknown result format .$other")
        }
    }
    val expected = {
      val src = scala.io.Source.fromFile(resultPath, "UTF-8")
      try src.mkString finally src.close()
    }
    def canon(s: String) =
      s.replace("\r\n", "\n").reverse.dropWhile(_ == '\n').reverse
    if (canon(out.toString) == canon(expected)) None
    else Some(s"serialization mismatch ($fmt)\n  expected: " +
      s"${canon(expected)}\n  got:      ${canon(out.toString)}")
  }

  // -------------------------------------------------------- update tests

  /** the post-update store's contents, grouped per graph (None = default),
    * as 3-var solutions so the query matcher's bnode-bijection compare
    * applies per graph */
  private def graphsOf(st: QuadStore)
      : Map[Option[String], List[Map[String, NT]]] =
    st.toNQuadLines.collect().toList
      .flatMap(r => NTriples.parseLine(r.getString(0)))
      .groupBy(_._4.collect { case Uri(u) => u })
      .map { case (g, qs) =>
        g -> tripleSols(qs.map(q => (q._1, q._2, q._3))) }

  /** `mf:UpdateEvaluationTest` (W3C SPARQL 1.1 `ut:` vocabulary — the
    * harness analog of `runtest.pl`'s update branch): load the action
    * dataset, apply the `ut:request`, and require every graph of the
    * result dataset — default and named — to be isomorphic to the
    * expected state, with no extra non-empty graphs. */
  private def runUpdateTest(requestPath: String, data: List[String],
                            named: List[(String, String)],
                            g: G, resultNode: Term): Option[String] = {
    val request = {
      val src = scala.io.Source.fromFile(requestPath, "UTF-8")
      try src.mkString finally src.close()
    }
    val st1 = graft.sparql.Update(loadStore(data, named), spark, request)
    val got = graphsOf(st1).filter(_._2.nonEmpty)

    def slurp(f: String): List[Map[String, NT]] =
      tripleSols(Turtle.parseFile(f, "file://" + f))
    val expDefault = g.objs(resultNode, UT + "data")
      .collect { case Uri(u) => pathOf(u) }.flatMap(slurp)
    val expNamed: List[(String, List[Map[String, NT]])] =
      g.objs(resultNode, UT + "graphData").flatMap { b =>
        for {
          f <- g.obj(b, UT + "graph").collect { case Uri(u) => pathOf(u) }
          l <- g.obj(b, RDFS + "label").collect { case Lit(l, _, _) => l }
        } yield l -> slurp(f)
      }
    val exp: Map[Option[String], List[Map[String, NT]]] =
      ((Option.empty[String] -> expDefault) ::
        expNamed.map { case (l, ts) => (Some(l): Option[String]) -> ts })
        .filter(_._2.nonEmpty).toMap

    if (got.keySet != exp.keySet)
      return Some(s"graph set mismatch: expected ${exp.keySet}, " +
        s"got ${got.keySet}")
    val bad = exp.keys.filterNot { k =>
      exp(k).size == got(k).size && matchBag(exp(k), got(k), Map.empty)
    }
    if (bad.isEmpty) None
    else Some(bad.map(k => s"graph $k mismatch:" +
      s"\n  expected (${exp(k).size}): ${exp(k)}" +
      s"\n  got (${got(k).size}): ${got(k)}").mkString("\n"))
  }

  // ------------------------------------------------------- registration

  private val root = new File("src/test/resources/dawg")

  private val excuses: Map[String, String] = {
    val f = new File(root, "excuses.txt")
    if (!f.exists) Map.empty
    else {
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().filterNot(l => l.trim.isEmpty || l.startsWith("#"))
        .flatMap { l =>
          l.split("\t+", 2) match {
            case Array(n, r) => Some(n.trim -> r.trim)
            case _ => None
          }
        }.toMap
      finally src.close()
    }
  }

  private var registered = 0

  private val groups = Option(root.listFiles()).getOrElse(Array.empty)
    .filter(d => d.isDirectory && new File(d, "manifest.ttl").exists)
    .sortBy(_.getName)

  for (dir <- groups) {
    val manifest = new File(dir, "manifest.ttl").getAbsolutePath
    val base = "file://" + manifest
    val g = G(Turtle.parseFile(manifest, base))
    val mfNode = g.subjsOfType(MF + "Manifest").head
    val entries = g.obj(mfNode, MF + "entries").map(g.list).getOrElse(Nil)
    for (e <- entries) {
      val name = g.obj(e, MF + "name")
        .collect { case Lit(l, _, _) => l }.getOrElse(e.toString)
      val action = g.obj(e, MF + "action").get
      val label = s"${dir.getName}/$name"
      val types = g.objs(e, Rdf.typ).collect { case Uri(u) => u }.toSet
      val synQuery = types(MF + "PositiveSyntaxTest11") ||
        types(MF + "NegativeSyntaxTest11")
      val synUpdate = types(MF + "PositiveUpdateSyntaxTest11") ||
        types(MF + "NegativeUpdateSyntaxTest11")
      val updateRequest = g.obj(action, UT + "request")
        .collect { case Uri(u) => pathOf(u) }
      val run: () => Option[String] =
        if (synQuery || synUpdate) {
          // mf:action IS the query/update file; positive must parse,
          // negative must be rejected (no execution)
          val path = action match { case Uri(u) => pathOf(u)
                                    case t => sys.error(s"bad action $t") }
          val positive = types(MF + "PositiveSyntaxTest11") ||
            types(MF + "PositiveUpdateSyntaxTest11")
          () => {
            val text = {
              val src = scala.io.Source.fromFile(path, "UTF-8")
              try src.mkString finally src.close()
            }
            val parsed =
              try {
                if (synUpdate) graft.sparql.Update.parse(text)
                else Parser.parse(text)
                Right(())
              } catch { case e: Throwable => Left(String.valueOf(e.getMessage)) }
            (positive, parsed) match {
              case (true, Right(_)) => None
              case (true, Left(m)) => Some(s"expected parse, got: $m")
              case (false, Left(_)) => None
              case (false, Right(_)) =>
                Some("negative syntax test parsed without error")
            }
          }
        } else if (types(GT + "ExpectedErrorTest")) {
          val queryPath = g.obj(action, QT + "query")
            .collect { case Uri(u) => pathOf(u) }.get
          val data = g.objs(action, QT + "data")
            .collect { case Uri(u) => pathOf(u) }
          val errorMatch = g.obj(e, GT + "errorMatch")
            .collect { case Lit(l, _, _) => l }.get
          () => runExpectedErrorTest(queryPath, data, Nil, errorMatch)
        } else updateRequest match {
        case Some(req) => // mf:UpdateEvaluationTest
          val data = g.objs(action, UT + "data")
            .collect { case Uri(u) => pathOf(u) }
          val named = g.objs(action, UT + "graphData").flatMap { b =>
            for {
              f <- g.obj(b, UT + "graph").collect { case Uri(u) => pathOf(u) }
              l <- g.obj(b, RDFS + "label").collect { case Lit(l, _, _) => l }
            } yield f -> l
          }
          val resultNode = g.obj(e, MF + "result").get
          () => runUpdateTest(req, data, named, g, resultNode)
        case None => // mf:QueryEvaluationTest
          val queryPath = g.obj(action, QT + "query")
            .collect { case Uri(u) => pathOf(u) }.get
          val data = g.objs(action, QT + "data")
            .collect { case Uri(u) => pathOf(u) }
          val named = g.objs(action, QT + "graphData").flatMap {
            case Uri(u) => Some(pathOf(u) -> u)
            case b => // labeled form: [ qt:graph <f.ttl> ; rdfs:label "uri" ]
              for {
                f <- g.obj(b, QT + "graph").collect { case Uri(u) => pathOf(u) }
                l <- g.obj(b, RDFS + "label").collect { case Lit(l, _, _) => l }
              } yield f -> l
          }
          val resultPath = g.obj(e, MF + "result")
            .collect { case Uri(u) => pathOf(u) }.get
          // mf:CSVResultFormatTest etc: expected file IS the serialized
          // bytes, not a result-set graph
          if (resultPath.endsWith(".csv") || resultPath.endsWith(".tsv") ||
              resultPath.endsWith(".srj"))
            () => runFormatTest(queryPath, data, named, resultPath)
          else
            () => runTest(queryPath, data, named, resultPath)
      }
      registered += 1
      // the service-result2 group models peers SLOWER than the read
      // timeout, so the suite would stall at the 30 s default — pin
      // the knob low for exactly this group (it is the knob a
      // production federation deployment sets, not a test backdoor).
      // SEQUENTIAL-EXECUTION ASSUMPTION: the set/unset mutates the
      // shared session conf around the run, which is safe only while
      // this suite executes tests one at a time (the ScalaTest
      // default here); enabling parallel execution would let another
      // in-flight SERVICE test pick up the 300 ms timeout and flake
      val runConf: () => Option[String] =
        if (dir.getName == "service-result2") () => {
          spark.conf.set("spark.graft.service.readTimeoutMs", "300")
          spark.conf.set("spark.graft.service.connectTimeoutMs", "1000")
          try run()
          finally {
            spark.conf.unset("spark.graft.service.readTimeoutMs")
            spark.conf.unset("spark.graft.service.connectTimeoutMs")
          }
        } else run
      test(s"dawg $label") {
        (runConf(), excuses.get(label)) match {
          case (None, None) => // pass
          case (None, Some(_)) =>
            fail(s"excused test now passes — remove '$label' from excuses.txt")
          case (Some(_), Some(reason)) => cancel(reason)
          case (Some(diff), None) => fail(diff)
        }
      }
    }
  }

  test("dawg coverage: at least 500 non-excused manifest tests") {
    assert(registered - excuses.size >= 500,
      s"registered=$registered excused=${excuses.size}")
  }
}
