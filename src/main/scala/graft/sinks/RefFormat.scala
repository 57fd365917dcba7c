package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import graft.rdf.{Rid, Xsd, WellKnown}

/** `4s-query`-compatible result serializers over TERM-STRUCT results
  * ([[graft.sparql.Sparql.runTerms]] output: one `(rid, lex, dt, lang)`
  * struct column per variable). Byte-compatible with the reference's
  * sinks so its golden test outputs (`tests/query/exemplar`) diff
  * cleanly:
  *
  *  - text (`output_text`, `src/frontend/results.c:2014-2141`): `?var`
  *    TSV header; URIs `<u>`; bnodes `_:l`; decodable numeric literals
  *    BARE (the reference prints the decoded value, not the quoted
  *    lexical); other literals `"lex"`, `@LANG` uppercased,
  *    `^^<datatype>`.
  *  - SPARQL results XML (`output_sparql`, `results.c:1900-2012`).
  *
  * Driver-side (collect) by design: these are the CLI/HTTP response
  * emitters, the scale path is parquet/TSV via `df.write`.
  */
object RefFormat {

  // the reference's value-coded trio: ONLY xsd:integer/decimal/double
  // print bare in text output (`output_text` strcmp chain,
  // `results.c:2097-2115`); xsd:int, xsd:float etc. stay quoted+typed
  private val integerRid = Rid.uri(Xsd.integer)
  private val decimalRid = Rid.uri(Xsd.decimal)
  private val doubleRid = Rid.uri(Xsd.double)

  /** well-known attr rid -> datatype URI; extend with corpus datatypes */
  val xsdDtUris: Map[Long, String] = WellKnown.xsdAttr.map(_.swap) +
    // computed-only datatypes (no data literal carries them, so the store
    // dictionary can't resolve the rid): TIMEZONE() emits durations
    (graft.rdf.Rid.uri(graft.rdf.Xsd.ns + "dayTimeDuration") ->
      (graft.rdf.Xsd.ns + "dayTimeDuration"))

  private def escape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '"'  => "\\\""
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c    => c.toString
  }

  /** one text-format cell (`output_text` literal branch,
    * `results.c:2089-2122`). Divergence from the reference (documented):
    * stored xsd:double lexicals print canonically (integral `.0`
    * stripped) instead of with an `e0` suffix — our computed aggregates
    * carry plain decimal lexicals, the reference's carry mantissa form. */
  def textTerm(rid: java.lang.Long, lex: String, dt: java.lang.Long,
               lang: String, dtUris: Map[Long, String]): String = {
    if (rid == null && lex == null) return ""
    if (rid != null && Rid.isUri(rid)) s"<$lex>"
    else if (rid != null && Rid.isBNode(rid)) s"_:$lex"
    else {
      val l = if (lex == null) "" else lex
      val dtv = if (dt == null) 0L else dt.longValue()
      if (lang != null && lang.nonEmpty) "\"" + escape(l) + "\"@" +
        lang.toUpperCase
      else if (dtv == integerRid) l
      else if (dtv == decimalRid) { if (l.contains('.')) l else l + ".0" }
      else if (dtv == doubleRid) {
        if (l.endsWith(".0")) l.dropRight(2) else l
      }
      else if (dtv != 0L)
        dtUris.get(dtv)
          .map(u => "\"" + escape(l) + "\"^^<" + u + ">")
          .getOrElse("\"" + escape(l) + "\"")
      else "\"" + escape(l) + "\""
    }
  }

  private def cells(df: DataFrame): (Seq[String], Seq[Seq[Row]]) = {
    val vars = df.columns.toSeq
    val rows = df.collect().toSeq.map(r =>
      vars.indices.map(i =>
        if (r.isNullAt(i)) null else r.getStruct(i)))
    (vars, rows)
  }

  /** text format: `?var` TSV header line + one TSV line per row */
  def textLines(df: DataFrame,
                dtUris: Map[Long, String] = xsdDtUris): Seq[String] = {
    val (vars, rows) = cells(df)
    val header = vars.map("?" + _).mkString("\t")
    header +: rows.map(_.map { s =>
      if (s == null) ""
      else textTerm(
        if (s.isNullAt(0)) null else java.lang.Long.valueOf(s.getLong(0)),
        if (s.isNullAt(1)) null else s.getString(1),
        if (s.isNullAt(2)) null else java.lang.Long.valueOf(s.getLong(2)),
        if (s.isNullAt(3)) null else s.getString(3),
        dtUris)
    }.mkString("\t"))
  }

  def askText(result: Boolean): Seq[String] = Seq(result.toString)

  // ---------------------------------------------------- DAWG testcase

  private val testcasePrologue = Seq(
    "@prefix rs: <http://www.w3.org/2001/sw/DataAccess/tests/result-set#> .",
    "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .",
    "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .",
    "")

  private def turtleTerm(s: Row, dtUris: Map[Long, String]): String = {
    val lex = if (s.isNullAt(1)) "" else s.getString(1)
    if (!s.isNullAt(0) && Rid.isUri(s.getLong(0))) s"<$lex>"
    else if (!s.isNullAt(0) && Rid.isBNode(s.getLong(0))) s"_:$lex"
    else {
      val lang = if (s.isNullAt(3)) "" else s.getString(3)
      val dtv = if (s.isNullAt(2)) 0L else s.getLong(2)
      val q = "\"" + escape(lex) + "\""
      if (lang.nonEmpty) s"$q@$lang"
      else if (dtv != 0L && dtUris.contains(dtv))
        s"""$q^^<${dtUris(dtv)}>"""
      else q
    }
  }

  /** DAWG "testcase" result format (`output_testcase`,
    * `src/frontend/results.c:2397-2496`): the W3C result-set vocabulary
    * in Turtle — `[] rdf:type rs:ResultSet ; rs:resultVariable "v", ... ;
    * rs:solution [ rs:binding [ rs:variable "v" ; rs:value ... ] ] .`
    * `ordered=true` adds `rs:index` per solution like the reference does
    * for ORDER BY queries, so a result-set diff can check order. */
  def testcaseLines(df: DataFrame,
                    dtUris: Map[Long, String] = xsdDtUris,
                    ordered: Boolean = false): Seq[String] = {
    val (vars, rows) = cells(df)
    val out = scala.collection.mutable.ListBuffer[String]()
    out ++= testcasePrologue
    out += "[] rdf:type rs:ResultSet ;"
    out += "   rs:resultVariable " +
      vars.map("\"" + _ + "\"").mkString(", ")
    rows.zipWithIndex.foreach { case (r, idx) =>
      out += " ;\n   rs:solution ["
      if (ordered) out += s"      rs:index ${idx + 1} ;"
      val bindings = vars.indices.flatMap { i =>
        val s = r(i)
        if (s == null || (s.isNullAt(0) && s.isNullAt(1))) None
        else Some(s"""      rs:binding [ rs:variable "${vars(i)}" ;""" +
          s"\n                   rs:value ${turtleTerm(s, dtUris)} ]")
      }
      out += bindings.mkString(" ;\n")
      out += "   ]"
    }
    out += " ."
    out.toSeq
  }

  /** ASK in testcase format (`output_testcase` boolean branch). */
  def testcaseAskLines(result: Boolean): Seq[String] =
    testcasePrologue ++ Seq("[] rdf:type rs:ResultSet ;",
      s"""   rs:boolean "$result"^^xsd:boolean .""")

  private def xmlEscape(s: String): String = s.flatMap {
    case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
    case c => c.toString
  }

  /** SPARQL results XML (`output_sparql`, `results.c:1900-2012`) */
  def sparqlXml(df: DataFrame,
                dtUris: Map[Long, String] = xsdDtUris): String = {
    val (vars, rows) = cells(df)
    val sb = new StringBuilder
    sb ++= "<?xml version=\"1.0\"?>\n"
    sb ++= "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n"
    sb ++= "  <head>\n"
    vars.foreach(v => sb ++= s"""    <variable name="$v"/>\n""")
    sb ++= "  </head>\n  <results>\n"
    rows.foreach { r =>
      sb ++= "    <result>\n"
      vars.indices.foreach { i =>
        val s = r(i)
        if (s != null && !(s.isNullAt(0) && s.isNullAt(1))) {
          val lex = if (s.isNullAt(1)) "" else s.getString(1)
          val inner =
            if (!s.isNullAt(0) && Rid.isUri(s.getLong(0)))
              s"<uri>${xmlEscape(lex)}</uri>"
            else if (!s.isNullAt(0) && Rid.isBNode(s.getLong(0)))
              s"<bnode>${xmlEscape(lex)}</bnode>"
            else {
              val lang = if (s.isNullAt(3)) "" else s.getString(3)
              val dtv = if (s.isNullAt(2)) 0L else s.getLong(2)
              if (lang.nonEmpty)
                s"""<literal xml:lang="$lang">${xmlEscape(lex)}</literal>"""
              else if (dtv != 0L && dtUris.contains(dtv))
                s"""<literal datatype="${dtUris(dtv)}">${
                  xmlEscape(lex)}</literal>"""
              else s"<literal>${xmlEscape(lex)}</literal>"
            }
          sb ++= s"""      <binding name="${vars(i)}">$inner</binding>\n"""
        }
      }
      sb ++= "    </result>\n"
    }
    sb ++= "  </results>\n</sparql>\n"
    sb.toString
  }

  /** ASK in SPARQL results XML (`output_sparql` boolean branch) */
  def askXml(result: Boolean): String =
    "<?xml version=\"1.0\"?>\n" +
      "<sparql xmlns=\"http://www.w3.org/2005/sparql-results#\">\n" +
      "  <head>\n  </head>\n" +
      s"  <boolean>$result</boolean>\n</sparql>\n"

  /** CONSTRUCT/DESCRIBE results (s/p/o N-Triples string columns) as
    * `s p o .` lines */
  def ntLines(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(r => s"${r.getString(0)} ${r.getString(1)} ${
      r.getString(2)} .")

  /** CONSTRUCT results as Raptor-style RDF/XML (the reference serializes
    * CONSTRUCT graphs through Raptor, `results.c:1765-1898`): one
    * `rdf:Description` element per triple, subjects relativized against
    * `xml:base`, predicate namespaces split at the last `#`/`/`/`:`. */
  def rdfXmlLines(ntDf: DataFrame, base: String): Seq[String] = {
    import graft.rdf.{NTriples, Uri, BNode, Lit, Rdf}
    val triples = ntDf.collect().toSeq.flatMap { r =>
      NTriples.parseLine(
        s"${r.getString(0)} ${r.getString(1)} ${r.getString(2)} .")
    }
    def rel(u: String) =
      if (u.startsWith(base)) u.substring(base.length) else u
    val header = Seq(
      """<?xml version="1.0" encoding="utf-8"?>""",
      s"""<rdf:RDF xmlns:rdf="${Rdf.ns}" xml:base="$base">""")
    val blocks = triples.flatMap { case (s, p, o, _) =>
      // bad-slot triples skip THIS block only (no non-local return —
      // that would abort the whole document)
      val openOpt = s match {
        case Uri(u) =>
          Some(s"""  <rdf:Description rdf:about="${rel(u)}">""")
        case BNode(b) => Some(s"""  <rdf:Description rdf:nodeID="$b">""")
        case _ => None
      }
      val puOpt = p match { case Uri(u) => Some(u); case _ => None }
      (openOpt, puOpt) match {
        case (Some(open), Some(pu)) =>
          val i = pu.lastIndexWhere(c => c == '#' || c == '/' || c == ':')
          val (ns, local) = (pu.substring(0, i + 1), pu.substring(i + 1))
          val prop = o match {
            case Lit(lex, _, _) =>
              s"""    <ns0:$local xmlns:ns0="$ns">${
                xmlEscape(lex)}</ns0:$local>"""
            case Uri(u) =>
              s"""    <ns0:$local xmlns:ns0="$ns" rdf:resource="${
                rel(u)}"/>"""
            case BNode(b) =>
              s"""    <ns0:$local xmlns:ns0="$ns" rdf:nodeID="$b"/>"""
          }
          Seq(open, prop, "  </rdf:Description>")
        case _ => Nil
      }
    }
    header ++ blocks ++ Seq("</rdf:RDF>")
  }
}
