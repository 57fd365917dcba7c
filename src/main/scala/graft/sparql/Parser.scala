package graft.sparql

import scala.util.parsing.combinator.RegexParsers
import graft.rdf.{Lit, Rdf, Term, Uri, BNode, Xsd}
import Ast._

/** SPARQL 1.1 query parser (recursive descent via scala-parser-combinators).
  *
  * The reference outsources parsing to the Rasqal library
  * (`src/frontend/query.c:346-386`); this is our native equivalent covering
  * the grammar the reference executes: SELECT/ASK/CONSTRUCT/DESCRIBE,
  * BGPs with `;`/`,` abbreviations, OPTIONAL/UNION/MINUS/GRAPH/FILTER/
  * BIND/VALUES, full expression precedence, aggregates, solution
  * modifiers, PREFIX/BASE — plus property paths (`path` below) and
  * subSELECT (`subSelectGroup`), which go BEYOND the reference's
  * surface (`src/frontend/query.c:1388-1390` rejects subSELECT; paths
  * need Rasqal ≥0.9.26 there).
  */
class Parser extends RegexParsers {
  override val whiteSpace = """(\s|#[^\n]*)+""".r

  private var prefixes = Map[String, String]()
  private var base = ""

  // ---- terminals ----
  private def kw(s: String): Parser[String] = ("""(?i)\Q""" + s + """\E\b""").r
  private def IRIREF: Parser[String] = "<" ~> """[^<>"{}|^`\\\s]*""".r <~ ">" ^^
    (i => graft.rdf.Iri.resolve(base, i))
  // PN_LOCAL may contain but not END with '.' (`foaf:knows.` = name +
  // statement dot, per the SPARQL grammar)
  private val pnLocal = """(?:[A-Za-z0-9_.-]*[A-Za-z0-9_-]|[A-Za-z0-9_])"""
  private def PNAME: Parser[String] =
    (s"""[A-Za-z][A-Za-z0-9_-]*:$pnLocal|[A-Za-z][A-Za-z0-9_-]*:|:$pnLocal|:""").r ^^ { pn =>
      val i = pn.indexOf(':')
      val (pfx, local) = (pn.substring(0, i), pn.substring(i + 1))
      prefixes.getOrElse(pfx,
        throw new IllegalArgumentException(s"unknown prefix '$pfx:'")) + local
    }
  private def VAR: Parser[String] = """[?$]""".r ~> """[A-Za-z0-9_]+""".r
  protected def iri: Parser[String] = IRIREF | PNAME

  private def numericLit: Parser[Term] =
    """[+-]?(\d+\.\d*|\.\d+)[eE][+-]?\d+|[+-]?\d+[eE][+-]?\d+""".r ^^
      (s => Lit(s, Xsd.double)) |
    // DECIMAL needs digits after '.' (`1.` = integer + group dot)
    """[+-]?(\d+\.\d+|\.\d+)""".r ^^ (s => Lit(s, Xsd.decimal)) |
    """[+-]?\d+""".r ^^ (s => Lit(s, Xsd.integer))

  // one regex per form INCLUDING the quotes — token-split quoting lets
  // skipWhitespace eat leading whitespace inside the literal (`" "`
  // would parse as `""`); long (triple-quoted) forms per the grammar
  private def stringLit: Parser[String] =
    """(?s)"{3}(?:(?!"{3}).)*"{3}""".r ^^ (
      s => Term.unescape(s.substring(3, s.length - 3))) |
    """(?s)'{3}(?:(?!'{3}).)*'{3}""".r ^^ (
      s => Term.unescape(s.substring(3, s.length - 3))) |
    """"(?:[^"\\\n]|\\.)*"""".r ^^ (
      s => Term.unescape(s.substring(1, s.length - 1))) |
    """'(?:[^'\\\n]|\\.)*'""".r ^^ (
      s => Term.unescape(s.substring(1, s.length - 1)))

  private def rdfLit: Parser[Term] =
    stringLit ~ opt("^^" ~> iri | "@" ~> """[A-Za-z]+(-[A-Za-z0-9]+)*""".r ^^
        ("@" + _)) ^^ {
      case lex ~ None => Lit(lex)
      case lex ~ Some(ann) =>
        if (ann.startsWith("@")) Lit(lex, lang = ann.drop(1).toLowerCase)
        else Lit(lex, dt = if (ann == Xsd.string) "" else ann)
    }

  private def boolLit: Parser[Term] =
    kw("true") ^^^ Lit("true", Xsd.boolean) |
    kw("false") ^^^ Lit("false", Xsd.boolean)

  private def literal: Parser[Term] = rdfLit | numericLit | boolLit

  private def bnode: Parser[Term] =
    "_:" ~> """[A-Za-z0-9_]+""".r ^^ BNode.apply |
    "[" ~ "]" ^^^ BNode(s"anon${BNodeGen.next()}")

  // ---- pattern terms ----
  /** the reference's `<bnode:LABEL>` IRI extension addresses a stored
    * bnode directly (4s-query bnode scheme, tests/query/scripts/
    * select-bnodes) — it denotes the bnode term, not a URI */
  private def termOfIri(u: String): graft.rdf.Term =
    if (u.startsWith("bnode:")) graft.rdf.BNode(u.substring(6)) else Uri(u)
  /** pattern-slot form: a `bnode:` ref is a CONCRETE bnode term (not an
    * existential like a `_:` query bnode) */
  private def ptermOfIri(u: String): PTerm =
    if (u.startsWith("bnode:")) PBnodeConst(u.substring(6))
    else PConst(Uri(u))

  private def ptermS: Parser[PTerm] =
    VAR ^^ PVar.apply | iri ^^ ptermOfIri | bnode ^^ PConst.apply
  private def ptermP: Parser[PTerm] =
    VAR ^^ PVar.apply | kw("a") ^^^ PConst(Uri(Rdf.typ)) |
    iri ^^ (u => PConst(Uri(u)))
  private def ptermO: Parser[PTerm] =
    VAR ^^ PVar.apply | literal ^^ PConst.apply |
    iri ^^ ptermOfIri | bnode ^^ PConst.apply

  // ---- property paths (SPARQL 1.1 §9; extension — the reference's
  // Rasqal-era parser has no paths). Precedence: | < / < ^ < mod. ----
  /** `?`/`*`/`+` modifier; `?` must not swallow the start of a `?var` */
  private def pathMod: Parser[String] =
    """\*|\+|\?(?![A-Za-z0-9_$])""".r
  def path: Parser[Path] =
    rep1sep(pathSeq, "|") ^^ (_.reduceLeft(PAlt.apply))
  private def pathSeq: Parser[Path] =
    rep1sep(pathEltOrInv, "/") ^^ (_.reduceLeft(PSeq.apply))
  private def pathEltOrInv: Parser[Path] =
    "^" ~> pathElt ^^ PInv.apply | pathElt
  private def pathElt: Parser[Path] =
    pathPrimary ~ opt(pathMod) ^^ {
      case p ~ None => p
      case p ~ Some("*") => PClosure(p, minZero = true, many = true)
      case p ~ Some("+") => PClosure(p, minZero = false, many = true)
      case p ~ Some(_) => PClosure(p, minZero = true, many = false)
    }
  private def pathIri: Parser[String] = kw("a") ^^^ Rdf.typ | iri
  private def pathPrimary: Parser[Path] =
    pathIri ^^ PLink.apply |
    "!" ~> pathNegated |
    "(" ~> path <~ ")"
  private def pathNegated: Parser[Path] =
    "(" ~> repsep(pathOneInNeg, "|") <~ ")" ^^ mkNeg |
    pathOneInNeg ^^ (e => mkNeg(List(e)))
  private def pathOneInNeg: Parser[(String, Boolean)] =
    "^" ~> pathIri ^^ ((_, true)) | pathIri ^^ ((_, false))
  private def mkNeg(es: List[(String, Boolean)]): Path =
    PNeg(es.collect { case (u, false) => u },
      es.collect { case (u, true) => u })

  /** s p o (; p o)* (, o)* — the `;`/`,` abbreviations. A verb is a var or
    * a path; a trivial path (plain IRI) stays an ordinary triple. */
  private def triplesSameSubject: Parser[List[Either[TriplePat, PathGP]]] =
    ptermS ~ propertyList ^^ { case s ~ ((pos, extra)) =>
      pos.map(mkTriple(s, _)) ::: extra
    } |
    // TriplesNode subject (SPARQL §4.2.1-4.2.2): `[ p o ; ... ] p2 o2`
    // and `( items ) p o` — the node's own triples plus an optional
    // property list hanging off the generated subject
    triplesNode ~ opt(propertyList) ^^ { case ((s, nts)) ~ pl =>
      pl.map { case (pos, extra) => pos.map(mkTriple(s, _)) ::: extra }
        .getOrElse(Nil) ::: nts
    }
  private def mkTriple(s: PTerm, po: (Either[PTerm, Path], PTerm))
      : Either[TriplePat, PathGP] = po match {
    case (Left(v), o) => Left(TriplePat(s, v, o))
    case (Right(PLink(u)), o) => Left(TriplePat(s, PConst(Uri(u)), o))
    case (Right(p), o) => Right(PathGP(s, p, o))
  }
  private def verb: Parser[Either[PTerm, Path]] =
    VAR ^^ (v => Left(PVar(v))) | path ^^ (Right(_))
  private def propertyList: Parser[(List[(Either[PTerm, Path], PTerm)],
                                    List[Either[TriplePat, PathGP]])] =
    // grammar [77] PropertyListNotEmpty: `( ';' ( Verb ObjectList )? )*`
    // — trailing and repeated semicolons with no verb-object tail are
    // legal, so rep1sep (which forbids a trailing separator) won't do
    (verb ~ rep1sep(objectNode, ",")) ~
      rep(";" ~> opt(verb ~ rep1sep(objectNode, ","))) ^^ {
      case first ~ more =>
        val runs = first :: more.flatten
        (runs.flatMap { case p ~ os => os.map(o => (p, o._1)) },
          runs.flatMap { case _ ~ os => os.flatMap(_._2) })
    }
  /** object position: a plain term, or a nested TriplesNode whose
    * generated triples ride along */
  private def objectNode: Parser[(PTerm, List[Either[TriplePat, PathGP]])] =
    ptermO ^^ ((_: PTerm, List.empty[Either[TriplePat, PathGP]])) |
    triplesNode
  private def triplesNode: Parser[(PTerm, List[Either[TriplePat, PathGP]])] =
    blankNodePropertyList | collection
  /** `[ p o ; ... ]` — fresh bnode (existential: Exec rewrites it to a
    * non-projectable variable) carrying its property list */
  private def blankNodePropertyList
      : Parser[(PTerm, List[Either[TriplePat, PathGP]])] =
    "[" ~> propertyList <~ "]" ^^ { case (pos, extra) =>
      val b = PConst(BNode(s"anon${BNodeGen.next()}"))
      (b, pos.map(mkTriple(b, _)) ::: extra)
    }
  /** `( e1 e2 ... )` RDF collection sugar — the rdf:first/rdf:rest chain
    * of the Turtle/SPARQL grammar, desugared to pattern triples */
  private def collection: Parser[(PTerm, List[Either[TriplePat, PathGP]])] =
    "(" ~ ")" ^^^ ((PConst(Uri(Rdf.nil)): PTerm,
      List.empty[Either[TriplePat, PathGP]])) |
    "(" ~> rep1(objectNode) <~ ")" ^^ { items =>
      val nodes = items.map(_ =>
        PConst(BNode(s"anon${BNodeGen.next()}")): PTerm)
      val links = nodes.lazyZip(items).lazyZip(nodes.indices).flatMap {
        case (n, (item, extra), i) =>
          val rest: PTerm =
            if (i == items.size - 1) PConst(Uri(Rdf.nil)) else nodes(i + 1)
          Left(TriplePat(n, PConst(Uri(Rdf.first)), item)) ::
            Left(TriplePat(n, PConst(Uri(Rdf.rest)), rest)) :: extra
      }
      (nodes.head, links.toList)
    }

  private def triplesBlock: Parser[GP] =
    rep1sep(triplesSameSubject, ".") <~ opt(".") ^^ { ts =>
      val all = ts.flatten
      val plain = all.collect { case Left(t) => t }
      val paths = all.collect { case Right(p) => p }
      (plain, paths) match {
        case (ps, Nil) => BGPat(ps)
        case (Nil, List(one)) => one
        case (Nil, many) => GroupGP(many, Nil)
        case (ps, many) => GroupGP(BGPat(ps) :: many, Nil)
      }
    }

  /** template triples (CONSTRUCT / update templates): plain verbs only */
  private[sparql] def plainTriplesBlock: Parser[BGPat] =
    triplesBlock ^? ({ case b: BGPat => b },
      _ => "property paths are not allowed in templates")

  // ---- group graph pattern ----
  def groupGraphPattern: Parser[GroupGP] =
    "{" ~> (subSelectGroup | groupGraphPatternSub) <~ "}"

  /** `{ SELECT ... }` — SPARQL 1.1 §12 subquery (extension; the reference
    * rejects subSELECT, `src/frontend/query.c:1388-1390`). */
  private def subSelectGroup: Parser[GroupGP] =
    selectQuery ^^ (q => GroupGP(List(SubSelectGP(q)), Nil))

  private def groupGraphPatternSub: Parser[GroupGP] =
    rep(ggpElem) ^^ { elems =>
      val (filters, pats) = elems.partition(_.isLeft)
      GroupGP(pats.map(_.toOption.get), filters.flatMap(_.left.toOption))
    }

  private def ggpElem: Parser[Either[Expr, GP]] =
    (kw("FILTER") ~> constraint ^^ (Left(_))
      | kw("OPTIONAL") ~> groupGraphPattern ^^ (g => Right(OptionalGP(g)))
      | kw("MINUS") ~> groupGraphPattern ^^ (g => Right(MinusGP(g)))
      | kw("GRAPH") ~> ptermS ~ groupGraphPattern ^^ {
          case g ~ p => Right(GraphGP(g, p)) }
      | kw("BIND") ~> ("(" ~> expression ~ (kw("AS") ~> VAR) <~ ")") ^^ {
          case e ~ v => Right(BindGP(e, v)) }
      | kw("VALUES") ~> valuesClause ^^ (Right(_))
      | kw("SERVICE") ~> opt(kw("SILENT")) ~
          (VAR ^^ PVar.apply | iri ^^ (u => PConst(Uri(u)))) ~ rawGroup ^^ {
          case sil ~ ep ~ ((g, raw)) =>
            Right(ServiceGP(sil.isDefined, ep, g, raw, prologueText)) }
      | unionChain ^^ (Right(_))
    ) <~ opt(".") |
    // NO opt(".") tail here: triplesBlock consumes its own trailing dot
    // (the dots belong BETWEEN TriplesSameSubject runs), and stacking a
    // second optional dot made `?s ?p ?o ..` parse — a stray dot after
    // a triples block must be a syntax error (W3C negative-syntax)
    triplesBlock ^^ (Right(_))

  /** groupGraphPattern that also captures its raw source text (braces
    * included) — the SERVICE sub-pattern is shipped to the remote
    * endpoint verbatim */
  private def rawGroup: Parser[(GroupGP, String)] = Parser { in =>
    groupGraphPattern(in) match {
      case Success(g, rest) =>
        Success((g, in.source.subSequence(in.offset, rest.offset)
          .toString), rest)
      case f: Failure => f
      case e: Error => e
    }
  }

  /** the PREFIX/BASE declarations currently in scope, re-rendered — a
    * SERVICE sub-query must parse standalone at the remote end */
  private def prologueText: String =
    (if (base.nonEmpty) s"BASE <$base>\n" else "") +
      prefixes.map { case (p, u) => s"PREFIX $p: <$u>" }.mkString("\n")

  private def unionChain: Parser[GP] =
    groupGraphPattern ~ rep(kw("UNION") ~> groupGraphPattern) ^^ {
      case g ~ Nil => g
      case g ~ more => UnionGP(g :: more)
    }

  private def valuesClause: Parser[ValuesGP] =
    (VAR ^^ (v => List(v)) | "(" ~> rep1(VAR) <~ ")") ~
      ("{" ~> rep(valuesRow) <~ "}") ^? ({
        case vs ~ rows if rows.forall(_.size == vs.size) =>
          ValuesGP(vs, rows)
      }, { case vs ~ rows =>
        // §10.2: every data row must match the variable list's arity —
        // a syntax-level constraint, rejected at parse time
        val bad = rows.find(_.size != vs.size).map(_.size).getOrElse(0)
        s"VALUES arity mismatch: ${vs.size} variable(s), row of $bad" })
  private def valuesRow: Parser[List[Option[Term]]] =
    "(" ~> rep1(valuesTerm) <~ ")" |
    valuesTerm ^^ (t => List(t))
  private def valuesTerm: Parser[Option[Term]] =
    kw("UNDEF") ^^^ None | literal ^^ (Some(_)) |
    iri ^^ (u => Some(Uri(u)))

  // ---- expressions (precedence climbing) ----
  def expression: Parser[Expr] = orExpr
  private def orExpr: Parser[Expr] =
    rep1sep(andExpr, "||") ^^ (_.reduceLeft((a, b) => ECall("||", List(a, b))))
  private def andExpr: Parser[Expr] =
    rep1sep(relExpr, "&&") ^^ (_.reduceLeft((a, b) => ECall("&&", List(a, b))))
  private def relExpr: Parser[Expr] =
    addExpr ~ opt(relTail) ^^ { case e ~ t => t.map(_(e)).getOrElse(e) }
  private def relTail: Parser[Expr => Expr] =
    ("<=" | ">=" | "!=" | "=" | "<" | ">") ~ addExpr ^^ {
      case op ~ r => (l: Expr) => ECall(op, List(l, r)) } |
    kw("NOT") ~> kw("IN") ~> exprList ^^ (
      lst => (l: Expr) => EIn(l, lst, neg = true)) |
    kw("IN") ~> exprList ^^ (
      lst => (l: Expr) => EIn(l, lst, neg = false))
  private def exprList: Parser[List[Expr]] =
    "(" ~> repsep(expression, ",") <~ ")"
  private def addExpr: Parser[Expr] =
    mulExpr ~ rep(("+" | "-") ~ mulExpr) ^^ { case e ~ ops =>
      ops.foldLeft(e) { case (acc, op ~ r) => ECall(op, List(acc, r)) }
    }
  private def mulExpr: Parser[Expr] =
    unaryExpr ~ rep(("*" | "/") ~ unaryExpr) ^^ { case e ~ ops =>
      ops.foldLeft(e) { case (acc, op ~ r) => ECall(op, List(acc, r)) }
    }
  private def unaryExpr: Parser[Expr] =
    "!" ~> unaryExpr ^^ (e => ECall("!", List(e))) |
    "-" ~> unaryExpr ^^ (e => ECall("-u", List(e))) |
    "+" ~> unaryExpr |
    primary
  private def primary: Parser[Expr] =
    "(" ~> expression <~ ")" |
    aggExpr |
    existsExpr |
    builtinCall |
    castCall |
    literal ^^ EConst.apply |
    VAR ^^ EVar.apply |
    iri ^^ (u => EConst(termOfIri(u)))

  private def existsExpr: Parser[Expr] =
    kw("NOT") ~> kw("EXISTS") ~> groupGraphPattern ^^ (EExists(_, neg = true)) |
    kw("EXISTS") ~> groupGraphPattern ^^ (EExists(_, neg = false))

  private val aggNames =
    List("COUNT", "SUM", "AVG", "MIN", "MAX", "SAMPLE", "GROUP_CONCAT")
  private def aggExpr: Parser[Expr] =
    aggNames.map(kw).reduce(_ | _) ~ ("(" ~> opt(kw("DISTINCT"))) ~
      ("*" ^^^ None | expression ^^ (Some(_))) ~
      (opt(";" ~> kw("SEPARATOR") ~> "=" ~> stringLit) <~ ")") ^^ {
      case fn ~ d ~ arg ~ sep =>
        EAgg(fn.toUpperCase, d.isDefined, arg, sep.getOrElse(" "))
    }

  private val builtins = List(
    "BOUND", "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC",
    "STRLANG", "STRDT", "SAMETERM", "LANGMATCHES", "LANG", "DATATYPE",
    "STRLEN", "STRSTARTS", "STRENDS", "STRBEFORE", "STRAFTER", "STRUUID",
    "STR", "IRI", "URI", "BNODE", "ABS", "FLOOR", "CEIL", "ROUND",
    "UCASE", "LCASE", "ENCODE_FOR_URI", "CONTAINS", "SUBSTR", "REPLACE",
    "CONCAT", "REGEX", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES",
    "SECONDS", "TIMEZONE", "TZ", "NOW", "MD5", "SHA1", "SHA224", "SHA256",
    "SHA384", "SHA512", "RAND", "UUID", "IF", "COALESCE",
    "FROM_UNIXTIME", "TO_UNIXTIME") // LAQRS extensions, results.c:631-650
  private def builtinCall: Parser[Expr] =
    builtins.map(kw).reduce(_ | _) ~ opt("(" ~> repsep(expression, ",") <~ ")") ^^ {
      case fn ~ args => ECall(fn.toUpperCase, args.getOrElse(Nil))
    }

  /** xsd constructor casts: the only generic function calls the reference
    * supports (`src/frontend/results.c:464-472`). */
  private def castCall: Parser[Expr] =
    iri ~ ("(" ~> repsep(expression, ",") <~ ")") ^^ {
      case u ~ args => ECall("CAST:" + u, args)
    }

  private def constraint: Parser[Expr] =
    existsExpr | builtinCall | castCall | "(" ~> expression <~ ")"

  // ---- prologue + queries ----
  protected def prologue: Parser[Unit] =
    rep(kw("PREFIX") ~> """[A-Za-z][A-Za-z0-9_-]*:|:""".r ~ IRIREF ^^ {
          case p ~ i => prefixes += (p.dropRight(1) -> i)
        }
      | kw("BASE") ~> IRIREF ^^ (b => base = b)) ^^^ ()

  private def selectItem: Parser[SelectItem] =
    VAR ^^ (v => SelectItem(EVar(v), None)) |
    "(" ~> expression ~ (kw("AS") ~> VAR) <~ ")" ^^ {
      case e ~ v => SelectItem(e, Some(v))
    }

  private def solutionMods: Parser[Modifiers] =
    opt(kw("GROUP") ~> kw("BY") ~> rep1(groupCond)) ~
    opt(kw("HAVING") ~> rep1(constraint)) ~
    opt(kw("ORDER") ~> kw("BY") ~> rep1(orderCond)) ~
    opt(kw("LIMIT") ~> """\d+""".r ^^ (_.toLong)) ~
    opt(kw("OFFSET") ~> """\d+""".r ^^ (_.toLong)) ~
    opt(kw("LIMIT") ~> """\d+""".r ^^ (_.toLong)) ^^ {
      case g ~ h ~ o ~ l1 ~ off ~ l2 =>
        Modifiers(groupBy = g.getOrElse(Nil), having = h.getOrElse(Nil),
          orderBy = o.getOrElse(Nil), limit = l1.orElse(l2), offset = off)
    }
  /** GroupCondition (grammar [20]): the `( expr AS ?v )` form is carried
    * as a marker call and rewritten by [[applyGroupAs]] into a BIND over
    * the where pattern + grouping on the var — it never escapes the
    * parser. */
  private def groupCond: Parser[Expr] =
    "(" ~> expression ~ (kw("AS") ~> VAR) <~ ")" ^^ {
      case e ~ v => ECall("__groupas", List(e, EVar(v))) } |
    VAR ^^ EVar.apply | builtinCall | "(" ~> expression <~ ")"

  /** rewrite GROUP BY (expr AS ?v) entries: hoist each as a BIND into
    * the pattern, replace the group key with the bound var */
  protected def applyGroupAs(where: GP, mods: Modifiers): (GP, Modifiers) = {
    val binds = mods.groupBy.collect {
      case ECall("__groupas", List(e, EVar(v))) => BindGP(e, v) }
    if (binds.isEmpty) (where, mods)
    else (GroupGP(where :: (binds: List[GP]), Nil),
      mods.copy(groupBy = mods.groupBy.map {
        case ECall("__groupas", List(_, EVar(v))) => EVar(v)
        case other => other
      }))
  }
  private def orderCond: Parser[(Expr, Boolean)] =
    kw("ASC") ~> "(" ~> expression <~ ")" ^^ ((_, true)) |
    kw("DESC") ~> "(" ~> expression <~ ")" ^^ ((_, false)) |
    (VAR ^^ EVar.apply | builtinCall | "(" ~> expression <~ ")") ^^ ((_, true))

  /** FROM / FROM NAMED graphs: (default graphs, named graphs) */
  private def datasetClause: Parser[(List[String], List[String])] =
    rep(kw("FROM") ~> (kw("NAMED") ~> iri ^^ (Right(_)) |
        iri ^^ (Left(_)))) ^^ { ds =>
      (ds.collect { case Left(u) => u }, ds.collect { case Right(u) => u })
    }

  def selectQuery: Parser[SelectQ] =
    kw("SELECT") ~> opt(kw("DISTINCT") ^^^ 1 | kw("REDUCED") ^^^ 2) ~
      // optional commas between items: LAQRS tolerance, as the reference's
      // parser accepts `SELECT ?x, (count(?y) as ?c)`
      ("*" ^^^ Nil | rep1sep(selectItem, opt(","))) ~ datasetClause ~
      (opt(kw("WHERE")) ~> groupGraphPattern) ~ solutionMods ~
      // trailing ValuesClause (SPARQL 1.1 grammar [28]): joins the
      // WHERE pattern like an in-group VALUES
      opt(kw("VALUES") ~> valuesClause) ^^ {
      case d ~ items ~ ds ~ where ~ mods0 ~ vals =>
        val (whereG, mods) = applyGroupAs(where, mods0)
        val w = vals.map(v => GroupGP(List(whereG, v), Nil)).getOrElse(whereG)
        SelectQ(items, w,
          mods.copy(distinct = d.contains(1), reduced = d.contains(2),
            dataset = ds._1, datasetNamed = ds._2))
    }

  def askQuery: Parser[AskQ] =
    kw("ASK") ~> datasetClause ~ (opt(kw("WHERE")) ~> groupGraphPattern) ^^ {
      case ds ~ w => AskQ(w, ds._1, ds._2)
    }

  def constructQuery: Parser[ConstructQ] =
    kw("CONSTRUCT") ~> ("{" ~> opt(plainTriplesBlock) <~ "}") ~ datasetClause ~
      (kw("WHERE") ~> groupGraphPattern) ~ solutionMods ^^ {
      case t ~ ds ~ w ~ m =>
        ConstructQ(t.map(_.triples).getOrElse(Nil), w,
          m.copy(dataset = ds._1, datasetNamed = ds._2))
    } |
    // CONSTRUCT WHERE { tp } shorthand (SPARQL 1.1 §10.2.2): the WHERE
    // block is restricted to a plain BGP and doubles as the template
    kw("CONSTRUCT") ~> datasetClause ~
      (kw("WHERE") ~> ("{" ~> opt(plainTriplesBlock) <~ "}")) ~
      solutionMods ^^ {
      case ds ~ t ~ m =>
        val bg = t.getOrElse(BGPat(Nil))
        ConstructQ(bg.triples, bg,
          m.copy(dataset = ds._1, datasetNamed = ds._2))
    }

  def describeQuery: Parser[DescribeQ] =
    kw("DESCRIBE") ~> rep1(VAR ^^ PVar.apply | iri ^^ (u => PConst(Uri(u)))) ~
      datasetClause ~ opt(opt(kw("WHERE")) ~> groupGraphPattern) ~
      solutionMods ^^ {
      case ts ~ ds ~ w ~ m =>
        DescribeQ(ts, w, m.copy(dataset = ds._1, datasetNamed = ds._2))
    }

  def query: Parser[Ast.Query] =
    prologue ~> (selectQuery | askQuery | constructQuery | describeQuery)
}

private object BNodeGen {
  private val c = new java.util.concurrent.atomic.AtomicLong()
  def next(): Long = c.incrementAndGet()
}

object Parser {
  /** DoS guard, applied BEFORE recursive descent: the combinator parser
    * recurses per nesting level, and ~2000 nested braces (a 4 KB
    * request) blew the default thread stack in fuzzing — a
    * StackOverflowError where the endpoint owes a 400. String literals
    * and #-comments are skipped — both grammars treat comment text as
    * whitespace, so a bracket inside a comment must neither raise nor
    * lower the count (2000 lines of "# )" followed by 2000 real '{'
    * must still trip the guard). Depth clamps at 0 on closers: a
    * stray closer outside strings/comments is illegal input anyway,
    * and letting depth go negative would mask later real nesting.
    * 256 is far beyond any legitimate query's nesting. Shared with
    * the update parser. */
  private[graft] def checkNesting(text: String, max: Int = 256): Unit = {
    var i = 0; var depth = 0; var worst = 0
    val n = text.length
    while (i < n && worst <= max) {
      val c = text.charAt(i)
      if (c == '#' && (i == 0 || text.charAt(i - 1) != '\\')) {
        // comments hide brackets from the real parser — but a '#'
        // PRECEDED BY '\' is a PN_LOCAL PLX escape (`p:a\#b`), part of
        // a token, and brackets after it on the line are REAL: treating
        // it as a comment would under-count depth (the DoS direction).
        i += 1
        while (i < n && text.charAt(i) != '\n' && text.charAt(i) != '\r') i += 1
      } else if (c == '<') {
        // IRIREF chars exclude whitespace and <>"{}|^`\ — but include
        // '#', so an unskipped IRI would flip us into comment mode and
        // hide real braces after it on the line. Scan to a '>' over
        // legal chars ⇒ IRI, skip whole span; anything else ⇒ '<' is
        // the comparison operator, resume at the next char (the real
        // lexer fails IRIREF at the same boundary character, so a '#'
        // later on the line is a comment for BOTH scanners). The scan
        // must be UNBOUNDED: a cap made ">512-char IRI containing '#'"
        // flip the guard into comment mode while the real parser (whose
        // IRIREF regex is unbounded) descended into real braces behind
        // it. What the old 512 cap actually protected against — parens
        // are legal IRI chars, and the real parser transiently recurses
        // into "<((((…>" as parenthesized expressions before
        // backtracking to the IRI read — is accounted EXACTLY instead:
        // a successfully-skipped span's '(' count contributes to the
        // worst-depth check as transient recursion on top of the
        // current depth. Legitimate IRIs carry a handful of parens;
        // an attack span carries thousands and rejects. Spans can't
        // overlap ('<' is illegal inside), and a failed scan resumes
        // with ordinary chars, so the whole pass stays O(n).
        var j = i + 1
        var opens = 0
        @inline def legal(ch: Char): Boolean =
          ch > ' ' && ch != '<' && ch != '>' && ch != '"' && ch != '{' &&
            ch != '}' && ch != '|' && ch != '^' && ch != '`' && ch != '\\'
        while (j < n && legal(text.charAt(j))) {
          if (text.charAt(j) == '(') opens += 1
          j += 1
        }
        if (j < n && text.charAt(j) == '>') {
          if (depth + opens > worst) worst = depth + opens
          i = j + 1
        } else i += 1
      } else if (c == '"' || c == '\'') {
        val q = c
        if (i + 2 < n && text.charAt(i + 1) == q && text.charAt(i + 2) == q) {
          i += 3 // long form: scan to the closing triple quote
          while (i + 2 < n && !(text.charAt(i) == q &&
              text.charAt(i + 1) == q && text.charAt(i + 2) == q)) {
            if (text.charAt(i) == '\\') i += 1
            i += 1
          }
          i += 3
        } else {
          i += 1
          while (i < n && text.charAt(i) != q) {
            if (text.charAt(i) == '\\') i += 1
            i += 1
          }
          i += 1
        }
      } else {
        if (c == '{' || c == '(' || c == '[') {
          depth += 1; if (depth > worst) worst = depth
        } else if (c == '}' || c == ')' || c == ']') {
          if (depth > 0) depth -= 1
        }
        i += 1
      }
    }
    if (worst > max) throw new IllegalArgumentException(
      s"SPARQL parse error: bracket nesting exceeds $max")
  }

  def parse(text: String): Ast.Query = {
    checkNesting(text)
    val p = new Parser
    p.parseAll(p.query, text) match {
      case p.Success(q, _) => validated(q)
      case other =>
        throw new IllegalArgumentException(s"SPARQL parse error: $other")
    }
  }

  // --- post-parse validation: constraints the grammar alone can't say

  private def hasAgg(e: Expr): Boolean = e match {
    case _: EAgg => true
    case ECall(_, args) => args.exists(hasAgg)
    case EIn(x, l, _) => hasAgg(x) || l.exists(hasAgg)
    case _ => false
  }

  /** §18.2.4.1/§11: aggregate functions may appear only in SELECT
    * expressions, HAVING and ORDER BY — never inside a group pattern's
    * FILTER or BIND. Rejected at parse time (the official suite's
    * negative syntax tests expect this). Recurses into subselect WHERE
    * patterns; a subselect's own projection/having are its own scope. */
  private def checkGp(gp: GP): Unit = gp match {
    case GroupGP(elems, fs) =>
      fs.foreach(f => if (hasAgg(f)) throw new IllegalArgumentException(
        "SPARQL parse error: aggregate function in FILTER"))
      elems.foreach(checkGp)
    case BindGP(e, _) =>
      if (hasAgg(e)) throw new IllegalArgumentException(
        "SPARQL parse error: aggregate function in BIND")
    case OptionalGP(i) => checkGp(i)
    case UnionGP(alts) => alts.foreach(checkGp)
    case MinusGP(i) => checkGp(i)
    case GraphGP(_, i) => checkGp(i)
    case SubSelectGP(q) => checkGp(q.where)
    case sv: ServiceGP => checkGp(sv.inner)
    case _ => ()
  }

  private def validated(q: Ast.Query): Ast.Query = {
    q match {
      case s: SelectQ => checkGp(s.where)
      case a: AskQ => checkGp(a.where)
      case c: ConstructQ => checkGp(c.where)
      case d: DescribeQ => d.whereOpt.foreach(checkGp)
    }
    q
  }
}
