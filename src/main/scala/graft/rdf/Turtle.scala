package graft.rdf

import scala.util.parsing.combinator.RegexParsers

/** Turtle reader (reference import auto-detects Turtle via Raptor,
  * `src/frontend/import.c:333-423`). Covers the subset the reference's
  * test corpus uses (the reference data .ttl files): `@prefix`/`@base`,
  * prefixed names (including the empty prefix), `;` predicate lists, `,`
  * object lists, `a`, string escapes, language tags, typed literals,
  * bare numeric/boolean literals, `_:` bnodes, `#` comments.
  * Driver-side single-pass like [[RdfXml]]; the distributed import path
  * is N-Triples.
  */
object Turtle {

  /** Blank-node labels are DOCUMENT-scoped (RDF 1.1 §3.4): `_:x` in two
    * separately-parsed files must be two distinct nodes, and the engine
    * keys bnode rids by label — so a multi-document load (named-graph
    * datasets, repeated GSP PUTs) must rename each document's labels
    * apart or they silently unify across graphs (the reference assigns
    * fresh internal bnode ids per import, `src/frontend/import.c`).
    * `scopeFor(key)` derives the per-document suffix deterministically
    * from the document's path/base so re-parsing is stable; the
    * dump/restore path deliberately passes NO scope — a dump's labels
    * come from one store's dictionary and must UNIFY across its
    * per-graph files on restore. */
  def scopeFor(key: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    // 8 digest bytes = a 64-bit scope: birthday-bounded collision at
    // ~5×10^9 distinct documents (a 4-byte scope collided at ~77k —
    // under-sized for a store fed by years of per-document imports)
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** The label suffix `scopeLabel` appends — shared with the GSP
    * import path, which applies the same scheme as a Spark column
    * expression rather than per-string. */
  def scopeSuffix(scope: String): String = s"_d$scope"

  private[rdf] def scopeLabel(b: String, scope: String): String =
    if (scope.isEmpty) b else b + scopeSuffix(scope)

  private def scoped(ts: List[(Term, Term, Term)], scope: String)
      : List[(Term, Term, Term)] =
    if (scope.isEmpty) ts
    else ts.map { case (s, p, o) =>
      def f(t: Term): Term = t match {
        case BNode(b) => BNode(scopeLabel(b, scope))
        case other => other
      }
      (f(s), f(p), f(o))
    }

  def parse(text: String, base: String = "", scope: String = "")
      : List[(Term, Term, Term)] = {
    // same pre-descent DoS guard as the query parser: deep `[ :p [ ...`
    // or `( ( ( ...` nesting in an untrusted document blew the
    // combinator parser's stack in fuzzing (StackOverflowError, or a
    // "stack overflow during pattern compilation" from a lazy regex
    // compiled at depth)
    graft.sparql.Parser.checkNesting(text)
    scoped(new TtlParser(base).run(text), scope)
  }

  /** @param base base IRI for relative references (the reference's HTTP
    *   PUT resolves them against the target graph URI) */
  def parseFile(path: String, base: String = "", scope: String = "")
      : List[(Term, Term, Term)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.mkString, base, scope) finally src.close()
  }

  /** TriG reader (Turtle + named graph blocks): `GRAPH <g> { ... }`,
    * label-only `<g> { ... }`, unlabeled `{ ... }` and plain top-level
    * Turtle statements (both default graph). Graph = None for the
    * default graph; bnode labels render as `_:label`. */
  def parseQuads(text: String, base: String = "", scope: String = "")
      : List[(Term, Term, Term, Option[String])] = {
    graft.sparql.Parser.checkNesting(text)
    val qs = new TtlParser(base).runQuads(text)
    if (scope.isEmpty) qs
    else qs.map { case (s, p, o, g) =>
      def f(t: Term): Term = t match {
        case BNode(b) => BNode(scopeLabel(b, scope))
        case other => other
      }
      // bnode-labeled graph names are document-scoped too
      (f(s), f(p), f(o), g.map(gl =>
        if (gl.startsWith("_:"))
          "_:" + scopeLabel(gl.stripPrefix("_:"), scope)
        else gl))
    }
  }

  def parseQuadsFile(path: String, base: String = "", scope: String = "")
      : List[(Term, Term, Term, Option[String])] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseQuads(src.mkString, base, scope) finally src.close()
  }

  private final class TtlParser(base0: String) extends RegexParsers {
    override val whiteSpace = """(\s|#[^\n]*)+""".r

    private var prefixes = Map[String, String]()
    private var base = base0

    private def iriRef: Parser[String] =
      "<" ~> """([^<>"{}|^`\\\s]|\\[uU][0-9a-fA-F]+)*""".r <~ ">" ^^ (
        i => Iri.resolve(base, Term.unescapeUchar(i)))

    // prefixed name; the local part must not end with '.' (statement dot)
    private def pname: Parser[String] =
      """([A-Za-z][A-Za-z0-9_-]*)?:(?:[A-Za-z0-9_.-]*[A-Za-z0-9_-]|[A-Za-z0-9_])?""".r ^^ {
        pn =>
          val i = pn.indexOf(':')
          val (pfx, local) = (pn.substring(0, i), pn.substring(i + 1))
          prefixes.getOrElse(pfx, throw new IllegalArgumentException(
            s"unknown prefix '$pfx:'")) + local
      }

    private def iri: Parser[String] = iriRef | pname

    // each form is ONE regex including the quotes: splitting into
    // open-quote ~> body tokens lets RegexParsers' skipWhitespace eat
    // leading whitespace INSIDE the literal (`" "` parsed as `""`)
    private def stringLit: Parser[String] =
      """(?s)"{3}(?:(?!"{3}).)*"{3}""".r ^^ (
        s => Term.unescape(s.substring(3, s.length - 3))) |
      """"(?:[^"\\\n]|\\.)*"""".r ^^ (
        s => Term.unescape(s.substring(1, s.length - 1))) |
      """'(?:[^'\\\n]|\\.)*'""".r ^^ (
        s => Term.unescape(s.substring(1, s.length - 1)))

    private def literal: Parser[Term] =
      stringLit ~ opt("^^" ~> iri ^^ ("^" + _) |
          "@" ~> """[A-Za-z]+(-[A-Za-z0-9]+)*""".r ^^ ("@" + _)) ^^ {
        case lex ~ None => Lit(lex)
        case lex ~ Some(ann) =>
          if (ann.startsWith("@")) Lit(lex, lang = ann.drop(1).toLowerCase)
          else Lit(lex,
            dt = if (ann.drop(1) == Xsd.string) "" else ann.drop(1))
      } |
      // DECIMAL requires digits after the '.' (so `:s :p 1.` lexes as
      // integer 1 + statement dot, per the Turtle grammar)
      """[+-]?(\d+\.\d+|\.\d+)([eE][+-]?\d+)?|[+-]?\d+(\.\d*)?[eE][+-]?\d+""".r ^^ (
        s => Lit(s, if (s.exists(c => c == 'e' || c == 'E')) Xsd.double
                    else Xsd.decimal)) |
      """[+-]?\d+""".r ^^ (s => Lit(s, Xsd.integer)) |
      "true\\b".r ^^^ Lit("true", Xsd.boolean) |
      "false\\b".r ^^^ Lit("false", Xsd.boolean)

    private def bnode: Parser[Term] =
      "_:" ~> """[A-Za-z0-9_]+""".r ^^ BNode.apply

    // parser-generated bnodes (blankNodePropertyList / collection / []),
    // labeled like Raptor's genid sequence (the reference's parser,
    // `src/frontend/import.c`); a document using literal `_:genidN`
    // labels alongside `[...]` would collide, as it would under Raptor
    private var genId = 0
    private def freshBNode(): Term = { genId += 1; BNode(s"genid$genId") }

    // triples emitted from inside nested [ ... ] / ( ... ) terms; drained
    // per-document by `run` (triple order is irrelevant to the store)
    private val nested =
      scala.collection.mutable.ListBuffer[(Term, Term, Term)]()

    /** `[ p1 o1 ; p2 o2 ]` — fresh bnode carrying the inner triples;
      * bare `[]` is an anonymous bnode (Turtle ANON). */
    private def bnodePropList: Parser[Term] =
      "[" ~> opt(predObjList) <~ opt(";") <~ "]" ^^ { pol =>
        val b = freshBNode()
        pol.getOrElse(Nil).foreach { case p ~ os =>
          os.foreach(o => nested += ((b, p, o))) }
        b
      }

    /** `( o1 o2 ... )` — RDF collection: rdf:first/rdf:rest chain,
      * empty list = rdf:nil. */
    private def collection: Parser[Term] =
      "(" ~> rep(obj) <~ ")" ^^ { os =>
        val nil: Term = Uri(Rdf.nil)
        os.foldRight(nil) { (o, tail) =>
          val cell = freshBNode()
          nested += ((cell, Uri(Rdf.first), o))
          nested += ((cell, Uri(Rdf.rest), tail))
          cell
        }
      }

    private def subject: Parser[Term] =
      iri ^^ Uri.apply | bnode | collection
    private def verb: Parser[Term] =
      "a\\b".r ^^^ Uri(Rdf.typ) | iri ^^ Uri.apply
    private def obj: Parser[Term] =
      literal | iri ^^ Uri.apply | bnode | bnodePropList | collection

    private def predObjList: Parser[List[Term ~ List[Term]]] =
      rep1sep(verb ~ rep1sep(obj, ","), rep1(";")) // ;; is legal

    /** triples without the terminating '.' (TriG allows the final
      * triples of a `{ ... }` block to omit it); a trailing ';' is
      * tolerated as in Turtle */
    private def triplesNoDot: Parser[List[(Term, Term, Term)]] =
      subject ~ predObjList <~ opt(";") ^^ {
        case s ~ pol =>
          pol.flatMap { case p ~ os => os.map(o => (s, p, o)) }
      } |
      // blankNodePropertyList as subject, with optional further
      // predicate-object list: `[ :p :o ] :q :r .`
      bnodePropList ~ opt(predObjList) <~ opt(";") ^^ {
        case b ~ pol =>
          pol.getOrElse(Nil).flatMap { case p ~ os =>
            os.map(o => (b, p, o)) }
      }

    private def statement: Parser[List[(Term, Term, Term)]] =
      triplesNoDot <~ "."

    private def directive: Parser[List[(Term, Term, Term)]] =
      ("@prefix" | "(?i)PREFIX".r) ~>
        ("""[A-Za-z][A-Za-z0-9_-]*:|:""".r ~ iriRef) <~ opt(".") ^^ {
          case p ~ i => prefixes += (p.dropRight(1) -> i); Nil
        } |
      ("@base" | "(?i)BASE".r) ~> iriRef <~ opt(".") ^^ {
        b => base = b; Nil
      }

    private def doc: Parser[List[(Term, Term, Term)]] =
      rep(directive | statement) ^^ (_.flatten)

    def run(text: String): List[(Term, Term, Term)] =
      parseAll(doc, text) match {
        case Success(ts, _) => ts ++ nested.toList
        case other =>
          throw new IllegalArgumentException(s"turtle parse error: $other")
      }

    // ------------------------------------------------------ TriG blocks

    /** drain triples emitted from nested [ ... ] / ( ... ) terms so they
      * land in the graph of the enclosing block */
    private def drain(): List[(Term, Term, Term)] = {
      val l = nested.toList; nested.clear(); l
    }

    private def graphLabel: Parser[String] =
      iri | "_:" ~> """[A-Za-z0-9_]+""".r ^^ ("_:" + _)

    /** `{ t1 . t2 . t3 }` — dots between triples, optional after the
      * last (lenient: every dot is optional on read) */
    private def wrapped: Parser[List[(Term, Term, Term)]] =
      "{" ~> rep(triplesNoDot <~ opt(".")) <~ "}" ^^ (_.flatten)

    private def qitem
        : Parser[List[(Term, Term, Term, Option[String])]] =
      directive ^^ (_ => Nil) |
      opt("(?i)GRAPH\\b".r) ~> graphLabel ~ wrapped ^^ { case g ~ ts =>
        (ts ++ drain()).map { case (s, p, o) => (s, p, o, Some(g)) } } |
      wrapped ^^ (ts =>
        (ts ++ drain()).map { case (s, p, o) => (s, p, o, None) }) |
      statement ^^ (ts =>
        (ts ++ drain()).map { case (s, p, o) => (s, p, o, None) })

    def runQuads(text: String)
        : List[(Term, Term, Term, Option[String])] =
      parseAll(rep(qitem) ^^ (_.flatten), text) match {
        case Success(qs, _) => qs
        case other =>
          throw new IllegalArgumentException(s"trig parse error: $other")
      }
  }
}
