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

  def parse(text: String, base: String = ""): List[(Term, Term, Term)] =
    new TtlParser(base).run(text)

  /** @param base base IRI for relative references (the reference's HTTP
    *   PUT resolves them against the target graph URI) */
  def parseFile(path: String, base: String = ""): List[(Term, Term, Term)] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.mkString, base) finally src.close()
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

    private def stringLit: Parser[String] =
      "\"\"\"" ~> """(?s)((?!\"\"\").)*""".r <~ "\"\"\"" ^^ Term.unescape |
      "\"" ~> """([^"\\\n]|\\.)*""".r <~ "\"" ^^ Term.unescape |
      "'" ~> """([^'\\\n]|\\.)*""".r <~ "'" ^^ Term.unescape

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

    private def subject: Parser[Term] =
      iri ^^ Uri.apply | bnode
    private def verb: Parser[Term] =
      "a\\b".r ^^^ Uri(Rdf.typ) | iri ^^ Uri.apply
    private def obj: Parser[Term] =
      literal | iri ^^ Uri.apply | bnode

    private def statement: Parser[List[(Term, Term, Term)]] =
      subject ~ rep1sep(verb ~ rep1sep(obj, ","), ";") <~
        opt(";") <~ "." ^^ { // Turtle allows a trailing ';'
        case s ~ pol =>
          pol.flatMap { case p ~ os => os.map(o => (s, p, o)) }
      }

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
        case Success(ts, _) => ts
        case other =>
          throw new IllegalArgumentException(s"turtle parse error: $other")
      }
  }
}
