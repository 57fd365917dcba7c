package graft.sparql

import graft.rdf.Term

/** SPARQL 1.1 abstract syntax (the subset the reference executes: Rasqal
  * parse tree -> block tree, `src/frontend/query.c:1305-1437`). */
object Ast {

  sealed trait PTerm
  final case class PVar(name: String) extends PTerm
  final case class PConst(t: Term) extends PTerm
  /** a concrete stored-bnode reference (`<bnode:LABEL>`, the reference's
    * 4s-query addressing extension, `tests/query/scripts/select-bnodes`)
    * — unlike a query `_:` bnode it is NOT an existential variable */
  final case class PBnodeConst(label: String) extends PTerm

  final case class TriplePat(s: PTerm, p: PTerm, o: PTerm)

  // ---- property paths (SPARQL 1.1 §9 — an EXTENSION over the reference:
  // Rasqal-era 4store has no path support; `src/frontend/query.c` only ever
  // sees plain predicates) ----
  sealed trait Path
  /** direct predicate link */
  final case class PLink(iri: String) extends Path
  /** `^p` inverse */
  final case class PInv(p: Path) extends Path
  /** `a/b` sequence */
  final case class PSeq(a: Path, b: Path) extends Path
  /** `a|b` alternative */
  final case class PAlt(a: Path, b: Path) extends Path
  /** `p*` / `p+` / `p?` closures (set semantics per the spec's ALP) */
  final case class PClosure(p: Path, minZero: Boolean, many: Boolean)
      extends Path
  /** `!(iri|^iri|...)` negated property set: (iri, inverted) members */
  final case class PNeg(fwd: List[String], inv: List[String]) extends Path

  // ---- expressions ----
  sealed trait Expr
  final case class EVar(name: String) extends Expr
  final case class EConst(t: Term) extends Expr
  /** Operators and builtins normalized to a call: "||","&&","=","<","+",
    * "!","-u" (unary minus), plus SPARQL function names uppercased. */
  final case class ECall(fn: String, args: List[Expr]) extends Expr
  final case class EIn(e: Expr, list: List[Expr], neg: Boolean) extends Expr
  final case class EExists(p: GP, neg: Boolean) extends Expr
  final case class EAgg(fn: String, distinct: Boolean, arg: Option[Expr],
                        sep: String = " ") extends Expr

  // ---- graph patterns ----
  sealed trait GP
  final case class BGPat(triples: List[TriplePat]) extends GP
  /** A `{ ... }` group: ordered elements + group-scoped FILTERs. */
  final case class GroupGP(elems: List[GP], filters: List[Expr]) extends GP
  final case class OptionalGP(inner: GP) extends GP
  final case class UnionGP(alts: List[GP]) extends GP
  final case class MinusGP(inner: GP) extends GP
  final case class GraphGP(g: PTerm, inner: GP) extends GP
  final case class BindGP(expr: Expr, v: String) extends GP
  final case class ValuesGP(vars: List[String],
                            rows: List[List[Option[Term]]]) extends GP
  /** One path triple `s path o` (non-trivial paths only; a plain-IRI path
    * parses to an ordinary [[TriplePat]] inside a [[BGPat]]). */
  final case class PathGP(s: PTerm, path: Path, o: PTerm) extends GP
  /** `{ SELECT ... }` subquery (SPARQL 1.1 §12 — extension: the reference
    * rejects subSELECT, `src/frontend/query.c:1388-1390`). */
  final case class SubSelectGP(q: SelectQ) extends GP
  /** `SERVICE [SILENT] <iri> { ... }` (SPARQL 1.1 Federated Query §2 —
    * extension: the reference has no federation). `raw` is the inner
    * group's source text (braces included) and `prologue` the PREFIX/
    * BASE declarations in scope, so the sub-pattern ships to the remote
    * endpoint verbatim; `inner` stays parsed for local introspection. */
  final case class ServiceGP(silent: Boolean, endpoint: PTerm,
                             inner: GP, raw: String,
                             prologue: String) extends GP

  // ---- queries ----
  final case class SelectItem(expr: Expr, as: Option[String])
  final case class Modifiers(
      distinct: Boolean = false,
      reduced: Boolean = false,
      groupBy: List[Expr] = Nil,
      having: List[Expr] = Nil,
      orderBy: List[(Expr, Boolean)] = Nil, // (expr, ascending)
      limit: Option[Long] = None,
      offset: Option[Long] = None,
      /** FROM graph IRIs: the query's default graph is their merge
        * (reference: Rasqal data-graph list passed to the query) */
      dataset: List[String] = Nil,
      /** FROM NAMED graph IRIs: the graphs GRAPH patterns range over */
      datasetNamed: List[String] = Nil)

  sealed trait Query { def where: GP }
  final case class SelectQ(items: List[SelectItem], // empty = SELECT *
                           where: GP, mods: Modifiers) extends Query
  final case class AskQ(where: GP,
                        dataset: List[String] = Nil,
                        datasetNamed: List[String] = Nil) extends Query
  final case class ConstructQ(template: List[TriplePat], where: GP,
                              mods: Modifiers) extends Query
  final case class DescribeQ(terms: List[PTerm], whereOpt: Option[GP],
                             mods: Modifiers) extends Query {
    def where: GP = whereOpt.getOrElse(GroupGP(Nil, Nil))
  }
}
