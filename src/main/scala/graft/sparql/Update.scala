package graft.sparql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.rdf._
import Ast._

/** SPARQL 1.1 Update (reference: `src/frontend/update.c`). Operations are
  * pure transforms QuadStore -> QuadStore (immutable snapshots; the Delta
  * MERGE of SURVEY §2.11 degrades gracefully to DataFrame set algebra +
  * parquet rewrite on plain Spark).
  */
object Update {

  sealed trait Op
  /** quads with optional named graph (None = default graph) */
  final case class InsertData(quads: List[(Term, Term, Term, Option[Term])])
      extends Op
  final case class DeleteData(quads: List[(Term, Term, Term, Option[Term])])
      extends Op
  /** DELETE {tmpl} INSERT {tmpl} WHERE {p}; either template may be empty.
    * DELETE WHERE {p} = delete template := the WHERE pattern itself
    * (explicitly unsupported in the reference, `update.c:257-274`). */
  final case class Modify(deleteTmpl: List[TriplePat],
                          insertTmpl: List[TriplePat],
                          where: GP, graph: Option[String]) extends Op
  final case class Clear(graph: Option[String]) extends Op // None = ALL
  final case class GraphCopy(kind: String, from: Option[String],
                             to: Option[String]) extends Op // ADD/MOVE/COPY

  // ----------------------------------------------------------- parsing

  private class UParser extends Parser {

    private def iriU: Parser[String] = "<" ~> """[^<>"{}|^`\\\s]*""".r <~ ">"
    private def kwU(s: String): Parser[String] =
      ("""(?i)\Q""" + s + """\E\b""").r

    private def graphRef: Parser[Option[String]] =
      opt(kwU("GRAPH")) ~> iriU ^^ (Some(_)) |
      kwU("DEFAULT") ^^^ None | kwU("NAMED") ^^^ None | kwU("ALL") ^^^ None

    /** flatten a parsed group into triple templates (GRAPH boxes noted) */
    private def tmplOf(g: GroupGP): List[TriplePat] =
      g.elems.flatMap {
        case BGPat(ts) => ts
        case inner: GroupGP => tmplOf(inner)
        case GraphGP(_, inner: GroupGP) => tmplOf(inner)
        case other =>
          throw new IllegalArgumentException(s"bad template element: $other")
      }

    /** ground quads of a data block; GRAPH <g> { ... } carries the graph */
    private def groundOf(g: GroupGP): List[(Term, Term, Term, Option[Term])] = {
      def ground(t: TriplePat, gr: Option[Term]) = t match {
        case TriplePat(PConst(s), PConst(p), PConst(o)) => (s, p, o, gr)
        case other =>
          throw new IllegalArgumentException(s"vars in ground data: $other")
      }
      g.elems.flatMap {
        case BGPat(ts) => ts.map(ground(_, None))
        case GraphGP(PConst(u), inner: GroupGP) =>
          tmplOf(inner).map(ground(_, Some(u)))
        case inner: GroupGP => groundOf(inner)
        case other =>
          throw new IllegalArgumentException(s"bad data element: $other")
      }
    }

    def op: Parser[Op] =
      kwU("INSERT") ~> kwU("DATA") ~> groupGraphPattern ^^ (
        g => InsertData(groundOf(g))) |
      kwU("DELETE") ~> kwU("DATA") ~> groupGraphPattern ^^ (
        g => DeleteData(groundOf(g))) |
      kwU("DELETE") ~> kwU("WHERE") ~> groupGraphPattern ^^ (
        g => Modify(tmplOf(g), Nil, g, None)) |
      kwU("DELETE") ~> groupGraphPattern ~
        opt(kwU("INSERT") ~> groupGraphPattern) ~
        (kwU("WHERE") ~> groupGraphPattern) ^^ { case d ~ i ~ w =>
          Modify(tmplOf(d), i.map(tmplOf).getOrElse(Nil), w, None)
        } |
      kwU("INSERT") ~> groupGraphPattern ~
        (kwU("WHERE") ~> groupGraphPattern) ^^ { case i ~ w =>
          Modify(Nil, tmplOf(i), w, None)
        } |
      (kwU("CLEAR") | kwU("DROP")) ~> opt(kwU("SILENT")) ~> graphRef ^^
        Clear.apply |
      kwU("CREATE") ~> opt(kwU("SILENT")) ~> graphRef ^^ (
        _ => Clear(Some(""))) |
      (kwU("ADD") | kwU("MOVE") | kwU("COPY")) ~ (opt(kwU("SILENT")) ~>
        graphRef) ~ (kwU("TO") ~> graphRef) ^^ { case k ~ f ~ t =>
          GraphCopy(k.toUpperCase, f, t)
        }

    def updateParse(text: String): List[Op] =
      parseAll(rep1sep(op, ";") <~ opt(";"), text) match {
        case Success(ops, _) => ops
        case other =>
          throw new IllegalArgumentException(s"update parse error: $other")
      }
  }

  def parse(text: String): List[Op] = new UParser().updateParse(text)

  // ---------------------------------------------------------- execution

  private def quadKey = Seq("g", "s", "p", "o")

  private def constQuadsDF(spark: SparkSession,
      quads: List[(Term, Term, Term, Option[Term])]): DataFrame = {
    import spark.implicits._
    quads.map { case (s, p, o, g) =>
      (g.map(Rid.of).getOrElse(WellKnown.defaultGraph),
        Rid.of(s), Rid.of(p), Rid.of(o))
    }.toDF("g", "s", "p", "o")
  }

  private def resourcesOf(spark: SparkSession, terms: Seq[Term]): DataFrame = {
    import spark.implicits._
    terms.distinct.map {
      case Uri(u) => (Rid.uri(u), u, 0L, "")
      case BNode(b) => (Rid.bnode(b), b, 0L, "")
      case Lit(lex, dt, lang) =>
        (Rid.literal(lex, dt, lang), lex, Rid.attr(dt, lang), lang)
    }.toDF("rid", "lex", "dt", "lang")
  }

  def apply(store: QuadStore, spark: SparkSession, text: String): QuadStore =
    parse(text).foldLeft(store)((st, op) => applyOp(st, spark, op))

  def applyOp(store: QuadStore, spark: SparkSession, op: Op): QuadStore =
    op match {
      case InsertData(quads) =>
        val terms = quads.flatMap { case (s, p, o, g) =>
          Seq(s, p, o) ++ g.toSeq ++
            Seq(Uri(WellKnown.defaultGraphUri))
        }
        QuadStore(
          store.quads.unionByName(constQuadsDF(spark, quads))
            .dropDuplicates(quadKey),
          store.resources.unionByName(resourcesOf(spark, terms))
            .dropDuplicates("rid"))
      // mutations drop the inline-value scan (`valued`): spliced rows have
      // no value columns; execution falls back to dictionary resolution.
      // They also drop `segments` — segment frames reference pre-mutation
      // quads (pred/graph RID sets stay valid: deletes only shrink them)
      case DeleteData(quads) =>
        store.copy(quads = store.quads.join(constQuadsDF(spark, quads),
          quadKey, "left_anti"), valued = None, segments = Nil)
      case Clear(None) =>
        store.copy(quads = store.quads.limit(0), valued = None,
          segments = Nil)
      case Clear(Some("")) => store // CREATE: no-op (update.c:225-226)
      case Clear(Some(g)) =>
        store.copy(quads = store.quads.filter(col("g") =!= Rid.uri(g)),
          valued = None, segments = Nil)
      case GraphCopy(kind, from, to) =>
        val fromRid = from.map(Rid.uri).getOrElse(WellKnown.defaultGraph)
        val toRid = to.map(Rid.uri).getOrElse(WellKnown.defaultGraph)
        val moved = store.quads.filter(col("g") === fromRid)
          .withColumn("g", lit(toRid))
        val base = kind match {
          case "ADD" => store.quads // keep target content
          case "COPY" => store.quads.filter(col("g") =!= toRid)
          case "MOVE" => store.quads.filter(col("g") =!= toRid &&
            col("g") =!= fromRid)
        }
        val gRes = resourcesOf(spark,
          to.map(Uri.apply).toSeq ++ from.map(Uri.apply).toSeq)
        QuadStore(base.unionByName(moved).dropDuplicates(quadKey),
          store.resources.unionByName(gRes).dropDuplicates("rid"))
      case Modify(delT, insT, where, _) =>
        val exec = new Exec(store, spark)
        val b = exec.pattern(where)
        def instantiate(tmpl: List[TriplePat]): DataFrame = {
          val rows = tmpl.map { t =>
            def side(pt: PTerm): Column = pt match {
              case PVar(v) => col(v)
              case PConst(term) => lit(Rid.of(term))
            }
            struct(lit(WellKnown.defaultGraph).as("g"), side(t.s).as("s"),
              side(t.p).as("p"), side(t.o).as("o"))
          }
          b.df.select(explode(array(rows: _*)).as("q"))
            .select(col("q.g").as("g"), col("q.s").as("s"),
              col("q.p").as("p"), col("q.o").as("o"))
            .filter(col("s").isNotNull && col("p").isNotNull &&
              col("o").isNotNull)
            .distinct()
        }
        var quads = store.quads
        if (delT.nonEmpty) {
          // deletes match any graph (as the reference batch-deletes by
          // (model=any, s, p, o), update.c:349-365)
          quads = quads.join(instantiate(delT).drop("g"),
            Seq("s", "p", "o"), "left_anti")
        }
        var resources = store.resources
        if (insT.nonEmpty) {
          quads = quads.unionByName(instantiate(insT))
            .dropDuplicates(quadKey)
          val consts = insT.flatMap(t =>
            Seq(t.s, t.p, t.o).collect { case PConst(term) => term }) :+
            Uri(WellKnown.defaultGraphUri)
          resources = resources.unionByName(resourcesOf(spark, consts))
            .dropDuplicates("rid")
        }
        QuadStore(quads, resources)
    }
}
