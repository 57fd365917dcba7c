package graft.sparql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.rdf._
import Ast._

/** Runtime value model: the Spark analog of the reference's dynamic
  * `fs_value` overlay (`src/frontend/filter-datatypes.h:43-52`). A term in
  * expression position is a bundle of lazily-evaluated typed views; a view
  * that doesn't apply evaluates to NULL, and NULL propagates like the
  * reference's type-error contagion (`src/frontend/filter.c` passim):
  * errors drop FILTER rows and unbind SELECT expressions — exactly SQL
  * NULL behavior, which is why the mapping is safe.
  */
final case class V(rid: Column, lex: Column, dt: Column, lang: Column) {
  import WellKnown._

  /** numeric view (promotion collapses to double; divergence from the
    * reference's 20+20-digit fs_decimal is documented in SURVEY §7.4) */
  def num: Column = // try_cast: a malformed numeral is a type error (NULL)
    when(dt.isin(numericAttrs: _*), lex.try_cast("double"))
  /** exact-numeric view: integers and xsd:decimal as DECIMAL(38,18)
    * (reference fs_decimal is 20+20 base-10 digits,
    * `src/frontend/decimal.h:5-19`; Spark's max precision is 38 — we keep
    * 20 integer digits and give up 2 fractional ones). try_cast: a lexical
    * beyond 20 integer digits is a type error (NULL), not an ANSI throw. */
  def dec: Column =
    when(dt.isin((integerAttrs :+ decimalAttr): _*),
      lex.try_cast(org.apache.spark.sql.types.DecimalType(38, 18)))
  def isNum: Column =
    dt.isin(numericAttrs: _*) && lex.try_cast("double").isNotNull
  def isInt: Column = dt.isin(integerAttrs: _*)
  /** plain-string view (simple literal or xsd:string, no lang) */
  def str: Column =
    when(dt === 0L && Rid.isLiteralCol(coalesce(rid, lit(0L))) &&
      coalesce(lang, lit("")) === "", lex)
  /** any-lexical view (STR() semantics: works for URIs and all literals) */
  def anyLex: Column = lex
  def bool: Column = when(dt === booleanAttr, lex.try_cast("boolean"))
  def ts: Column =
    when(dt === dateTimeAttr || dt === dateAttr, lex.try_cast("timestamp"))

  /** SPARQL effective boolean value (`fn_ebv`,
    * `src/frontend/filter.c:1356-1378`): boolean -> itself; numeric ->
    * != 0; string -> non-empty; else type error (NULL). */
  def ebv: Column =
    when(dt === booleanAttr, lex.try_cast("boolean"))
      .when(dt.isin(numericAttrs: _*),
        lex.try_cast("double") =!= 0.0 && !isnan(lex.try_cast("double")))
      .when(dt === 0L && coalesce(lang, lit("")) === "" &&
        Rid.isLiteralCol(coalesce(rid, lit(0L))), length(lex) > 0)
      .when(coalesce(lang, lit("")) =!= "", length(lex) > 0)
      .otherwise(lit(null).cast("boolean"))

  def bound: Column = rid.isNotNull || lex.isNotNull
}

object V {
  import WellKnown._

  /** a V whose every view is NULL (the error/unbound value) */
  val nul: V = V(lit(null).cast("long"), lit(null).cast("string"),
    lit(null).cast("long"), lit(null).cast("string"))

  def ofVar(name: String): V =
    V(col(name), col(s"${name}__lex"), col(s"${name}__dt"),
      col(s"${name}__lang"))

  def ofTerm(t: Term): V = t match {
    case Uri(u)   => V(lit(Rid.uri(u)), lit(u), lit(0L), lit(""))
    case BNode(b) => V(lit(Rid.bnode(b)), lit(b), lit(0L), lit(""))
    case Lit(lex, dt, lang) =>
      V(lit(Rid.literal(lex, dt, lang)), lit(lex),
        lit(Rid.attr(dt, lang)), lit(lang))
  }

  /** computed typed literal: rid derived from (lex, attr) like the
    * reference's computed-resource registration (`query.c:868-893`) */
  def typed(lex: Column, attrRid: Column, lang: Column = lit("")): V =
    V(when(lex.isNotNull, Rid.literalCol(lex, attrRid)), lex,
      when(lex.isNotNull, attrRid), lang)

  def ofNum(c: Column, intWhen: Column = lit(false)): V = {
    val attr = when(intWhen, lit(Rid.uri(Xsd.integer)))
      .otherwise(lit(doubleAttr))
    val lex = when(intWhen, c.cast("long").cast("string"))
      .otherwise(c.cast("string"))
    typed(lex, attr)
  }
  def ofStr(c: Column): V = typed(c, lit(0L))
  def ofBool(c: Column): V =
    typed(c.cast("string"), lit(booleanAttr))
  def ofUri(c: Column): V =
    V(when(c.isNotNull, Rid.uriCol(c)), c, lit(0L), lit(""))

  /** SPARQL total-order sort key (`src/frontend/order.c:66-127`):
    * unbound < bnodes < URIs < literals; literals numeric-aware with
    * lexical fallback. One orderable struct column.
    *
    * Within the literal rank, numeric/dateTime values order before
    * non-numeric lexicals (the reference compares decoded values first
    * and falls back to lexical, so un-decodable literals sort after all
    * numbers — verified against `tests/query/exemplar/add-and-delete`).
    * A non-finite parse (e.g. an overflowing float lexical) is NOT a
    * number, matching the reference's failed BCD decode. */
  def sortKey(v: V): Column = {
    val n = coalesce(v.num, v.ts.cast("double"))
    val finite = when(!isnan(n) && n =!= Double.PositiveInfinity &&
      n =!= Double.NegativeInfinity, n)
    struct(
      Rid.typeRankCol(coalesce(v.rid,
        when(v.lex.isNotNull, lit(1L) /*bound computed*/))).as("rank"),
      coalesce(finite, lit(Double.PositiveInfinity)).as("num"),
      v.anyLex.as("lex"))
  }
}

/** Expression compiler: AST -> V over a bindings DataFrame. */
object Compiler {
  /** per-call-site ticket for zero-arg BNODE() freshness */
  private val bnodeSiteCtr = new java.util.concurrent.atomic.AtomicLong()
  private[sparql] def bnodeSite(): Long = bnodeSiteCtr.incrementAndGet()

  /** Row-unique salt for zero-arg BNODE(), scoped by the consumption
    * site. The salt must be ONE materialized column, referenced by
    * both the rid and the label expressions (BIND / FILTER / SELECT
    * compile all the V's columns into one projection, but rid and lex
    * are separate output columns — a `monotonically_increasing_id()`
    * embedded in each is two INDEPENDENT stateful instances, and any
    * optimizer move that evaluates them in different projections
    * desyncs rid from label; Spark also rejects nondeterministic
    * expressions outside Project/Filter/Aggregate, so BNODE() in a
    * join key threw). [[saltInput]] projects the id ONCE into
    * [[BnodeRowIdCol]] — CollapseProject refuses to inline a
    * nondeterministic alias, so the projection stays materialized and
    * everything downstream references the same per-row value. §17.4.2.9
    * freshness is therefore per SOLUTION ROW: two identical rows carry
    * different ids and mint distinct nodes (the r10 deterministic
    * row-hash salt shared a node across duplicates; r11 closes that).
    * The projection is only added when the expression actually
    * contains a zero-arg BNODE — an unconditional nondeterministic
    * column under every FILTER would block predicate pushdown
    * engine-wide. */
  val BnodeRowIdCol = "__bnode_rowid"
  def hasFreshBnode(e: Expr): Boolean = e match {
    case ECall("BNODE", Nil) => true
    case ECall(_, as) => as.exists(hasFreshBnode)
    case EIn(x, l, _) => (x :: l).exists(hasFreshBnode)
    case EAgg(_, _, a, _) => a.exists(hasFreshBnode)
    case _ => false
  }
  /** Project the BNODE row id into `df` iff any of `exprs` needs it
    * (idempotent). Callers drop [[BnodeRowIdCol]] from their output.
    *
    * The salted projection is PINNED (lazy localCheckpoint): a
    * `monotonically_increasing_id` is only per-ATTEMPT deterministic —
    * if the plan above recomputes the projection (self-join consuming
    * the subtree twice, stage retry re-fetching an unordered
    * exchange), a fresh run could mint different ids for the same
    * logical row, desyncing a BNODE's rid from its label or one join
    * side from the other. The checkpoint materializes the ids exactly
    * once on first compute; every downstream consumer reads the same
    * stored blocks. Lineage is truncated, so the failure mode on
    * block loss is a LOUD job failure, never a silent re-mint (local
    * and single-job cluster runs never lose blocks mid-query; r12
    * retires the r11 "recompute edge" note). Cost is bounded: the pin
    * only exists when the query actually contains a zero-arg BNODE(),
    * and pins that query's solution relation, not the store. */
  def saltInput(df: DataFrame, exprs: Seq[Expr]): DataFrame =
    if (exprs.exists(hasFreshBnode) && !df.columns.contains(BnodeRowIdCol))
      df.withColumn(BnodeRowIdCol, monotonically_increasing_id())
        .localCheckpoint(eager = false)
    else df
  private val rowSaltVar =
    new scala.util.DynamicVariable[Option[Column]](None)
  private[sparql] def rowSalt: Option[Column] = rowSaltVar.value
  /** Compile `f` with the row salt in scope when `df` carries the
    * materialized id column (see [[saltInput]]). */
  def withRowSalt[T](df: DataFrame)(f: => T): T =
    rowSaltVar.withValue(
      if (df.columns.contains(BnodeRowIdCol)) Some(col(BnodeRowIdCol))
      else None)(f)

  import WellKnown._

  /** @param aggSub aggregate-call substitutions (post-GROUP BY columns) */
  def compile(e: Expr, aggSub: Map[Expr, V] = Map.empty): V = e match {
    case a if aggSub.contains(a) => aggSub(a)
    case EVar(n)   => V.ofVar(n)
    case EConst(t) => V.ofTerm(t)
    // constant arithmetic folds at COMPILE time: the column-level V for
    // an arith result re-derives num/dec/str/bool from a when-chain
    // lexical, so each consumer (cmp, EBV, ||) re-expands the whole
    // subtree — a constant like `1/0` then explodes the generated code
    // past janino's limits. Folding here emits four literal columns.
    case c @ ECall(op, _) if arithFoldOps(op) && constNum(c).isDefined =>
      constNum(c).get match {
        case None => V.nul // type error (e.g. exact division by zero)
        case Some(CExact(bd, true)) =>
          V.typed(lit(bd.toBigInt.toString), lit(Rid.uri(Xsd.integer)))
        case Some(CExact(bd, false)) =>
          val s0 = bd.underlying.stripTrailingZeros.toPlainString
          V.typed(lit(if (s0 == "-0") "0" else s0), lit(decimalAttr))
        case Some(CDbl(d)) =>
          V.typed(lit(java.lang.Double.toString(d)), lit(doubleAttr))
      }
    case EIn(x, list, neg) =>
      val c = compile(x, aggSub)
      val tests = list.map(i => eq(c, compile(i, aggSub)))
      val anyTrue = tests.reduce((a, b) =>
        when(a === true || b === true, true)
          .otherwise(when(a.isNull || b.isNull, lit(null).cast("boolean"))
            .otherwise(false)))
      V.ofBool(if (neg) !anyTrue else anyTrue)
    case EExists(_, _) =>
      throw new IllegalArgumentException(
        "EXISTS is only supported as a top-level FILTER")
    case EAgg(_, _, _, _) =>
      throw new IllegalArgumentException(
        "aggregate used outside aggregation context")
    case ECall(fn, args) => call(fn, args.map(compile(_, aggSub)), args)
  }

  /** Depth of non-leaf (call/IN) nesting — the blowup driver: every
    * compiled operator references its operands' term views several
    * times, and each reference re-inlines the operand's WHOLE tree, so
    * generated code grows ~10× per nesting level (janino's 64 KB method
    * limit dies around depth 2 over an inline-valued scan). */
  def nestDepth(e: Expr): Int = e match {
    case ECall(_, args) => 1 + (0 +: args.map(nestDepth)).max
    case EIn(x, l, _) => 1 + (0 +: (x :: l).map(nestDepth)).max
    case _ => 0
  }

  /** Compile with SUB-EXPRESSION SHARING: materialize every non-leaf
    * node's term view (rid/lex/dt/lang) as intermediate projection
    * columns — one `select` per AST level, deepest first — so each
    * node's generated code references its operands as plain COLUMNS and
    * total code size stays LINEAR in expression size. Catalyst's
    * CollapseProject keeps the levels apart (it refuses to inline
    * non-cheap aliases referenced more than once); the caller is
    * responsible for not letting predicate pushdown re-substitute
    * through the levels (Exec.filter pins the filter with a
    * nondeterministic conjunct).
    *
    * Returns (widened df, root view over materialized columns, temp
    * columns to drop when done). */
  def compileStaged(df0: org.apache.spark.sql.DataFrame, root: Expr,
                    sub: Map[Expr, V])
      : (org.apache.spark.sql.DataFrame, V, Seq[String]) = {
    val (df, env, tmp) = compileStagedMany(df0, Seq(root), sub)
    (df, env(root), tmp)
  }

  /** [[compileStaged]] for several roots sharing one staging pipeline
    * (SELECT item expressions + ORDER BY keys stage together, so a
    * sub-expression common to two items materializes once). The result
    * map carries a V for EVERY root — shallow roots (nest depth ≤ 1,
    * where the blowup can't trigger) compile inline. Level counters are
    * per-call-unique so two staging passes over the same df can't
    * collide on temp column names. */
  private val stageTicket = new java.util.concurrent.atomic.AtomicInteger(0)
  def compileStagedMany(df0: org.apache.spark.sql.DataFrame,
                        roots: Seq[Expr], sub: Map[Expr, V])
      : (org.apache.spark.sql.DataFrame, Map[Expr, V], Seq[String]) = {
    def children(e: Expr): List[Expr] = e match {
      case ECall(_, args) => args
      case EIn(x, l, _) => x :: l
      case _ => Nil
    }
    var env = sub
    def isLeaf(e: Expr): Boolean =
      env.contains(e) || (e match {
        case _: EVar | _: EConst => true
        case _ => false
      })
    def envDepth(e: Expr): Int =
      if (isLeaf(e)) 0 else 1 + (0 +: children(e).map(envDepth)).max
    val (deep, shallow) = roots.distinct.partition(envDepth(_) >= 2)
    var df = df0
    val tmp = Seq.newBuilder[String]
    val tag = stageTicket.getAndIncrement()
    var level = 0
    while (!deep.forall(isLeaf)) {
      val ready = scala.collection.mutable.LinkedHashSet[Expr]()
      def scan(e: Expr): Unit =
        if (!isLeaf(e)) {
          val cs = children(e)
          if (cs.forall(isLeaf)) ready += e else cs.foreach(scan)
        }
      deep.foreach(scan)
      val defs = ready.toSeq.map(e => e -> compile(e, env))
      val cols = df.columns.map(col).toBuffer
      defs.zipWithIndex.foreach { case ((e, v), j) =>
        val p = s"__cs${tag}_${level}_$j"
        cols += v.rid.as(s"${p}r") += v.lex.as(s"${p}l") +=
          v.dt.as(s"${p}d") += v.lang.as(s"${p}g")
        tmp ++= Seq(s"${p}r", s"${p}l", s"${p}d", s"${p}g")
        env += e -> V(col(s"${p}r"), col(s"${p}l"),
          col(s"${p}d"), col(s"${p}g"))
      }
      df = df.select(cols.toSeq: _*)
      level += 1
    }
    val out = roots.distinct.map { r =>
      r -> (if (isLeaf(r)) env.getOrElse(r, compile(r, env))
            else compile(r, env))
    }.toMap
    (df, out, tmp.result())
  }

  // ---------------------------------------- compile-time constant math

  private sealed trait CNum
  private final case class CExact(v: BigDecimal, int: Boolean) extends CNum
  private final case class CDbl(v: Double) extends CNum

  private val arithFoldOps = Set("+", "-", "*", "/", "-u")

  /** Compile-time value of a constant numeric expression. Outer None =
    * not constant (don't fold); inner None = constant but a type ERROR
    * (exact division by zero, non-numeric operand, bad lexical) — folds
    * to the error (all-NULL) V. Promotion mirrors [[arith]]: int op int
    * stays integer except division; exact operands compute in decimal;
    * any float/double operand computes in IEEE double. */
  private def constNum(e: Expr): Option[Option[CNum]] = e match {
    case EConst(Lit(lex, dt, "")) =>
      Some(
        try {
          if (Xsd.integerFamily.contains(dt))
            Some(CExact(BigDecimal(new java.math.BigInteger(lex.trim)),
              int = true))
          else if (dt == Xsd.decimal)
            Some(CExact(BigDecimal(lex.trim), int = false))
          else if (dt == Xsd.double || dt == Xsd.float)
            Some(CDbl(lex.trim.toDouble))
          else (None: Option[CNum]) // non-numeric literal: type error
        } catch { case _: Exception => None })
    case EConst(_) => Some(None) // URI/bnode/lang literal: type error
    case ECall("-u", List(x)) =>
      constNum(x).map(_.map {
        case CExact(v, i) => CExact(-v, i)
        case CDbl(d) => CDbl(-d)
      })
    case ECall(op, List(x, y)) if arithFoldOps(op) =>
      for (cx <- constNum(x); cy <- constNum(y)) yield (cx, cy) match {
        case (Some(a), Some(b)) => constApply(op, a, b)
        case _ => None // an erroring operand errors the whole expr
      }
    case _ => None
  }

  private def constApply(op: String, a: CNum, b: CNum): Option[CNum] =
    (a, b) match {
      case (CDbl(_), _) | (_, CDbl(_)) =>
        def d(c: CNum) = c match {
          case CDbl(v) => v; case CExact(v, _) => v.toDouble
        }
        val (x, y) = (d(a), d(b))
        Some(CDbl(op match {
          case "+" => x + y; case "-" => x - y
          case "*" => x * y; case _ => x / y // IEEE: /0 -> ±Inf/NaN
        }))
      case (CExact(x, xi), CExact(y, yi)) =>
        // mirror the RUNTIME decimal model (V.dec = DECIMAL(38,18), so
        // 20 integer digits; Spark's divide lands on scale 6), so a
        // constant expression folds to the same value/error the same
        // expression over column data would produce
        def fit(r: BigDecimal, scale: Int, maxInt: Int): Option[CNum] = {
          val rounded = BigDecimal(r.underlying.setScale(scale,
            java.math.RoundingMode.HALF_UP))
          if (rounded.underlying.precision - rounded.underlying.scale >
              maxInt) None // overflow: type error, as try_add/_multiply
          else Some(CExact(rounded, int = false))
        }
        op match {
          case "/" =>
            if (y.signum == 0) None // exact division by zero: type error
            else fit(BigDecimal(x.underlying.divide(y.underlying,
              java.math.MathContext.DECIMAL128)), 6, 32)
          case _ =>
            val r = op match {
              case "+" => x + y; case "-" => x - y; case _ => x * y
            }
            fit(r, 18, 20).map {
              case CExact(v, _) => CExact(v, xi && yi)
              case other => other
            }
        }
    }

  /** value equality with term-identity fallback
    * (`src/frontend/filter.c:526-610`). After the value-comparable rows
    * (numeric, dateTime, boolean, string), RDFterm-equal applies
    * (SPARQL 1.1 §17.4.1.7): same term -> true; two distinct literals
    * that no value row could compare -> type error (NULL), NOT false —
    * `"1" != 1` must drop the row, not keep it; anything else (a URI or
    * bnode on either side) -> false. */
  private def eq(a: V, b: V): Column = {
    val bothLit = Rid.isLiteralCol(a.rid) && Rid.isLiteralCol(b.rid)
    when(a.num.isNotNull && b.num.isNotNull, a.num === b.num)
      .when(a.ts.isNotNull && b.ts.isNotNull, a.ts === b.ts)
      .when(a.bool.isNotNull && b.bool.isNotNull, a.bool === b.bool)
      .when(a.str.isNotNull && b.str.isNotNull, a.str === b.str)
      .when(a.rid.isNotNull && b.rid.isNotNull && a.rid === b.rid, true)
      .when(a.rid.isNotNull && b.rid.isNotNull && bothLit,
        lit(null).cast("boolean"))
      .when(a.rid.isNotNull && b.rid.isNotNull, false)
      .otherwise(lit(null).cast("boolean"))
  }

  private def cmp(a: V, b: V, f: (Column, Column) => Column): Column =
    when(a.num.isNotNull && b.num.isNotNull, f(a.num, b.num))
      .when(a.ts.isNotNull && b.ts.isNotNull, f(a.ts, b.ts))
      .when(a.str.isNotNull && b.str.isNotNull, f(a.str, b.str))
      .when(a.bool.isNotNull && b.bool.isNotNull, f(a.bool, b.bool))
      .otherwise(lit(null).cast("boolean"))

  /** SPARQL numeric promotion (`fs_value_promote`,
    * `filter-datatypes.c:286`): int op int stays integer (except
    * division), exact (integer/decimal) operands compute in DECIMAL —
    * including int/int division, whose divide-by-zero yields a type error
    * (NULL), matching the reference's decimal divide — and anything
    * involving float/double computes in double (where /0 is ±Inf, per
    * XSD float semantics). */
  private def arith(op: String, a: V, b: V): V = {
    val longCase = a.isInt && b.isInt && lit(op != "/")
    val exactCase = (a.isInt || a.dt === decimalAttr) &&
      (b.isInt || b.dt === decimalAttr)
    // ANSI-safe exact ops: try_* give NULL on /0 and overflow (the SPARQL
    // type-error value) instead of throwing; the double division path
    // restores IEEE ±Inf/NaN explicitly, since ANSI Divide would throw
    def f(x: Column, y: Column, dec: Boolean): Column = op match {
      case "+" => if (dec) try_add(x, y) else x + y
      case "-" => if (dec) try_subtract(x, y) else x - y
      case "*" => if (dec) try_multiply(x, y) else x * y
      case "/" =>
        if (dec) try_divide(x, y)
        else when(y === 0 && x.isNotNull,
          when(x > 0, lit(Double.PositiveInfinity))
            .when(x < 0, lit(Double.NegativeInfinity))
            .otherwise(lit(Double.NaN)))
          .otherwise(try_divide(x, y))
    }
    val dblR = f(a.num, b.num, dec = false)
    val decR = f(a.dec, b.dec, dec = true)
    // canonical-ish decimal lexical form: strip trailing fraction zeros
    val decCanon = regexp_replace(regexp_replace(
      decR.cast("string"), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
    // integer results come off the EXACT (decimal) path too: computing
    // them via double would round above 2^53
    val lex = when(longCase || exactCase, decCanon)
      .otherwise(dblR.cast("string"))
    val dt = when(longCase, lit(Rid.uri(Xsd.integer)))
      .when(exactCase, lit(decimalAttr))
      .otherwise(lit(doubleAttr))
    V(when(lex.isNotNull, Rid.literalCol(lex, dt)), lex,
      when(lex.isNotNull, dt), lit(""))
  }

  /** exact unary numeric op: integer/decimal operands compute in
    * DECIMAL and keep their exact type; float/double via double */
  private def numUnary(v: V, fDec: Column => Column,
                       fDbl: Column => Column): V = {
    val exact = v.isInt || v.dt === decimalAttr
    val decCanon = regexp_replace(regexp_replace(
      fDec(v.dec).cast("string"), "(\\.\\d*?)0+$", "$1"), "\\.$", "")
    val lex = when(exact, decCanon).otherwise(fDbl(v.num).cast("string"))
    val dt = when(v.isInt, lit(Rid.uri(Xsd.integer)))
      .when(exact, lit(decimalAttr)).otherwise(lit(doubleAttr))
    V(when(lex.isNotNull, Rid.literalCol(lex, dt)), lex,
      when(lex.isNotNull, dt), lit(""))
  }

  /** Double-side rounding family wrapper: Spark's floor/ceil return
    * LONG (a non-finite double would overflow to Long.MaxValue); pass
    * NaN/±inf through unchanged like fn:floor/ceiling/round require. */
  private def dblSafe(f: Column => Column)(c: Column): Column = {
    val nonFinite = isnan(c) || c === Double.PositiveInfinity ||
      c === Double.NegativeInfinity
    when(nonFinite, c).otherwise(f(c).cast("double"))
  }

  private def call(fn: String, vs: List[V], raw: List[Expr]): V = fn match {
    // logical (Spark AND/OR are already Kleene 3-valued, matching
    // `src/frontend/filter.c:934-986`)
    case "&&" => V.ofBool(vs(0).ebv && vs(1).ebv)
    case "||" => V.ofBool(vs(0).ebv || vs(1).ebv)
    case "!"  => V.ofBool(!vs(0).ebv)
    case "=" => V.ofBool(eq(vs(0), vs(1)))
    case "!=" => V.ofBool(when(eq(vs(0), vs(1)).isNull,
        lit(null).cast("boolean")).otherwise(!eq(vs(0), vs(1))))
    case "<"  => V.ofBool(cmp(vs(0), vs(1), _ < _))
    case ">"  => V.ofBool(cmp(vs(0), vs(1), _ > _))
    case "<=" => V.ofBool(cmp(vs(0), vs(1), _ <= _))
    case ">=" => V.ofBool(cmp(vs(0), vs(1), _ >= _))
    case "+" | "-" | "*" | "/" => arith(fn, vs(0), vs(1))
    // exact like the binary ops: negating a decimal/integer must not
    // detour through double (rank AND precision both survive)
    case "-u" => numUnary(vs(0), d => -d, c => -c)

    // term tests / accessors
    case "BOUND" => V.ofBool(vs(0).bound)
    case "ISIRI" | "ISURI" =>
      V.ofBool(when(vs(0).bound, Rid.isUriCol(vs(0).rid)))
    case "ISBLANK" =>
      V.ofBool(when(vs(0).bound, Rid.isBNodeCol(vs(0).rid)))
    case "ISLITERAL" =>
      V.ofBool(when(vs(0).bound, Rid.isLiteralCol(vs(0).rid)))
    case "ISNUMERIC" => V.ofBool(when(vs(0).bound, vs(0).isNum))
    case "STR" => V.ofStr(vs(0).anyLex)
    case "IRI" | "URI" => V.ofUri(vs(0).anyLex)
    case "BNODE" if vs.isEmpty =>
      // zero-arg form (§17.4.2.9): a FRESH blank node per solution row.
      // Label = per-call-site salt (two BNODE() sites in one query must
      // not collide) + the ROW-UNIQUE id the consumption site
      // materialized via Compiler.saltInput/withRowSalt — rid and label
      // both reference that one column, so they cannot desync, and
      // duplicate solution rows mint distinct nodes. The fallback (no
      // salt in scope) keeps the plan-unique id.
      val salt = Compiler.rowSalt
        .getOrElse(monotonically_increasing_id())
      val lbl = concat(lit(s"fresh${Compiler.bnodeSite()}x"),
        hex(salt.cast("long")))
      V(Rid.bnodeCol(lbl), lbl, lit(0L), lit(""))
    case "BNODE" =>
      V(when(vs(0).anyLex.isNotNull, Rid.bnodeCol(vs(0).anyLex)),
        vs(0).anyLex, lit(0L), lit(""))
    case "LANG" => V.ofStr(coalesce(vs(0).lang, lit("")))
    case "DATATYPE" =>
      // plain literal -> xsd:string; typed -> its datatype URI (resolved
      // lazily: we only support well-known datatypes here). URIs, bnodes
      // and unbound are a type error (SPARQL 1.1 §17.4.2.7's argument
      // type is `literal`), like the reference's fn_datatype
      val dtUri = when(
        vs(0).rid.isNotNull && Rid.isLiteralCol(vs(0).rid),
        when(vs(0).lang =!= "", lit(Rdf.langString))
          .when(vs(0).dt === 0L, lit(Xsd.string))
          .otherwise(dtLexOf(vs(0).dt)))
      V.ofUri(dtUri)
    case "LANGMATCHES" =>
      val l = lower(vs(0).anyLex); val r = lower(vs(1).anyLex)
      V.ofBool(when(r === "*", l =!= "")
        .otherwise(l === r || l.startsWith(concat(r, lit("-")))))
    case "SAMETERM" => V.ofBool(vs(0).rid === vs(1).rid)
    case "STRLANG" =>
      V(Rid.literalCol(vs(0).str,
          xxhash64(lower(vs(1).str)).bitwiseAND(lit(0x3FFFFFFFFFFFFFFFL))),
        vs(0).str, lit(0L), lower(vs(1).str))
    case "STRDT" =>
      V.typed(vs(0).str, Rid.uriCol(vs(1).anyLex))

    // numeric — exact (decimal) path for integer/decimal operands, like
    // the reference's fs_decimal ops (`src/frontend/decimal.c`); a double
    // detour would round e.g. ABS("1234567890.23239300"^^xsd:decimal)
    case "ABS"   => numUnary(vs(0), abs, abs)
    case "FLOOR" => numUnary(vs(0), floor, dblSafe(floor))
    case "CEIL"  => numUnary(vs(0), ceil, dblSafe(ceil))
    // fn:round rounds half toward POSITIVE infinity (-2.5 -> -2), not
    // HALF_UP away from zero (what Spark round() does)
    case "ROUND" => numUnary(vs(0),
      d => floor(d + lit(new java.math.BigDecimal("0.5"))), // stays decimal
      dblSafe(c => floor(c + lit(0.5))))

    // strings (`src/frontend/filter.c:1380-1680`)
    case "STRLEN" => V.ofNum(length(vs(0).anyLex).cast("double"), lit(true))
    // case maps keep arg1's kind (lang tag / xsd:string), like SUBSTR
    case "UCASE" => V.typed(upper(vs(0).anyLex),
      coalesce(vs(0).dt, lit(0L)), coalesce(vs(0).lang, lit("")))
    case "LCASE" => V.typed(lower(vs(0).anyLex),
      coalesce(vs(0).dt, lit(0L)), coalesce(vs(0).lang, lit("")))
    case "SUBSTR" =>
      // fn:substring semantics (XPath, which the reference inherits from
      // Rasqal: exemplar functions-substr pins SUBSTR(?o,0) = whole
      // string and fractional args rounding): args round half toward
      // +infinity; characters at 1-based positions p with
      // round(start) <= p < round(start)+round(len); result keeps arg1's
      // kind (language tag / xsd:string)
      def rnd(c: Column) = floor(c.cast("double") + 0.5).cast("int")
      val hay = vs(0).anyLex
      val startR = rnd(vs(1).num)
      val from = greatest(startR, lit(1))
      val take =
        if (vs.size > 2) greatest(startR + rnd(vs(2).num) - from, lit(0))
        else length(hay)
      V.typed(hay.substr(from, take), coalesce(vs(0).dt, lit(0L)),
        coalesce(vs(0).lang, lit("")))
    case "STRSTARTS" => V.ofBool(vs(0).anyLex.startsWith(vs(1).anyLex))
    case "STRENDS"   => V.ofBool(vs(0).anyLex.endsWith(vs(1).anyLex))
    case "CONTAINS"  => V.ofBool(vs(0).anyLex.contains(vs(1).anyLex))
    case "STRBEFORE" | "STRAFTER" =>
      // SPARQL 1.1 §17.4.3.4-5: arg2 must be language-compatible with
      // arg1 (simple, or same tag) else error; a found match keeps
      // arg1's kind; no match returns the empty SIMPLE literal (the
      // reference returns ""@lang there — spec-nonconformant, not kept)
      val hay = vs(0).anyLex; val needle = vs(1).anyLex
      val l0 = coalesce(vs(0).lang, lit(""))
      val l1 = coalesce(vs(1).lang, lit(""))
      val compat = l1 === "" || l0 === l1
      val ix = call_function("instr", hay, needle)
      val found = ix > 0
      val piece =
        if (fn == "STRBEFORE") hay.substr(lit(1), ix - 1)
        else hay.substr(ix + length(needle), length(hay))
      val lex = when(compat && hay.isNotNull && needle.isNotNull,
        when(found, piece).otherwise(lit("")))
      val dt = when(found, coalesce(vs(0).dt, lit(0L))).otherwise(lit(0L))
      val lang = when(found, l0).otherwise(lit(""))
      V(when(lex.isNotNull, Rid.literalCol(lex, dt)), lex,
        when(lex.isNotNull, dt), when(lex.isNotNull, lang))
    case "CONCAT" if vs.isEmpty =>
      // zero-arg CONCAT() is legal grammar; the result is the empty
      // simple literal (§17.4.3.12 fn:concat over no args)
      V.ofStr(lit(""))
    case "CONCAT" =>
      // SPARQL 1.1 §17.4.3.12: the result carries a lang tag only when
      // EVERY argument carries that same tag (xsd:string likewise);
      // any mix falls back to a simple literal
      val langs = vs.map(v => coalesce(v.lang, lit("")))
      val sameLang = langs.map(_ === langs.head).reduce(_ && _) &&
        langs.head =!= ""
      val dts = vs.map(v => coalesce(v.dt, lit(0L)))
      val strAttr = graft.rdf.Rid.uri(graft.rdf.Xsd.string)
      val sameStr = dts.map(_ === strAttr).reduce(_ && _)
      V.typed(concat(vs.map(_.anyLex): _*),
        when(sameStr, lit(strAttr)).otherwise(lit(0L)),
        when(sameLang, langs.head).otherwise(lit("")))
    case "REPLACE" =>
      // optional 4th arg: XPath flags, applied as a (?flags) prefix on
      // the pattern, same as REGEX below
      val rPat =
        if (vs.size > 3)
          when(length(vs(3).anyLex) > 0,
            concat(lit("(?"), vs(3).anyLex, lit(")"), vs(1).anyLex))
            .otherwise(vs(1).anyLex)
        else vs(1).anyLex
      V.typed(regexp_replace(vs(0).anyLex, rPat, vs(2).anyLex),
        coalesce(vs(0).dt, lit(0L)), coalesce(vs(0).lang, lit("")))
    case "REGEX" =>
      val flags = if (vs.size > 2) vs(2).anyLex else lit("")
      val pat = when(length(flags) > 0,
        concat(lit("(?"), flags, lit(")"), vs(1).anyLex))
        .otherwise(vs(1).anyLex)
      V.ofBool(call_function("rlike", vs(0).anyLex, pat))
    case "ENCODE_FOR_URI" =>
      // fn:encode-for-uri percent-encodes with unreserved A-Za-z0-9-_.~;
      // url_encode is form-encoding — patch its three divergences
      // (space -> '+', '*' kept, '~' escaped)
      V.ofStr(regexp_replace(regexp_replace(regexp_replace(
        url_encode(vs(0).anyLex), "\\+", "%20"), "\\*", "%2A"),
        "%7E", "~"))

    // dates (`src/frontend/filter.c:1486-1572`)
    // date/time component accessors (SPARQL 1.1 §17.4.5): components of
    // the literal AS WRITTEN — "…T15:38:02-08:00" has HOURS 15 whatever
    // the session timezone, so extract from the lexical form, not from a
    // session-normalized timestamp. `ts.isNotNull` guards the kind: a
    // non-dateTime argument is an error (NULL), as is a missing part.
    case "YEAR"    => dtPart(vs(0), "^(-?[0-9]{4,})-")
    case "MONTH"   => dtPart(vs(0), "^-?[0-9]{4,}-([0-9]{2})")
    case "DAY"     => dtPart(vs(0), "^-?[0-9]{4,}-[0-9]{2}-([0-9]{2})")
    case "HOURS"   => dtPart(vs(0), "T([0-9]{2}):")
    case "MINUTES" => dtPart(vs(0), "T[0-9]{2}:([0-9]{2}):")
    case "SECONDS" => // §17.4.5.6: ALWAYS xsd:decimal, fraction survives
      val lex = when(vs(0).ts.isNotNull, regexp_extract(vs(0).anyLex,
        "T[0-9]{2}:[0-9]{2}:([0-9]{2}(?:\\.[0-9]+)?)", 1))
      val n = lex.cast("double")
      val outLex = when(n === n.cast("long").cast("double"),
        n.cast("long").cast("string")).otherwise(n.cast("string"))
      V.typed(outLex, lit(decimalAttr))
    // TZ/TIMEZONE (SPARQL 1.1 §17.4.5.8-9; the reference stubs both to
    // "", filter.c:1573 — here the full semantics): TZ gives the literal
    // timezone designator ("" when absent); TIMEZONE gives it as an
    // xsd:dayTimeDuration and errors when absent
    case "TZ" =>
      V.ofStr(when(vs(0).ts.isNotNull,
        regexp_extract(vs(0).anyLex, "(Z|[+-][0-9]{2}:[0-9]{2})$", 1)))
    case "TIMEZONE" =>
      val tz = when(vs(0).ts.isNotNull,
        regexp_extract(vs(0).anyLex, "(Z|[+-][0-9]{2}:[0-9]{2})$", 1))
      val h = regexp_extract(tz, "0*([0-9]+):", 1).try_cast("int")
      val m = regexp_extract(tz, ":0*([0-9]+)", 1).try_cast("int")
      val sign = when(tz.startsWith("-"), lit("-")).otherwise(lit(""))
      val dur = when(tz === "Z" || (h === 0 && m === 0), lit("PT0S"))
        .when(tz =!= "", concat(sign, lit("PT"),
          when(h =!= 0, concat(h.cast("string"), lit("H")))
            .otherwise(lit("")),
          when(m =!= 0, concat(m.cast("string"), lit("M")))
            .otherwise(lit(""))))
      V.typed(dur, lit(Rid.uri(Xsd.ns + "dayTimeDuration")))
    case "NOW" => V.typed(date_format(current_timestamp(),
        "yyyy-MM-dd'T'HH:mm:ss"), lit(dateTimeAttr))
    // LAQRS extensions (`results.c:631-650`)
    case "FROM_UNIXTIME" => V.typed(
      date_format(from_unixtime(vs(0).num.cast("long")),
        "yyyy-MM-dd'T'HH:mm:ss"), lit(dateTimeAttr))
    case "TO_UNIXTIME" =>
      V.ofNum(unix_timestamp(vs(0).ts).cast("double"), lit(true))

    // hashes (`src/frontend/filter.c:1686-1730`)
    case "MD5"    => V.ofStr(md5(vs(0).anyLex.cast("binary")))
    case "SHA1"   => V.ofStr(sha1(vs(0).anyLex.cast("binary")))
    case "SHA224" => V.ofStr(sha2(vs(0).anyLex.cast("binary"), 224))
    case "SHA256" => V.ofStr(sha2(vs(0).anyLex.cast("binary"), 256))
    case "SHA384" => V.ofStr(sha2(vs(0).anyLex.cast("binary"), 384))
    case "SHA512" => V.ofStr(sha2(vs(0).anyLex.cast("binary"), 512))
    case "RAND" => V.ofNum(rand())
    case "UUID" => V.ofUri(concat(lit("urn:uuid:"), expr("uuid()")))
    case "STRUUID" => V.ofStr(expr("uuid()"))

    // control (`results.c:667-678, 907-918`)
    case "IF" =>
      val c = vs(0).ebv
      V(when(c, vs(1).rid).otherwise(when(!c, vs(2).rid)),
        when(c, vs(1).lex).otherwise(when(!c, vs(2).lex)),
        when(c, vs(1).dt).otherwise(when(!c, vs(2).dt)),
        when(c, vs(1).lang).otherwise(when(!c, vs(2).lang)))
    case "COALESCE" =>
      vs.reduceLeft { (a, b) =>
        V(coalesce(a.rid, b.rid), coalesce(a.lex, b.lex),
          when(a.rid.isNotNull || a.lex.isNotNull, a.dt).otherwise(b.dt),
          when(a.rid.isNotNull || a.lex.isNotNull, a.lang).otherwise(b.lang))
      }

    case c if c.startsWith("CAST:") => cast(c.drop(5), vs(0))
    case other =>
      throw new IllegalArgumentException(s"unsupported function: $other")
  }

  /** xsd constructor casts (`fn_cast`, `src/frontend/filter.c:1315-1355`) */
  /** integer date/time component off the lexical form (NULL = error) */
  private def dtPart(v: V, pattern: String): V =
    V.ofNum(when(v.ts.isNotNull,
      regexp_extract(v.anyLex, pattern, 1)).try_cast("int").cast("double"),
      lit(true))

  private def cast(dtUri: String, v: V): V = dtUri match {
    case Xsd.integer | Xsd.int | Xsd.long =>
      // from a string source the lexical must BE an integer (XPath
      // casting §17.1: xsd:integer("1.5") is an error, not a truncation);
      // numeric sources truncate toward zero, booleans map to 1/0
      V.ofNum(coalesce(v.num,
        when(v.bool, 1.0).when(!v.bool, 0.0),
        when(trim(v.anyLex).rlike("^[+-]?[0-9]+$"),
          v.anyLex.try_cast("double"))).cast("long").cast("double"),
        lit(true))
    case Xsd.double | Xsd.float | Xsd.decimal =>
      V.ofNum(coalesce(v.num, v.anyLex.try_cast("double")))
    case Xsd.boolean =>
      V.ofBool(coalesce(v.bool, v.num =!= 0.0,
        v.anyLex.try_cast("boolean")))
    case Xsd.string => V.ofStr(v.anyLex)
    case Xsd.dateTime => V.typed(v.anyLex, lit(dateTimeAttr))
    case Xsd.date => V.typed(v.anyLex, lit(dateAttr))
    case other =>
      throw new IllegalArgumentException(s"unsupported cast: $other")
  }

  /** datatype rid -> datatype URI lexical (well-known only) */
  private def dtLexOf(dt: Column): Column =
    WellKnown.xsdAttr.foldLeft(lit(null).cast("string")) {
      case (acc, (u, rid)) => when(dt === rid, lit(u)).otherwise(acc)
    }

}
