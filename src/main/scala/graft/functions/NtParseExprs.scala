package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native N-Triples/N-Quads line parse for the bulk-ingest hot loop.
  *
  * The previous shape — a typed `Dataset.flatMap` over
  * [[graft.rdf.NTriples.parseLine]] — split every ingest plan into
  * DeserializeToObject → MapPartitions → SerializeFromObject: a
  * whole-stage-codegen break plus a product-encoder round trip per
  * statement, between the text scan and the RID hashing on EVERY
  * import path (CLI bulk load, GSP PUT/POST, streaming ingest). As a
  * codegen'd expression the scan → parse → project chain fuses into
  * one generated stage.
  *
  * Honesty note (measured): throughput is NEUTRAL at 1.8M and 18M
  * statements — the stage is bound by the parser's String/Term work,
  * not the encoder boundary this removes. Kept for the fused plan,
  * the shared column-expression scope/graph handling with the GSP
  * path, and the deleted duplicate flatMap in fromNTriples; the claim
  * is plan hygiene, not speed.
  *
  * Parse semantics are [[graft.rdf.NTriples.parseLine]]'s, by calling
  * it — the kernel only replaces the row-construction plumbing, not
  * the parser. NULL out = comment / blank / dirty line (dropped, as
  * the reference importer drops unparseable statements). */
object NtParse {
  val schema: StructType = StructType(Seq(
    StructField("gLex", StringType, nullable = false),
    StructField("sKind", IntegerType, nullable = false),
    StructField("sLex", StringType, nullable = false),
    StructField("pLex", StringType, nullable = false),
    StructField("oKind", IntegerType, nullable = false),
    StructField("oLex", StringType, nullable = false),
    StructField("oDt", StringType, nullable = false),
    StructField("oLang", StringType, nullable = false)))

  import graft.rdf.{BNode, Lit, NTriples, Uri}

  def parseNtQuad(line: UTF8String): InternalRow =
    NTriples.parseLine(line.toString) match {
      case None => null
      case Some((s, p, o, g)) =>
        val (sk, sl) = s match {
          case Uri(v) => (1, v); case BNode(b) => (2, b); case _ => (0, "")
        }
        val pl = p match { case Uri(v) => v; case _ => "" }
        val (ok, ol, od, og) = o match {
          case Uri(v) => (1, v, "", "")
          case BNode(b) => (2, b, "", "")
          case Lit(lex, dt, lang) => (0, lex, dt, lang)
        }
        val gl = g match { case Some(Uri(v)) => v; case _ => "" }
        new GenericInternalRow(Array[Any](
          UTF8String.fromString(gl), sk, UTF8String.fromString(sl),
          UTF8String.fromString(pl), ok, UTF8String.fromString(ol),
          UTF8String.fromString(od), UTF8String.fromString(og)))
    }
}

/** `parse_nt_quad(line)`: nullable struct of the flat import row —
  * see [[NtParse]]. */
final case class ParseNtQuad(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = NtParse.schema
  override def nullable: Boolean = true
  override def prettyName: String = "parse_nt_quad"
  override protected def nullSafeEval(input: Any): Any =
    NtParse.parseNtQuad(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NtParse.parseNtQuad($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildInternal(
      newChild: Expression): ParseNtQuad = copy(child = newChild)
}
