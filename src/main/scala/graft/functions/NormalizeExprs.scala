package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization for the text-normalization pass of a
  * training-data pipeline (crawled corpora mix composed and decomposed
  * forms of the same grapheme — e.g. U+00E9 vs e+U+0301 — which breaks
  * exact dedup, token counting and shingle hashing unless canonicalized
  * first).
  *
  * Implemented as a native expression rather than a UDF so it stays inside
  * whole-stage codegen (doGenCode emits a static call); `java.text
  * .Normalizer` implements the same Unicode canonical-composition
  * algorithm as DuckDB's `nfc_normalize`, so SQL oracles can replicate the
  * pass exactly. The common all-ASCII row is detected with
  * `Normalizer.isNormalized` (a cheap scan) and returned as-is — no
  * string copy on the hot path.
  */
object TextNorm {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(text)`: Unicode canonical composition (NFC). */
final case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
