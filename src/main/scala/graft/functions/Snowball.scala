package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Language registry for the Snowball stemmers — the analog of the
  * reference's `sb_stemmer_new(lang, NULL)` lookup (libstemmer
  * `modules.h`): a language with no registered stemmer yields NULL and
  * the caller emits nothing for it (`import.c:676-678`). */
object Snowball {
  /** libstemmer's name/ISO-639 alias table (`libstemmer/modules_utf8.txt`)
    * normalized to the canonical two-letter key used for dispatch */
  private val aliases: Map[String, String] = {
    val table = Seq(
      "da" -> Seq("danish", "dan"), "nl" -> Seq("dutch", "dut", "nld"),
      "en" -> Seq("english", "eng"), "fi" -> Seq("finnish", "fin"),
      "fr" -> Seq("french", "fre", "fra"),
      "de" -> Seq("german", "ger", "deu"),
      "hu" -> Seq("hungarian", "hun"), "it" -> Seq("italian", "ita"),
      "no" -> Seq("norwegian", "nor"),
      "pt" -> Seq("portuguese", "por"),
      "ro" -> Seq("romanian", "rum", "ron"),
      "ru" -> Seq("russian", "rus"),
      "es" -> Seq("spanish", "esl", "spa"), "sv" -> Seq("swedish", "swe"),
      "porter" -> Seq())
    table.flatMap { case (k, as) => (k +: as).map(_ -> k) }.toMap
  }

  val languages: Set[String] = aliases.keySet

  /** null when the language has no registered stemmer */
  def stem(tok: UTF8String, lang: UTF8String): UTF8String = {
    if (tok == null || lang == null) return null
    val fn: String => String = aliases.get(lang.toString).orNull match {
      case "en" => SnowballEnglish.stem
      case "de" => SnowballGerman.stem
      case "ru" => SnowballRussian.stem
      case "it" => SnowballItalian.stem
      case "es" => SnowballSpanish.stem
      case "pt" => SnowballPortuguese.stem
      case "fr" => SnowballFrench.stem
      case "da" => SnowballDanish.stem
      case "no" => SnowballNorwegian.stem
      case "sv" => SnowballSwedish.stem
      case "nl" => SnowballDutch.stem
      case "fi" => SnowballFinnish.stem
      case "hu" => SnowballHungarian.stem
      case "ro" => SnowballRomanian.stem
      case "porter" => SnowballPorter.stem
      case _ => return null
    }
    UTF8String.fromString(fn(tok.toString))
  }
}

/** `snowball_stem(token, lang)`: Snowball stem of an already-lowercased
  * token in the given (normalized) language; NULL when the language has
  * no registered stemmer. */
final case class SnowballStem(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
        right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string arguments")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "snowball_stem"
  override protected def nullSafeEval(tok: Any, lang: Any): Any =
    Snowball.stem(tok.asInstanceOf[UTF8String],
      lang.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, l) => s"""
      ${ev.value} = graft.functions.Snowball.stem($t, $l);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SnowballStem =
    copy(left = newLeft, right = newRight)
}
