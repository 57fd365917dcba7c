package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Snowball "english" stemmer (Porter2, snowballstem.org) — the
  * algorithm behind the reference's `fs:stem` full-text quads: the
  * importer calls `sb_stemmer_new(lang, NULL)` (UTF-8) and stems every
  * lowercased token (`src/frontend/import.c:668-700`). Implemented from
  * the published algorithm definition; behavior is verified
  * golden-vector-for-vector against the reference's compiled stemmer
  * over a 12k-word corpus in FullTextGoldenSpec.
  *
  * Input contract matches the importer: callers pass already-lowercased
  * tokens. Words of length <= 2 and non-ASCII letters pass through
  * unchanged (non-ASCII codepoints are consonants to the algorithm).
  */
object SnowballEnglish {
  private val exceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val exceptions2 = Set(
    "inning", "outing", "canning", "herring", "earring", "proceed",
    "exceed", "succeed")

  private def isVowelCh(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
    case _ => false
  }

  def stem(input: String): String = {
    if (input.length <= 2) return input
    var word = input
    // initial apostrophe is dropped
    if (word.charAt(0) == '\'') word = word.substring(1)
    exceptions1.get(word) match {
      case Some(r) => return r
      case None =>
    }
    if (word.length <= 2) return word

    // mark consonant-y as 'Y': initial y, or y after a vowel
    val chars = word.toCharArray
    var i = 0
    while (i < chars.length) {
      if (chars(i) == 'y' && (i == 0 || isVowelCh(chars(i - 1))))
        chars(i) = 'Y'
      i += 1
    }
    var w = new String(chars)

    def isVowel(s: String, pos: Int): Boolean =
      pos >= 0 && pos < s.length && (s.charAt(pos) match {
        case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' => true
        case _ => false
      })

    // R1: after the first vowel-consonant pair (special prefixes fixed)
    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s, i)) i += 1
      while (i < s.length && isVowel(s, i)) i += 1
      if (i < s.length) i + 1 else s.length
    }
    def r1of(s: String): Int =
      if (s.startsWith("gener") || s.startsWith("arsen")) 5
      else if (s.startsWith("commun")) 6
      else regionAfterVC(s, 0)
    def r2of(s: String): Int = regionAfterVC(s, r1of(s))

    // a short syllable: vowel + non-vowel(not w/x/Y) preceded by a
    // non-vowel; or word-initial vowel + non-vowel
    def endsShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n >= 3) {
        val c = s.charAt(n - 1)
        if (!isVowel(s, n - 1) && c != 'w' && c != 'x' && c != 'Y' &&
            isVowel(s, n - 2) && !isVowel(s, n - 3)) return true
      }
      if (n == 2 && isVowel(s, 0) && !isVowel(s, 1)) return true
      false
    }
    def isShortWord(s: String): Boolean =
      endsShortSyllable(s) && r1of(s) >= s.length

    // step 0: -' -'s -'s'
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel not immediately
      // before the s
      var hasV = false
      var j = 0
      while (j < w.length - 2) { if (isVowel(w, j)) hasV = true; j += 1 }
      if (hasV) w = w.dropRight(1)
    }

    if (exceptions2.contains(w)) return w.replace('Y', 'y')

    // step 1b
    val r1 = r1of(w)
    def inR1(s: String, suffixLen: Int): Boolean = s.length - suffixLen >= r1of(s)
    def inR2(s: String, suffixLen: Int): Boolean = s.length - suffixLen >= r2of(s)
    if (w.endsWith("eedly")) { if (inR1(w, 5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(w, 3)) w = w.dropRight(1) }
    else {
      val suf =
        if (w.endsWith("ingly")) 5
        else if (w.endsWith("edly")) 4
        else if (w.endsWith("ing")) 3
        else if (w.endsWith("ed")) 2
        else 0
      if (suf > 0) {
        val stemPart = w.dropRight(suf)
        var hasV = false
        var j = 0
        while (j < stemPart.length) { if (isVowel(stemPart, j)) hasV = true; j += 1 }
        if (hasV) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
              "bdfgmnprt".indexOf(w.charAt(w.length - 1)) >= 0) w = w.dropRight(1)
          else if (isShortWord(w)) w += "e"
        }
      }
    }

    // step 1c: y -> i after a consonant that is not word-initial
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowel(w, w.length - 2))
      w = w.dropRight(1) + "i"

    // step 2 (longest suffix, in R1)
    locally {
      val n = w.length
      def repl(suffix: String, by: String): Boolean =
        if (w.endsWith(suffix) && inR1(w, suffix.length)) {
          w = w.dropRight(suffix.length) + by; true
        } else w.endsWith(suffix)
      // ordered by suffix so longest candidate matches first
      if (w.endsWith("ational")) repl("ational", "ate")
      else if (w.endsWith("fulness")) repl("fulness", "ful")
      else if (w.endsWith("iveness")) repl("iveness", "ive")
      else if (w.endsWith("ization")) repl("ization", "ize")
      else if (w.endsWith("ousness")) repl("ousness", "ous")
      else if (w.endsWith("biliti")) repl("biliti", "ble")
      else if (w.endsWith("lessli")) repl("lessli", "less")
      else if (w.endsWith("tional")) repl("tional", "tion")
      else if (w.endsWith("alism")) repl("alism", "al")
      else if (w.endsWith("aliti")) repl("aliti", "al")
      else if (w.endsWith("ation")) repl("ation", "ate")
      else if (w.endsWith("entli")) repl("entli", "ent")
      else if (w.endsWith("fulli")) repl("fulli", "ful")
      else if (w.endsWith("iviti")) repl("iviti", "ive")
      else if (w.endsWith("ousli")) repl("ousli", "ous")
      else if (w.endsWith("abli")) repl("abli", "able")
      else if (w.endsWith("alli")) repl("alli", "al")
      else if (w.endsWith("anci")) repl("anci", "ance")
      else if (w.endsWith("ator")) repl("ator", "ate")
      else if (w.endsWith("enci")) repl("enci", "ence")
      else if (w.endsWith("izer")) repl("izer", "ize")
      else if (w.endsWith("bli")) repl("bli", "ble")
      else if (w.endsWith("ogi")) {
        if (n >= 4 && w.charAt(n - 4) == 'l' && inR1(w, 3)) w = w.dropRight(1)
      } else if (w.endsWith("li")) {
        if (n >= 3 && "cdeghkmnrt".indexOf(w.charAt(n - 3)) >= 0 && inR1(w, 2))
          w = w.dropRight(2)
      }
    }

    // step 3 (longest suffix, in R1; ative needs R2)
    locally {
      def repl(suffix: String, by: String): Unit =
        if (inR1(w, suffix.length)) w = w.dropRight(suffix.length) + by
      if (w.endsWith("ational")) repl("ational", "ate")
      else if (w.endsWith("tional")) repl("tional", "tion")
      else if (w.endsWith("alize")) repl("alize", "al")
      else if (w.endsWith("icate")) repl("icate", "ic")
      else if (w.endsWith("iciti")) repl("iciti", "ic")
      else if (w.endsWith("ative")) {
        if (inR2(w, 5)) w = w.dropRight(5)
      } else if (w.endsWith("ical")) repl("ical", "ic")
      else if (w.endsWith("ness")) repl("ness", "")
      else if (w.endsWith("ful")) repl("ful", "")
    }

    // step 4 (longest suffix, in R2)
    locally {
      val sufs = Seq("ement", "ance", "ence", "able", "ible", "ment", "ant",
        "ent", "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic")
      sufs.find(w.endsWith) match {
        case Some(s) => if (inR2(w, s.length)) w = w.dropRight(s.length)
        case None =>
          if (w.endsWith("ion") && inR2(w, 3) && w.length >= 4 &&
              (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
            w = w.dropRight(3)
      }
    }

    // step 5
    if (w.endsWith("e") &&
        (inR2(w, 1) || (inR1(w, 1) && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && inR2(w, 1) && w.length >= 2 &&
        w.charAt(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  def stemU(input: UTF8String): UTF8String =
    UTF8String.fromString(stem(input.toString))
}

/** `snowball_en(token)`: Snowball English (Porter2) stem of an
  * already-lowercased token. */
final case class SnowballStemEn(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "snowball_en"
  override protected def nullSafeEval(input: Any): Any =
    SnowballEnglish.stemU(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SnowballEnglish.stemU($c)")
  override protected def withNewChildInternal(newChild: Expression): SnowballStemEn =
    copy(child = newChild)
}
