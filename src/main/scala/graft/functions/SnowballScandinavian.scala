package graft.functions

/** The Snowball danish / norwegian / swedish stemmers
  * (snowballstem.org), as vendored by the reference
  * (`src/libs/stemmer/src_c/stem_UTF_8_{danish,norwegian,swedish}.c`).
  * Implemented from the published algorithms; each verified
  * vector-for-vector against the reference's compiled stemmer in
  * FullTextGoldenSpec. All three share the min-3 R1 adjustment and a
  * longest-match main suffix step; they differ in suffix tables, the
  * consonant-pair list, and danish's igst/undouble extras.
  */
private[functions] abstract class NordicStemmer {
  protected def vowels: String
  protected final def isVowel(c: Char): Boolean = vowels.indexOf(c) >= 0

  protected final def r1of(w: String): Int = {
    var i = 0
    while (i < w.length && !isVowel(w.charAt(i))) i += 1
    while (i < w.length && isVowel(w.charAt(i))) i += 1
    val r = if (i < w.length) i + 1 else w.length
    math.max(r, math.min(3, w.length))
  }

  /** longest suffix of `w` from `sufs` lying in R1, if any */
  protected final def longestInR1(w: String, r1: Int,
                                  sufs: Seq[String]): Option[String] =
    sufs.filter(s => w.endsWith(s) && w.length - s.length >= r1)
      .sortBy(-_.length).headOption

  /** drop the final letter when the word ends with one of `pairs`
    * inside R1 (the shared consonant_pair step) */
  protected final def dropPairTail(w: String, r1: Int,
                                   pairs: Seq[String]): String =
    if (pairs.exists(p => w.endsWith(p) && w.length - p.length >= r1))
      w.dropRight(1)
    else w
}

object SnowballDanish extends NordicStemmer {
  protected val vowels = "aeiouyæøå"
  private val main = Seq("hed", "ethed", "ered", "e", "erede", "ende",
    "erende", "ene", "erne", "ere", "en", "heden", "eren", "er",
    "heder", "erer", "heds", "es", "endes", "erendes", "enes", "ernes",
    "eres", "ens", "hedens", "erens", "ers", "ets", "erets", "et",
    "eret")
  private val sEndings = "abcdfghjklmnoprtvyzå"
  private val pairs = Seq("gd", "dt", "gt", "kt")

  def stem(input: String): String = {
    var w = input
    val r1 = r1of(w)
    // step 1: main suffix, or s after a valid s-ending
    longestInR1(w, r1, main :+ "s") match {
      case Some("s") =>
        if (w.length >= 2 && sEndings.indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.dropRight(1)
      case Some(s) => w = w.dropRight(s.length)
      case None =>
    }
    // step 2: consonant pair
    w = dropPairTail(w, r1, pairs)
    // step 3: igst -> ig; then ig/lig/elig/els (re-run step 2) or løst
    if (w.endsWith("igst")) w = w.dropRight(2)
    longestInR1(w, r1, Seq("elig", "lig", "els", "ig", "løst")) match {
      case Some("løst") => w = w.dropRight(1)
      case Some(s) =>
        w = w.dropRight(s.length)
        w = dropPairTail(w, r1, pairs)
      case None =>
    }
    // step 4: undouble a final double consonant in R1
    if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
        !isVowel(w.charAt(w.length - 1)) && w.length - 1 >= r1)
      w = w.dropRight(1)
    w
  }
}

object SnowballNorwegian extends NordicStemmer {
  protected val vowels = "aeiouyæøå"
  private val main = Seq("a", "e", "ede", "ande", "ende", "ane", "ene",
    "hetene", "en", "heten", "ar", "er", "heter", "as", "es", "edes",
    "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
    "het", "ast")
  private val sEndings = "bcdfghjlmnoprtvyz"
  private val pairs = Seq("dt", "vt")
  private val other = Seq("hetslov", "slov", "elov", "elig", "eleg",
    "lov", "lig", "eig", "leg", "els", "ig")

  def stem(input: String): String = {
    var w = input
    val r1 = r1of(w)
    longestInR1(w, r1, main ++ Seq("s", "erte", "ert")) match {
      case Some("s") =>
        // s after a valid s-ending; k counts only after a non-vowel
        val ok = w.length >= 2 && {
          val c = w.charAt(w.length - 2)
          sEndings.indexOf(c) >= 0 ||
            (c == 'k' && w.length >= 3 && !isVowel(w.charAt(w.length - 3)))
        }
        if (ok) w = w.dropRight(1)
      case Some(s @ ("erte" | "ert")) => w = w.dropRight(s.length) + "er"
      case Some(s) => w = w.dropRight(s.length)
      case None =>
    }
    w = dropPairTail(w, r1, pairs)
    longestInR1(w, r1, other).foreach(s => w = w.dropRight(s.length))
    w
  }
}

object SnowballSwedish extends NordicStemmer {
  protected val vowels = "aeiouyäåö"
  private val main = Seq("a", "arna", "erna", "heterna", "orna", "ad",
    "e", "ade", "ande", "arne", "are", "aste", "en", "anden", "aren",
    "heten", "ern", "ar", "er", "heter", "or", "as", "arnas", "ernas",
    "ornas", "es", "ades", "andes", "ens", "arens", "hetens", "erns",
    "at", "andet", "het", "ast")
  private val sEndings = "bcdfghjklmnoprtvy"
  private val pairs = Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")

  def stem(input: String): String = {
    var w = input
    val r1 = r1of(w)
    longestInR1(w, r1, main :+ "s") match {
      case Some("s") =>
        if (w.length >= 2 && sEndings.indexOf(w.charAt(w.length - 2)) >= 0)
          w = w.dropRight(1)
      case Some(s) => w = w.dropRight(s.length)
      case None =>
    }
    w = dropPairTail(w, r1, pairs)
    longestInR1(w, r1, Seq("fullt", "löst", "lig", "els", "ig")) match {
      case Some("fullt") => w = w.dropRight(1)
      case Some("löst") => w = w.dropRight(1)
      case Some(s) => w = w.dropRight(s.length)
      case None =>
    }
    w
  }
}
