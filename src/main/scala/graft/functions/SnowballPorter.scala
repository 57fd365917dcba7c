package graft.functions

/** The classic Porter (1980) stemmer as distributed with Snowball and
  * vendored by the reference (`src/libs/stemmer/src_c/stem_UTF_8_porter.c`,
  * reachable via `lang="porter"` through libstemmer's alias table used at
  * `src/frontend/import.c:676`). Implemented from the published algorithm;
  * verified vector-for-vector against the reference's compiled stemmer in
  * FullTextGoldenSpec. Distinct from SnowballEnglish (Porter2): this is the
  * original five-step algorithm with the y/Y consonant marking prelude.
  */
object SnowballPorter {
  private val vowels = "aeiouy" // marked 'Y' is a consonant
  private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0
  // the "short vowel" test excludes w, x and marked Y as the final consonant
  private def nonVWXY(c: Char): Boolean =
    !isV(c) && c != 'w' && c != 'x' && c != 'Y'

  /** cvc at the right edge of `s` (reading back: non-v_WXY, v, non-v) */
  private def shortv(s: String): Boolean = {
    val n = s.length
    n >= 3 && nonVWXY(s.charAt(n - 1)) && isV(s.charAt(n - 2)) &&
      !isV(s.charAt(n - 3))
  }

  def stem(input: String): String = {
    if (input.isEmpty) return input
    // prelude: initial y, and any y following a vowel, becomes consonant Y
    var yFound = false
    val sb = new java.lang.StringBuilder(input)
    if (sb.charAt(0) == 'y') { sb.setCharAt(0, 'Y'); yFound = true }
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) {
        sb.setCharAt(i, 'Y'); yFound = true
      }
      i += 1
    }
    var w = sb.toString

    // p1/p2: after the first vowel–non-vowel pair, and the second
    var p = 0
    def gopast(pred: Char => Boolean): Boolean = {
      while (p < w.length && !pred(w.charAt(p))) p += 1
      if (p < w.length) { p += 1; true } else false
    }
    val p1 = if (gopast(isV) && gopast(c => !isV(c))) p else w.length
    val p2 =
      if (p1 < w.length && gopast(isV) && gopast(c => !isV(c))) p
      else w.length

    def r1(suffixLen: Int): Boolean = w.length - suffixLen >= p1
    def r2(suffixLen: Int): Boolean = w.length - suffixLen >= p2
    def hasVowelBefore(suffixLen: Int): Boolean =
      w.view.take(w.length - suffixLen).exists(isV)

    // step 1a: plurals
    if (w.endsWith("s")) {
      if (w.endsWith("sses")) w = w.dropRight(2)
      else if (w.endsWith("ies")) w = w.dropRight(2)
      else if (!w.endsWith("ss")) w = w.dropRight(1)
    }

    // step 1b: -eed with R1 -> -ee; -ed/-ing after a vowel -> drop, fix tail
    if (w.endsWith("eed")) {
      if (r1(3)) w = w.dropRight(1)
    } else {
      val suf =
        if (w.endsWith("ed")) 2 else if (w.endsWith("ing")) 3 else 0
      if (suf > 0 && hasVowelBefore(suf)) {
        w = w.dropRight(suf)
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz"))
          w += "e"
        else if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
                 "bdfgmnprt".indexOf(w.charAt(w.length - 1)) >= 0)
          w = w.dropRight(1)
        else if (w.length == p1 && shortv(w))
          w += "e"
      }
    }

    // step 1c: y -> i when a vowel precedes
    if ((w.endsWith("y") || w.endsWith("Y")) && hasVowelBefore(1))
      w = w.dropRight(1) + "i"

    // step 2 (R1): longest match wins; no fallback when R1 fails
    locally {
      val table = Seq(
        "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
        "fulness" -> "ful", "ousness" -> "ous", "biliti" -> "ble",
        "tional" -> "tion", "ousli" -> "ous", "entli" -> "ent",
        "alism" -> "al", "aliti" -> "al", "iviti" -> "ive",
        "ation" -> "ate", "enci" -> "ence", "anci" -> "ance",
        "abli" -> "able", "alli" -> "al", "izer" -> "ize",
        "ator" -> "ate", "eli" -> "e")
      table.filter(e => w.endsWith(e._1)).sortBy(-_._1.length).headOption
        .foreach { case (s, rep) =>
          if (r1(s.length)) w = w.dropRight(s.length) + rep
        }
    }

    // step 3 (R1)
    locally {
      val table = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
        "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
      table.filter(e => w.endsWith(e._1)).sortBy(-_._1.length).headOption
        .foreach { case (s, rep) =>
          if (r1(s.length)) w = w.dropRight(s.length) + rep
        }
    }

    // step 4 (R2): delete; -ion only after s/t
    locally {
      val sufs = Seq("ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
        "al", "er", "ic", "ou")
      sufs.filter(w.endsWith).sortBy(-_.length).headOption.foreach { s =>
        if (r2(s.length)) {
          if (s == "ion") {
            val before = w.length - 4
            if (before >= 0 &&
                (w.charAt(before) == 's' || w.charAt(before) == 't'))
              w = w.dropRight(3)
          } else w = w.dropRight(s.length)
        }
      }
    }

    // step 5a: final e
    if (w.endsWith("e")) {
      if (r2(1)) w = w.dropRight(1)
      else if (r1(1) && !shortv(w.dropRight(1))) w = w.dropRight(1)
    }
    // step 5b: -ll with R2 -> -l
    if (w.endsWith("ll") && w.length - 1 >= p2) w = w.dropRight(1)

    if (yFound) w = w.replace('Y', 'y')
    w
  }
}
