package graft.functions

/** The Snowball "german" stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_german.c`) — selected
  * for `@de` literals by the full-text import. Implemented from the
  * published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec (the vendored
  * snapshot predates the `niss` rule, so none here either).
  */
object SnowballGerman {
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' | 'ä' | 'ö' | 'ü' => true
    case _ => false
  }

  def stem(input: String): String = {
    if (input.isEmpty) return input
    // ß -> ss; mark u,y between vowels as consonants (U, Y)
    var w = input.replace("ß", "ss")
    val cs = w.toCharArray
    var i = 1
    while (i < cs.length - 1) {
      if (cs(i) == 'u' && isVowel(cs(i - 1)) && isVowel(cs(i + 1)))
        cs(i) = 'U'
      else if (cs(i) == 'y' && isVowel(cs(i - 1)) && isVowel(cs(i + 1)))
        cs(i) = 'Y'
      i += 1
    }
    w = new String(cs)

    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s.charAt(i))) i += 1
      while (i < s.length && isVowel(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1raw = regionAfterVC(w, 0)
    // R1 is adjusted so that the region before it has at least 3 letters
    val r1 = math.max(r1raw, math.min(3, w.length))
    val r2 = regionAfterVC(w, r1raw)
    def inR1(s: String, sufLen: Int): Boolean = s.length - sufLen >= r1
    def inR2(s: String, sufLen: Int): Boolean = s.length - sufLen >= r2

    val sEndings = "bdfghklmnrt"
    val stEndings = "bdfghklmnt"

    // step 1 (longest of e, em, en, ern, er, es, s in R1)
    if (w.endsWith("ern")) { if (inR1(w, 3)) w = w.dropRight(3) }
    else if (w.endsWith("em")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("er")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("en")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("es")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("e")) { if (inR1(w, 1)) w = w.dropRight(1) }
    else if (w.endsWith("s")) {
      if (inR1(w, 1) && w.length >= 2 &&
          sEndings.indexOf(w.charAt(w.length - 2)) >= 0)
        w = w.dropRight(1)
    }

    // step 2 (longest of en, er, est, st in R1)
    if (w.endsWith("est")) { if (inR1(w, 3)) w = w.dropRight(3) }
    else if (w.endsWith("en")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("er")) { if (inR1(w, 2)) w = w.dropRight(2) }
    else if (w.endsWith("st")) {
      // st only after a valid st-ending itself preceded by >= 3 letters
      if (inR1(w, 2) && w.length >= 6 &&
          stEndings.indexOf(w.charAt(w.length - 3)) >= 0)
        w = w.dropRight(2)
    }

    // step 3: d-suffixes
    if (w.endsWith("end") || w.endsWith("ung")) {
      if (inR2(w, 3)) {
        w = w.dropRight(3)
        if (w.endsWith("ig") && inR2(w, 2) && w.length >= 3 &&
            w.charAt(w.length - 3) != 'e')
          w = w.dropRight(2)
      }
    } else if (w.endsWith("isch")) {
      if (inR2(w, 4) && w.length >= 5 && w.charAt(w.length - 5) != 'e')
        w = w.dropRight(4)
    } else if (w.endsWith("ig") || w.endsWith("ik")) {
      if (inR2(w, 2) && w.length >= 3 && w.charAt(w.length - 3) != 'e')
        w = w.dropRight(2)
    } else if (w.endsWith("lich") || w.endsWith("heit")) {
      if (inR2(w, 4)) {
        w = w.dropRight(4)
        if ((w.endsWith("er") || w.endsWith("en")) && inR1(w, 2))
          w = w.dropRight(2)
      }
    } else if (w.endsWith("keit")) {
      if (inR2(w, 4)) {
        w = w.dropRight(4)
        if (w.endsWith("lich") && inR2(w, 4)) w = w.dropRight(4)
        else if (w.endsWith("ig") && inR2(w, 2)) w = w.dropRight(2)
      }
    }

    // unmark + fold umlauts
    val out = new java.lang.StringBuilder(w.length)
    var j = 0
    while (j < w.length) {
      out.append(w.charAt(j) match {
        case 'U' => 'u'
        case 'Y' => 'y'
        case 'ä' => 'a'
        case 'ö' => 'o'
        case 'ü' => 'u'
        case c => c
      })
      j += 1
    }
    out.toString
  }
}
