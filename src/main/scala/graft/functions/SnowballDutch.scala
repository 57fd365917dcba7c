package graft.functions

/** The Snowball "dutch" stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_dutch.c`) — selected
  * for `@nl` literals by the full-text import. Implemented from the
  * published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  */
object SnowballDutch {
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' | 'è' => true
    case _ => false
  }

  def stem(input: String): String = {
    if (input.isEmpty) return input
    // fold umlauts/acutes, then mark initial y, i-between-vowels and
    // y-after-vowel (vowel-anchored scan, marks visible to later tests)
    var w = input.map {
      case 'ä' | 'á' => 'a'; case 'ë' | 'é' => 'e'
      case 'ï' | 'í' => 'i'; case 'ö' | 'ó' => 'o'
      case 'ü' | 'ú' => 'u'; case c => c
    }
    val cs = w.toCharArray
    if (cs.length > 0 && cs(0) == 'y') cs(0) = 'Y'
    var p = 0
    while (p < cs.length - 1) {
      val c2 = cs(p + 1)
      val anchored = isVowel(cs(p)) && {
        if (c2 == 'i' && p + 2 < cs.length && isVowel(cs(p + 2))) {
          cs(p + 1) = 'I'; true
        } else if (c2 == 'y') { cs(p + 1) = 'Y'; true }
        else false
      }
      if (anchored) p += 2 else p += 1
    }
    w = new String(cs)

    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s.charAt(i))) i += 1
      while (i < s.length && isVowel(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1raw = regionAfterVC(w, 0)
    val r1 = math.max(r1raw, math.min(3, w.length))
    val r2 = regionAfterVC(w, r1raw)
    def inR1(s: String, n: Int): Boolean = s.length - n >= r1
    def inR2(s: String, n: Int): Boolean = s.length - n >= r2

    def undouble(s: String): String =
      if (s.endsWith("kk") || s.endsWith("dd") || s.endsWith("tt"))
        s.dropRight(1)
      else s
    def validEnEnding(s: String, sufLen: Int): Boolean = {
      val p = s.length - sufLen - 1
      p >= 0 && !isVowel(s.charAt(p)) &&
        !(s.length - sufLen >= 3 &&
          s.substring(s.length - sufLen - 3, s.length - sufLen) == "gem")
    }
    def validSEnding(s: String, sufLen: Int): Boolean = {
      val p = s.length - sufLen - 1
      p >= 0 && !isVowel(s.charAt(p)) && s.charAt(p) != 'j'
    }

    // step 1 (longest of heden / ene / en / se / s)
    if (w.endsWith("heden")) {
      if (inR1(w, 5)) w = w.dropRight(5) + "heid"
    } else if (w.endsWith("ene")) {
      if (inR1(w, 3) && validEnEnding(w, 3)) w = undouble(w.dropRight(3))
    } else if (w.endsWith("en")) {
      if (inR1(w, 2) && validEnEnding(w, 2)) w = undouble(w.dropRight(2))
    } else if (w.endsWith("se")) {
      if (inR1(w, 2) && validSEnding(w, 2)) w = w.dropRight(2)
    } else if (w.endsWith("s")) {
      if (inR1(w, 1) && validSEnding(w, 1)) w = w.dropRight(1)
    }

    // step 2: final e in R1 after a non-vowel
    var eRemoved = false
    def step2(): Unit =
      if (w.endsWith("e") && inR1(w, 1) && w.length >= 2 &&
          !isVowel(w.charAt(w.length - 2))) {
        w = undouble(w.dropRight(1))
        eRemoved = true
      }
    step2()

    // step 3a: heid (not after c), then en again
    if (w.endsWith("heid") && inR2(w, 4) && w.length >= 5 &&
        w.charAt(w.length - 5) != 'c') {
      w = w.dropRight(4)
      // "a preceding en" re-applies only the en rule, not ene
      if (w.endsWith("en") && inR1(w, 2) && validEnEnding(w, 2))
        w = undouble(w.dropRight(2))
    }

    // step 3b: d-suffixes (longest of end/ing/lijk/baar/bar/ig)
    if (w.endsWith("end") || w.endsWith("ing")) {
      if (inR2(w, 3)) {
        w = w.dropRight(3)
        if (w.endsWith("ig") && inR2(w, 2) && w.length >= 3 &&
            w.charAt(w.length - 3) != 'e') w = w.dropRight(2)
        else w = undouble(w)
      }
    } else if (w.endsWith("lijk")) {
      if (inR2(w, 4)) { w = w.dropRight(4); step2() }
    } else if (w.endsWith("baar")) {
      if (inR2(w, 4)) w = w.dropRight(4)
    } else if (w.endsWith("bar")) {
      if (inR2(w, 3) && eRemoved) w = w.dropRight(3)
    } else if (w.endsWith("ig")) {
      if (inR2(w, 2) && w.length >= 3 && w.charAt(w.length - 3) != 'e')
        w = w.dropRight(2)
    }

    // step 4: undouble vowel in C-VV-C (final consonant not I)
    if (w.length >= 4) {
      val n = w.length
      val d = w.charAt(n - 1)
      val v1 = w.charAt(n - 2); val v2 = w.charAt(n - 3)
      val c0 = w.charAt(n - 4)
      if (!isVowel(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 &&
          !isVowel(c0))
        w = w.substring(0, n - 2) + d
    }

    w.map { case 'Y' => 'y'; case 'I' => 'i'; case c => c }
  }
}
