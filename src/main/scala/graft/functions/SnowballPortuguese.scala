package graft.functions

/** The Snowball "portuguese" stemmer (snowballstem.org), as vendored by
  * the reference (`src/libs/stemmer/src_c/stem_UTF_8_portuguese.c`) —
  * selected for `@pt` literals by the full-text import. Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec. The vendored
  * snapshot predates the `ução` suffix rule, so none here either.
  */
object SnowballPortuguese {
  // internal form: ã -> a~, õ -> o~ (the ~ is a plain char, not a vowel)
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'á' | 'é' | 'í' | 'ó' | 'ú' |
         'â' | 'ê' | 'ô' => true
    case _ => false
  }

  private val verbs = Seq(
    // longest-ish first; sorted again by length at use
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "aveis", "íamos", "armos", "ermos", "irmos", "aria", "eria",
    "iria", "asse", "esse", "isse", "aste", "este", "iste", "arei",
    "erei", "irei", "aram", "eram", "iram", "avam", "arem", "erem",
    "irem", "ando", "endo", "indo", "adas", "idas", "arás", "aras",
    "erás", "eras", "irás", "avas", "ares", "eres", "ires", "íeis",
    "ados", "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
    "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam", "ado",
    "ido", "ias", "ais", "eis", "ira", "ia", "ei", "am", "em", "ar",
    "er", "ir", "as", "es", "is", "eu", "iu", "ou")

  def stem(input: String): String = {
    if (input.isEmpty) return input
    var w = input.replace("ã", "a~").replace("õ", "o~")

    def rvOf(s: String): Int = {
      val n = s.length
      if (n < 3) n
      else if (!isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(s.charAt(i))) i += 1
        math.min(i + 1, n)
      } else if (isVowel(s.charAt(0)) && isVowel(s.charAt(1))) {
        var i = 2
        while (i < n && isVowel(s.charAt(i))) i += 1
        math.min(i + 1, n)
      } else 3
    }
    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s.charAt(i))) i += 1
      while (i < s.length && isVowel(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val rv = rvOf(w)
    val r1 = regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)
    def inRV(sufLen: Int): Boolean = w.length - sufLen >= rv
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2

    // standard suffix (longest match; failed region test fails the step)
    var altered = false
    var matchedStd = false
    locally {
      case class E(suf: String, act: () => Boolean)
      val entries: Seq[E] =
        Seq("amentos", "imentos", "amento", "imento", "ância", "antes",
          "ezas", "icos", "icas", "ismos", "istas", "osos", "osas",
          "ante", "eza", "ico", "ica", "ismo", "ável", "ível", "ista",
          "oso", "osa").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length); true }
          else false)) ++
        // plain R2 delete — the vendored snapshot has no ic-undouble
        // after the ador/ação family (golden: comunicação -> comunic)
        Seq("adoras", "adores", "aço~es", "adora", "aça~o", "ador")
          .map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length); true }
          else false)) ++
        Seq("logias", "logia").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length) + "log"; true }
          else false)) ++
        Seq("ências", "ência").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length) + "ente"; true }
          else false)) ++
        Seq(E("amente", () =>
          if (inR1(6)) {
            w = w.dropRight(6)
            if (w.endsWith("iv") && inR2(2)) {
              w = w.dropRight(2)
              if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
            } else Seq("os", "ic", "ad").find(t =>
              w.endsWith(t) && inR2(t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq(E("mente", () =>
          if (inR2(5)) {
            w = w.dropRight(5)
            Seq("ante", "avel", "ível").find(t =>
              w.endsWith(t) && inR2(t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq("idades", "idade").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length)
            Seq("abil", "ic", "iv").find(t =>
              w.endsWith(t) && inR2(t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq("ivas", "ivos", "iva", "ivo").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
            true
          } else false)) ++
        // the vendored snapshot rewrites eira/eiras unconditionally
        // (no region test — golden-verified on sub-RV positions)
        Seq("eiras", "eira").map(s => E(s, () => {
          w = w.dropRight(s.length) + "eir"; true
        }))
      entries.filter(e => w.endsWith(e.suf))
        .sortBy(-_.suf.length).headOption.foreach { e =>
          matchedStd = true
          altered = e.act()
        }
    }

    // verb suffix in RV, only if the standard step changed nothing
    if (!altered) {
      verbs.filter(s => w.endsWith(s) && inRV(s.length))
        .sortBy(-_.length).headOption.foreach { s =>
          w = w.dropRight(s.length)
          altered = true
        }
    }

    if (altered) {
      // delete final i preceded by c, in RV
      if (w.endsWith("ci") && inRV(1)) w = w.dropRight(1)
    } else {
      // residual suffix
      Seq("os", "a", "i", "o", "á", "í", "ó")
        .find(s => w.endsWith(s) && inRV(s.length))
        .foreach(s => w = w.dropRight(s.length))
    }

    // residual form: final e/é/ê in RV, then gu/ci undouble; ç -> c
    if (Seq("e", "é", "ê").exists(s => w.endsWith(s) && inRV(1))) {
      w = w.dropRight(1)
      if ((w.endsWith("gu") || w.endsWith("ci")) && w.length - 1 >= rv)
        w = w.dropRight(1)
    } else if (w.endsWith("ç")) w = w.dropRight(1) + "c"

    w.replace("a~", "ã").replace("o~", "õ")
  }
}
