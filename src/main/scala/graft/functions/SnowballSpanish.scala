package graft.functions

/** The Snowball "spanish" stemmer (snowballstem.org), as vendored by
  * the reference (`src/libs/stemmer/src_c/stem_UTF_8_spanish.c`) —
  * selected for `@es` literals by the full-text import. Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  */
object SnowballSpanish {
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'á' | 'é' | 'í' | 'ó' | 'ú' |
         'ü' => true
    case _ => false
  }

  private val pronouns = Seq("selas", "selos", "sela", "selo", "las",
    "les", "los", "nos", "me", "se", "la", "le", "lo")

  // accented gerund/infinitive endings and their plain forms
  private val accented = Seq("iéndo" -> "iendo", "ándo" -> "ando",
    "ár" -> "ar", "ér" -> "er", "ír" -> "ir")

  private val verbPlain = Seq("aríamos", "eríamos", "iríamos",
    "iéramos", "iésemos", "aríais", "eríais", "iríais", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "aremos", "eremos",
    "iremos", "aría", "arás", "arán", "ería", "erás", "erán", "iría",
    "irás", "irán", "aban", "aran", "asen", "aron", "ando", "abas",
    "adas", "idas", "aras", "ases", "íais", "ados", "idos", "amos",
    "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba", "ada",
    "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis", "ía",
    "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as", "ís",
    "aste", "iste", "iera", "iese")
  private val verbGu = Seq("emos", "éis", "en", "es")

  def stem(input: String): String = {
    if (input.isEmpty) return input
    var w = input

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
    // regions are positions in the ORIGINAL word; suffix removal only
    // shortens the tail, so the indexes stay valid
    val rv = rvOf(w)
    val r1 = regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)
    def inRV(sufLen: Int): Boolean = w.length - sufLen >= rv
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2

    // step 0: attached pronoun after a gerund/infinitive base; the base
    // ending check (and yendo's preceding u) lies within RV
    pronouns.find(p => w.endsWith(p) && inRV(p.length)) match {
      case Some(p) =>
        val base = w.dropRight(p.length)
        def endsInRV(t: String) =
          base.endsWith(t) && base.length - t.length >= rv
        accented.find { case (acc, _) => endsInRV(acc) } match {
          case Some((acc, plain)) =>
            w = base.dropRight(acc.length) + plain
          case None =>
            if (Seq("ando", "iendo", "ar", "er", "ir").exists(endsInRV))
              w = base
            else if (endsInRV("yendo") && base.length >= 6 &&
                base.charAt(base.length - 6) == 'u' &&
                base.length - 6 >= rv) w = base
        }
      case None =>
    }

    // step 1: standard suffixes (longest match; a failed region test
    // fails the step and the verb steps run instead)
    var removed = false
    locally {
      case class E(suf: String, act: () => Boolean)
      val entries: Seq[E] =
        Seq("amientos", "imientos", "amiento", "imiento", "anzas",
          "ismos", "ables", "ibles", "istas", "anza", "icos", "icas",
          "ismo", "able", "ible", "ista", "osos", "osas", "ico", "ica",
          "oso", "osa").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length); true }
          else false)) ++
        Seq("adoras", "adores", "aciones", "ancias", "adora", "ación",
          "antes", "ancia", "ador", "ante").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("ic") && inR2(2)) w = w.dropRight(2)
            true
          } else false)) ++
        Seq("logías", "logía").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length) + "log"; true }
          else false)) ++
        Seq("uciones", "ución").map(s => E(s, () =>
          if (inR2(s.length)) { w = w.dropRight(s.length) + "u"; true }
          else false)) ++
        Seq("encias", "encia").map(s => E(s, () =>
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
            Seq("ante", "able", "ible").find(t =>
              w.endsWith(t) && inR2(t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq("idades", "idad").map(s => E(s, () =>
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
          } else false))
      entries.filter(e => w.endsWith(e.suf))
        .sortBy(-_.suf.length).headOption.foreach(e => removed = e.act())
    }

    // step 2a: y-verb suffixes in RV, preceded by u (the u may sit
    // outside RV — the test is outside the setlimit in the algorithm)
    var didVerb = false
    if (!removed) {
      val ys = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "yó")
      ys.filter(s => w.endsWith(s) && inRV(s.length))
        .sortBy(-_.length).headOption.foreach { s =>
          val p = w.length - s.length - 1
          if (p >= 0 && w.charAt(p) == 'u') {
            w = w.dropRight(s.length)
            didVerb = true
          }
        }
    }

    // step 2b: other verb suffixes in RV; en/es/éis/emos also strip a
    // trailing u after g
    if (!removed && !didVerb) {
      val all = (verbPlain.map((_, false)) ++ verbGu.map((_, true)))
        .filter { case (s, _) => w.endsWith(s) && inRV(s.length) }
        .sortBy(-_._1.length)
      all.headOption.foreach { case (s, gu) =>
        w = w.dropRight(s.length)
        if (gu && w.endsWith("gu")) w = w.dropRight(1)
      }
    }

    // step 3: residual suffix, in RV
    if (Seq("os", "a", "o", "á", "í", "ó")
        .exists(s => w.endsWith(s) && inRV(s.length))) {
      val s = if (w.endsWith("os")) "os" else w.takeRight(1)
      w = w.dropRight(s.length)
    } else if ((w.endsWith("e") || w.endsWith("é")) && inRV(1)) {
      w = w.dropRight(1)
      // a final u after g drops too, when the u is in RV
      if (w.endsWith("gu") && w.length - 1 >= rv) w = w.dropRight(1)
    }

    w.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }
  }
}
