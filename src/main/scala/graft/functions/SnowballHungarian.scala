package graft.functions

/** The Snowball hungarian stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_hungarian.c`). Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  *
  * Faithful to this vintage's quirks: the vowel grouping uses the Latin-1
  * codepoints õ (U+00F5) and û (U+00FB) rather than Hungarian ő/ű (which
  * are therefore consonants here), and R1 starts after an initial digraph
  * (cs/dzs/gy/ly/ny/sz/ty/zs) when the word begins with vowels.
  */
object SnowballHungarian {
  private val V = "aeiouáéíóõöúûü"
  private def isV(c: Char): Boolean = V.indexOf(c) >= 0

  private val digraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val doubles = Seq("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp", "rr",
    "ss", "tt", "vv", "zz")

  private def p1of(w: String): Int = {
    if (w.isEmpty) return 0
    if (isV(w.charAt(0))) {
      var i = 1
      while (i < w.length && isV(w.charAt(i))) i += 1
      if (i >= w.length) return w.length
      digraphs.find(d => w.startsWith(d, i)) match {
        case Some(d) => i + d.length
        case None => i + 1
      }
    } else {
      var i = 1
      while (i < w.length && !isV(w.charAt(i))) i += 1
      if (i >= w.length) w.length else i + 1
    }
  }

  /** apply the longest matching suffix's action when its start is in R1;
    * action 'D' deletes, 'a'/'e' replace the suffix with that vowel.
    * Returns the updated word (unchanged when no match or R1 fails). */
  private def applyTable(w: String, p1: Int,
                         table: Seq[(String, Char)]): String = {
    table.filter(e => w.endsWith(e._1)).sortBy(-_._1.length).headOption match {
      case Some((s, act)) if w.length - s.length >= p1 =>
        if (act == 'D') w.dropRight(s.length)
        else w.dropRight(s.length) + act
      case _ => w
    }
  }

  def stem(input: String): String = {
    var w = input
    val p1 = p1of(w)
    def r1(sufLen: Int): Boolean = w.length - sufLen >= p1

    // instrum: -al/-el after a double consonant; then undouble
    if ((w.endsWith("al") || w.endsWith("el")) && r1(2) &&
        doubles.exists(w.dropRight(2).endsWith)) {
      w = w.dropRight(2)
      w = w.substring(0, w.length - 2) + w.charAt(w.length - 1)
    }

    // case endings: delete, then á->a / é->e touch-up in R1
    locally {
      val sufs = Seq("ba", "ra", "be", "re", "ig", "nak", "nek", "val",
        "vel", "ul", "nál", "nél", "ból", "ról",
        "tól", "bõl", "rõl", "tõl", "ül", "n",
        "an", "ban", "en", "ben", "képpen", "on", "ön",
        "képp", "kor", "t", "at", "et", "ként", "anként",
        "enként", "onként", "ot", "ért", "öt", "hez",
        "hoz", "höz", "vá", "vé")
      sufs.filter(w.endsWith).sortBy(-_.length).headOption.foreach { s =>
        if (r1(s.length)) {
          w = w.dropRight(s.length)
          if (w.endsWith("á") && w.length - 1 >= p1)
            w = w.dropRight(1) + "a"
          else if (w.endsWith("é") && w.length - 1 >= p1)
            w = w.dropRight(1) + "e"
        }
      }
    }

    // case_special: án/ánként -> a, én -> e
    w = applyTable(w, p1, Seq("ánként" -> 'a', "án" -> 'a',
      "én" -> 'e'))

    // case_other: -stul/-stül family
    w = applyTable(w, p1, Seq("astul" -> 'D', "estül" -> 'D',
      "ástul" -> 'a', "éstül" -> 'e', "stul" -> 'D',
      "stül" -> 'D'))

    // factive: -á/-é after a double consonant; then undouble
    if ((w.endsWith("á") || w.endsWith("é")) && r1(1) &&
        doubles.exists(w.dropRight(1).endsWith)) {
      w = w.dropRight(1)
      w = w.substring(0, w.length - 2) + w.charAt(w.length - 1)
    }

    // owned: -é/-ké/-éi possessive-of families
    w = applyTable(w, p1, Seq(
      "áéi" -> 'a', "ééi" -> 'e', "éi" -> 'D',
      "aké" -> 'D', "eké" -> 'D', "oké" -> 'D',
      "áké" -> 'a', "éké" -> 'e', "öké" -> 'D',
      "ké" -> 'D', "éé" -> 'e', "é" -> 'D'))

    // sing_owner
    w = applyTable(w, p1, Seq(
      "ja" -> 'D', "a" -> 'D', "ad" -> 'D', "ed" -> 'D', "od" -> 'D',
      "ád" -> 'a', "éd" -> 'e', "öd" -> 'D', "d" -> 'D',
      "je" -> 'D', "e" -> 'D', "unk" -> 'D', "ánk" -> 'a',
      "énk" -> 'e', "ünk" -> 'D', "nk" -> 'D', "juk" -> 'D',
      "ájuk" -> 'a', "uk" -> 'D', "jük" -> 'D',
      "éjük" -> 'e', "ük" -> 'D', "am" -> 'D', "em" -> 'D',
      "om" -> 'D', "ám" -> 'a', "ém" -> 'e', "m" -> 'D',
      "o" -> 'D', "á" -> 'a', "é" -> 'e'))

    // plur_owner
    w = applyTable(w, p1, Seq(
      "jaid" -> 'D', "jeid" -> 'D', "aid" -> 'D', "eid" -> 'D',
      "áid" -> 'a', "éid" -> 'e', "id" -> 'D',
      "jai" -> 'D', "jei" -> 'D', "ai" -> 'D', "ei" -> 'D',
      "ái" -> 'a', "éi" -> 'e', "i" -> 'D',
      "jeitek" -> 'D', "eitek" -> 'D', "éitek" -> 'e', "itek" -> 'D',
      "jaik" -> 'D', "jeik" -> 'D', "aik" -> 'D', "eik" -> 'D',
      "áik" -> 'a', "éik" -> 'e', "ik" -> 'D',
      "jaink" -> 'D', "jeink" -> 'D', "aink" -> 'D', "eink" -> 'D',
      "áink" -> 'a', "éink" -> 'e', "ink" -> 'D',
      "jaitok" -> 'D', "aitok" -> 'D', "áitok" -> 'a',
      "jaim" -> 'D', "jeim" -> 'D', "aim" -> 'D', "eim" -> 'D',
      "áim" -> 'a', "éim" -> 'e', "im" -> 'D'))

    // plural
    w = applyTable(w, p1, Seq("ak" -> 'D', "ek" -> 'D', "ok" -> 'D',
      "ák" -> 'a', "ék" -> 'e', "ök" -> 'D', "k" -> 'D'))

    w
  }
}
