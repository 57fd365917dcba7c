package graft.functions

/** The Snowball romanian stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_romanian.c`). Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec. Uses this vintage's
  * cedilla forms ş (U+015F) / ţ (U+0163), not the comma-below letters.
  */
object SnowballRomanian {
  private val V = "aeiouâîă"
  private def isV(c: Char): Boolean = V.indexOf(c) >= 0

  private def rvOf(w: String): Int = {
    if (w.length < 2) return w.length
    if (isV(w.charAt(0))) {
      if (!isV(w.charAt(1))) {
        var i = 2; while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else {
        var i = 2; while (i < w.length && isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      }
    } else {
      if (!isV(w.charAt(1))) {
        var i = 2; while (i < w.length && !isV(w.charAt(i))) i += 1
        if (i < w.length) i + 1 else w.length
      } else if (w.length >= 3) 3 else w.length
    }
  }

  /** combining suffixes rewritten toward their base; repeated until none
    * applies (standard_suffix's repeat combo_suffix loop) */
  private val combo: Seq[(String, String)] = Seq(
    "abilitate" -> "abil", "abilitati" -> "abil", "abilităi" -> "abil",
    "abilităţi" -> "abil", "ibilitate" -> "ibil",
    "ivitate" -> "iv", "ivitati" -> "iv", "ivităi" -> "iv",
    "ivităţi" -> "iv",
    "icala" -> "ic", "iciva" -> "ic", "icale" -> "ic", "icitate" -> "ic",
    "icive" -> "ic", "icali" -> "ic", "icatori" -> "ic",
    "icitati" -> "ic", "icivi" -> "ic", "icităi" -> "ic",
    "icităţi" -> "ic", "ical" -> "ic", "icator" -> "ic", "iciv" -> "ic",
    "icală" -> "ic", "icivă" -> "ic",
    "ativa" -> "at", "aţiune" -> "at", "atoare" -> "at", "ătoare" -> "at",
    "ative" -> "at", "atori" -> "at", "ători" -> "at", "ativ" -> "at",
    "ator" -> "at", "ător" -> "at", "ativă" -> "at",
    "itiva" -> "it", "iţiune" -> "it", "itoare" -> "it", "itive" -> "it",
    "itori" -> "it", "itivi" -> "it", "itor" -> "it", "itiv" -> "it",
    "itivă" -> "it", "ativi" -> "at")

  private val standardDel = Seq("ica", "abila", "ibila", "oasa", "ata",
    "ita", "anta", "uta", "iva", "ic", "ice", "abile", "ibile", "oase",
    "ate", "itate", "ite", "ante", "ute", "ive", "ici", "abili", "ibili",
    "atori", "osi", "ati", "itati", "iti", "anti", "uti", "ivi", "ităi",
    "oşi", "ităţi", "abil", "ibil", "ator", "os", "at", "it", "ant",
    "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată", "ită", "antă",
    "ută", "ivă")
  private val standardIst = Seq("ista", "isme", "iste", "isti", "işti",
    "ism", "ist", "istă")

  private val verbCase2 = Set("se", "sese", "sei", "seşi", "seseşi",
    "aţi", "eţi", "iţi", "serăţi", "seserăţi", "âţi", "em", "sesem",
    "im", "ăm", "serăm", "seserăm", "âm", "seră", "seseră")
  private val verbCase1 = Seq("ea", "ia", "esc", "ăsc", "ind", "ând",
    "are", "ere", "ire", "âre", "ase", "ise", "use", "âse", "eşte",
    "ăşte", "eze", "ai", "eai", "iai", "eşti", "ăşti", "ui", "ezi",
    "aşi", "aseşi", "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi",
    "âi", "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi", "userăţi",
    "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam", "iam", "asem",
    "isem", "usem", "âsem", "arăm", "aserăm", "iserăm", "userăm",
    "âserăm", "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
    "ându", "ez", "ească", "ară", "aseră", "iseră", "useră", "âseră",
    "iră", "ură", "âră", "ează")

  def stem(input: String): String = {
    // prelude: u/i between vowels become consonant markers U/I
    val sb = new java.lang.StringBuilder(input)
    var i = 0
    while (i + 2 < sb.length) {
      val c = sb.charAt(i + 1)
      if (isV(sb.charAt(i)) && (c == 'u' || c == 'i') &&
          isV(sb.charAt(i + 2)))
        sb.setCharAt(i + 1, if (c == 'u') 'U' else 'I')
      i += 1
    }
    var w = sb.toString

    val pV = rvOf(w)
    var p = 0
    def gopast(pred: Char => Boolean): Boolean = {
      while (p < w.length && !pred(w.charAt(p))) p += 1
      if (p < w.length) { p += 1; true } else false
    }
    val p1 = if (gopast(isV) && gopast(c => !isV(c))) p else w.length
    val p2 =
      if (p1 < w.length && gopast(isV) && gopast(c => !isV(c))) p
      else w.length
    def r1(sufLen: Int): Boolean = w.length - sufLen >= p1
    def r2(sufLen: Int): Boolean = w.length - sufLen >= p2
    def rv(sufLen: Int): Boolean = w.length - sufLen >= pV

    // step 0: plural/article removals (R1)
    locally {
      val table = Seq("iilor" -> "i", "elor" -> "e", "ilor" -> "i",
        "ului" -> "", "atei" -> "at", "aţia" -> "aţi", "aţie" -> "aţi",
        "iile" -> "i", "iei" -> "i", "aua" -> "a", "iua" -> "i",
        "ele" -> "e", "ile" -> "i", "ea" -> "e", "ii" -> "i", "ul" -> "")
      table.filter(e => w.endsWith(e._1)).sortBy(-_._1.length).headOption
        .foreach { case (s, rep) =>
          if (r1(s.length) &&
              !(s == "ile" && w.dropRight(3).endsWith("ab")))
            w = w.dropRight(s.length) + rep
        }
    }

    // standard suffixes: repeat combo rewrites (R1), then the main
    // among in R2
    var removed = false
    var again = true
    while (again) {
      again = false
      combo.filter(e => w.endsWith(e._1)).sortBy(-_._1.length).headOption
        .foreach { case (s, rep) =>
          if (r1(s.length)) {
            w = w.dropRight(s.length) + rep
            removed = true; again = true
          }
        }
    }
    locally {
      val cands =
        (standardDel.map(s => (s, "", 1)) ++
          standardIst.map(s => (s, "ist", 3)) ++
          Seq(("iune", "", 2), ("iuni", "", 2)))
          .filter(e => w.endsWith(e._1)).sortBy(-_._1.length)
      cands.headOption.foreach { case (s, rep, kind) =>
        if (r2(s.length)) kind match {
          case 1 => w = w.dropRight(s.length); removed = true
          case 3 => w = w.dropRight(s.length) + "ist"; removed = true
          case 2 =>
            if (w.dropRight(s.length).endsWith("ţ")) {
              w = w.dropRight(s.length + 1) + "t"; removed = true
            }
        }
      }
    }

    // verb suffixes only when no standard suffix came off; matches are
    // limited to RV, and the -ea/-esc family needs a consonant or u
    // before the suffix (inside RV)
    if (!removed) {
      val cands =
        (verbCase1.map((_, 1)) ++ verbCase2.toSeq.map((_, 2)))
          .filter(e => w.endsWith(e._1) && rv(e._1.length))
          .sortBy(-_._1.length)
      cands.headOption.foreach { case (s, kind) =>
        val start = w.length - s.length
        if (kind == 2) w = w.dropRight(s.length)
        else if (start - 1 >= pV) {
          val c = w.charAt(start - 1)
          if (!isV(c) || c == 'u') w = w.dropRight(s.length)
        }
      }
    }

    // final vowel (RV)
    locally {
      val cands = Seq("ie", "a", "e", "i", "ă").filter(w.endsWith)
        .sortBy(-_.length)
      cands.headOption.foreach { s =>
        if (rv(s.length)) w = w.dropRight(s.length)
      }
    }

    w.replace('I', 'i').replace('U', 'u')
  }
}
