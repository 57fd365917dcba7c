package graft.functions

/** The Snowball "italian" stemmer (snowballstem.org), as vendored by
  * the reference (`src/libs/stemmer/src_c/stem_UTF_8_italian.c`) —
  * selected for `@it` literals by the full-text import. Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  */
object SnowballItalian {
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'à' | 'è' | 'ì' | 'ò' | 'ù' => true
    case _ => false
  }

  private val pronouns = Seq("gliela", "gliele", "glieli", "glielo",
    "gliene", "sene", "mela", "mele", "meli", "melo", "mene", "tela",
    "tele", "teli", "telo", "tene", "cela", "cele", "celi", "celo",
    "cene", "vela", "vele", "veli", "velo", "vene", "gli", "ci", "la",
    "le", "li", "lo", "mi", "ne", "si", "ti", "vi")

  def stem(input: String): String = {
    if (input.isEmpty) return input
    // acute -> grave; mark u/i between vowels (and u after q) as U/I
    var w = input.map {
      case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
      case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c
    }
    val cs = w.toCharArray
    var i = 1
    while (i < cs.length) {
      if (cs(i) == 'u' && cs(i - 1) == 'q') cs(i) = 'U'
      else if (i < cs.length - 1 && isVowel(cs(i - 1)) && isVowel(cs(i + 1))) {
        if (cs(i) == 'u') cs(i) = 'U'
        else if (cs(i) == 'i') cs(i) = 'I'
      }
      i += 1
    }
    w = new String(cs)
    val n = w.length

    // Romance RV
    val rv: Int =
      if (n < 3) n
      else if (!isVowel(w.charAt(1))) {
        var i = 2
        while (i < n && !isVowel(w.charAt(i))) i += 1
        math.min(i + 1, n)
      } else if (isVowel(w.charAt(0)) && isVowel(w.charAt(1))) {
        var i = 2
        while (i < n && isVowel(w.charAt(i))) i += 1
        math.min(i + 1, n)
      } else 3

    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s.charAt(i))) i += 1
      while (i < s.length && isVowel(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1 = regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)

    def inRV(s: String, sufLen: Int): Boolean = s.length - sufLen >= rv
    def inR1(s: String, sufLen: Int): Boolean = s.length - sufLen >= r1
    def inR2(s: String, sufLen: Int): Boolean = s.length - sufLen >= r2

    // step 0: attached pronoun after ando/endo (delete) or ar/er/ir (-> e)
    pronouns.find(p => w.endsWith(p) && inRV(w, p.length)) match {
      case Some(p) =>
        val stemPart = w.dropRight(p.length)
        def pre(t: String) =
          stemPart.endsWith(t) && stemPart.length - t.length >= rv
        if (pre("ando") || pre("endo")) w = stemPart
        else if (pre("ar") || pre("er") || pre("ir")) w = stemPart + "e"
      case None =>
    }

    // step 1: standard suffixes — longest match with per-entry action;
    // a matched entry whose region test fails makes step 1 fail (no
    // shorter retry), and step 2 then runs on the unchanged word
    var removed = false
    locally {
      val g1 = Seq("atrice", "atrici", "abile", "abili", "ibile", "ibili",
        "mente", "anza", "anze", "iche", "ichi", "ismo", "ismi", "ista",
        "iste", "isti", "istà", "istè", "istì", "ante", "anti", "ico",
        "ici", "ica", "ice", "oso", "osi", "osa", "ose")
      case class E(suf: String, act: () => Boolean)
      val entries: Seq[E] =
        g1.map(s => E(s, () =>
          if (inR2(w, s.length)) { w = w.dropRight(s.length); true }
          else false)) ++
        Seq("azione", "azioni", "atore", "atori").map(s => E(s, () =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("ic") && inR2(w, 2)) w = w.dropRight(2)
            true
          } else false)) ++
        Seq("logia", "logie").map(s => E(s, () =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length) + "log"; true
          } else false)) ++
        Seq("uzione", "uzioni", "usione", "usioni").map(s => E(s, () =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length) + "u"; true
          } else false)) ++
        Seq("enza", "enze").map(s => E(s, () =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length) + "ente"; true
          } else false)) ++
        Seq(E("amente", () =>
          if (inR1(w, 6)) {
            w = w.dropRight(6)
            if (w.endsWith("iv") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("at") && inR2(w, 2)) w = w.dropRight(2)
            } else Seq("abil", "os", "ic").find(t =>
              w.endsWith(t) && inR2(w, t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq("amento", "amenti", "imento", "imenti").map(s => E(s, () =>
          if (inRV(w, s.length)) { w = w.dropRight(s.length); true }
          else false)) ++
        Seq(E("ità", () =>
          if (inR2(w, 3)) {
            w = w.dropRight(3)
            Seq("abil", "ic", "iv").find(t =>
              w.endsWith(t) && inR2(w, t.length))
              .foreach(t => w = w.dropRight(t.length))
            true
          } else false)) ++
        Seq("ivo", "ivi", "iva", "ive").map(s => E(s, () =>
          if (inR2(w, s.length)) {
            w = w.dropRight(s.length)
            if (w.endsWith("at") && inR2(w, 2)) {
              w = w.dropRight(2)
              if (w.endsWith("ic") && inR2(w, 2)) w = w.dropRight(2)
            }
            true
          } else false))
      entries.filter(e => w.endsWith(e.suf))
        .sortBy(-_.suf.length).headOption
        .foreach(e => removed = e.act())
    }

    // step 2: verb suffixes in RV, only if step 1 removed nothing
    if (!removed) {
      val verbs = Seq("erebbero", "irebbero", "assero", "assimo",
        "eranno", "erebbe", "eremmo", "ereste", "eresti", "essero",
        "iranno", "irebbe", "iremmo", "ireste", "iresti", "iscano",
        "iscono", "issero", "arono", "avamo", "avano", "avate",
        "eremo", "erete", "erono", "evamo", "evano", "evate", "iremo",
        "irete", "irono", "ivamo", "ivano", "ivate", "ammo", "ando",
        "asse", "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
        "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca", "isce",
        "isci", "isco", "ano", "are", "ata", "ate", "ati", "ato", "ava",
        "avi", "avo", "erà", "ere", "erò", "ete", "eva", "evi", "evo",
        "irà", "ire", "irò", "ita", "ite", "iti", "ito", "iva", "ivi",
        "ivo", "ono", "uta", "ute", "uti", "uto", "ar", "ir")
      verbs.filter(v => w.endsWith(v) && inRV(w, v.length))
        .sortBy(-_.length).headOption
        .foreach(v => w = w.dropRight(v.length))
    }

    // step 3a: final vowel (and a preceding i), in RV
    if (w.nonEmpty && "aeioàèìò".indexOf(w.charAt(w.length - 1)) >= 0 &&
        inRV(w, 1)) {
      w = w.dropRight(1)
      if (w.endsWith("i") && inRV(w, 1)) w = w.dropRight(1)
    }
    // step 3b: ch/gh -> c/g, in RV
    if ((w.endsWith("ch") || w.endsWith("gh")) && inRV(w, 2))
      w = w.dropRight(1)

    w.map { case 'U' => 'u'; case 'I' => 'i'; case c => c }
  }
}
