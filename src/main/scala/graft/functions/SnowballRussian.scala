package graft.functions

/** The Snowball "russian" stemmer (snowballstem.org), as vendored by
  * the reference (`src/libs/stemmer/src_c/stem_UTF_8_russian.c`) —
  * selected for `@ru` literals by the full-text import. Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec. The vendored
  * snapshot does not treat ё as a vowel and does not fold it to е.
  */
object SnowballRussian {
  private def isVowel(c: Char): Boolean = c match {
    case 'а' | 'е' | 'и' | 'о' | 'у' | 'ы' | 'э' | 'ю' | 'я' => true
    case _ => false
  }

  // suffix classes, longest-match-first within each among
  private val perfGerund1 = Seq("вшись", "вши", "в") // needs а/я before
  private val perfGerund2 =
    Seq("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
  private val adjective = Seq("ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
  private val participle1 = Seq("ющ", "нн", "вш", "ем", "щ") // а/я before
  private val participle2 = Seq("ивш", "ывш", "ующ")
  private val reflexive = Seq("ся", "сь")
  private val verb1 = Seq("ешь", "нно", "ете", "йте", "ла", "на", "ли",
    "ем", "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н") // а/я before
  private val verb2 = Seq("ейте", "уйте", "ила", "ыла", "ена", "ите",
    "или", "ыли", "ило", "ыло", "ено", "ует", "уют", "ены", "ить",
    "ыть", "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит",
    "ыт", "ую", "ю")
  private val noun = Seq("иями", "ями", "ами", "ией", "иям", "ием",
    "иях", "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям",
    "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия", "ья", "а", "е",
    "и", "й", "о", "у", "ы", "ь", "ю", "я")

  def stem(input: String): String = {
    val w0 = input
    // RV: after the first vowel; R2 via the standard two-VC regions
    var rv = w0.length
    var i = 0
    var found = false
    while (i < w0.length && !found) {
      if (isVowel(w0.charAt(i))) { rv = i + 1; found = true }
      i += 1
    }
    def regionAfterVC(from: Int): Int = {
      var i = from
      while (i < w0.length && !isVowel(w0.charAt(i))) i += 1
      while (i < w0.length && isVowel(w0.charAt(i))) i += 1
      if (i < w0.length) i + 1 else w0.length
    }
    val r2 = regionAfterVC(regionAfterVC(0))

    var w = w0
    def endsIn(sufs: Seq[String]): Option[String] = {
      // longest suffix that matches AND lies inside RV
      var best: Option[String] = None
      for (s <- sufs)
        if (best.isEmpty && w.endsWith(s) && w.length - s.length >= rv)
          best = Some(s)
      best
    }
    def precededByAYa(sufLen: Int): Boolean = {
      // the а/я test consumes within the RV setlimit too
      val p = w.length - sufLen - 1
      p >= rv && (w.charAt(p) == 'а' || w.charAt(p) == 'я')
    }
    // group-1/group-2 among: the LONGEST match across both groups wins;
    // a group-1 winner whose а/я test fails makes the whole among fail
    def among2(g1: Seq[String], g2: Seq[String]): Boolean = {
      val all = (g1.map((_, true)) ++ g2.map((_, false)))
        .sortBy(-_._1.length)
      for ((s, needsA) <- all)
        if (w.endsWith(s) && w.length - s.length >= rv)
          return if (!needsA || precededByAYa(s.length)) {
            w = w.dropRight(s.length); true
          } else false
      false
    }
    def drop(sufs: Seq[String]): Boolean = endsIn(sufs) match {
      case Some(s) => w = w.dropRight(s.length); true
      case None => false
    }

    // step 1
    if (!among2(perfGerund1, perfGerund2)) {
      drop(reflexive)
      val adj = endsIn(adjective) match {
        case Some(s) =>
          w = w.dropRight(s.length)
          among2(participle1, participle2) // try participle after adj
          true
        case None => false
      }
      if (!adj && !among2(verb1, verb2)) drop(noun)
    }

    // step 2: final и
    if (w.endsWith("и") && w.length - 1 >= rv) w = w.dropRight(1)

    // step 3: derivational, in R2 (longest match, applied once)
    val deriv = if (w.endsWith("ость")) Some("ость")
                else if (w.endsWith("ост")) Some("ост") else None
    deriv.foreach { s =>
      if (w.length - s.length >= r2 && w.length - s.length >= rv)
        w = w.dropRight(s.length)
    }

    // step 4: superlative / double н / soft sign
    if (w.endsWith("нн") && w.length - 1 >= rv) w = w.dropRight(1)
    else if ((w.endsWith("ейше") || w.endsWith("ейш"))) {
      val s = if (w.endsWith("ейше")) "ейше" else "ейш"
      if (w.length - s.length >= rv) {
        w = w.dropRight(s.length)
        if (w.endsWith("нн") && w.length - 1 >= rv) w = w.dropRight(1)
      }
    } else if (w.endsWith("ь") && w.length - 1 >= rv) w = w.dropRight(1)

    w
  }
}
