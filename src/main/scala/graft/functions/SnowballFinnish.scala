package graft.functions

/** The Snowball finnish stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_finnish.c`). Implemented
  * from the published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  *
  * Structure: particle / possessive / case-ending / comparative steps, a
  * plural step chosen by whether a case ending was removed, then a tidy
  * pass (long-vowel shortening, ae-drop, oj/uj/jo fixes, final consonant
  * undoubling). Suffix matches are limited to R1 (R2 for comparatives),
  * mirroring the reference's setlimit-tomark discipline, including the
  * in-limit side-conditions (VI / LONG callbacks, t-plural's vowel test).
  */
object SnowballFinnish {
  private val V1 = "aeiouyäö"
  private val V2 = "aeiouäö"
  private val AEI = "aeiä"
  private val particleEnd = V1 + "nt"
  private def isV1(c: Char): Boolean = V1.indexOf(c) >= 0

  private val longPairs =
    Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")
  /** text of `w` ending at `end` finishes with a long vowel pair lying
    * at or after `limit` */
  private def longAt(w: String, end: Int, limit: Int): Boolean =
    end - 2 >= limit && longPairs.contains(w.substring(end - 2, end))

  def stem(input: String): String = {
    var w = input
    // p1/p2: after the first/second non-vowel that follows a vowel
    var p = 0
    def gopast(pred: Char => Boolean): Boolean = {
      while (p < w.length && !pred(w.charAt(p))) p += 1
      if (p < w.length) { p += 1; true } else false
    }
    val p1 = if (gopast(isV1) && gopast(c => !isV1(c))) p else w.length
    val p2 =
      if (p1 < w.length && gopast(isV1) && gopast(c => !isV1(c))) p
      else w.length

    var endingRemoved = false

    // step 1: particles (kin/kaan/han/... after a particle-end letter;
    // sti in R2)
    locally {
      val table = Seq("kään" -> 1, "kaan" -> 1, "han" -> 1, "hän" -> 1,
        "kin" -> 1, "sti" -> 2, "pa" -> 1, "pä" -> 1, "ko" -> 1, "kö" -> 1)
      table.filter { case (s, _) =>
        w.endsWith(s) && w.length - s.length >= p1
      }.sortBy(-_._1.length).headOption.foreach { case (s, kind) =>
        val i = w.length - s.length - 1
        if (kind == 1) {
          if (i >= 0 && particleEnd.indexOf(w.charAt(i)) >= 0)
            w = w.dropRight(s.length)
        } else if (w.length - s.length >= p2) w = w.dropRight(s.length)
      }
    }

    // step 2: possessives
    locally {
      val sufs = Seq("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än")
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= p1)
        .sortBy(-_.length).headOption.foreach {
          case s @ ("nsa" | "nsä" | "mme" | "nne") => w = w.dropRight(s.length)
          case "si" =>
            if (!(w.length >= 3 && w.charAt(w.length - 3) == 'k'))
              w = w.dropRight(2)
          case "ni" =>
            w = w.dropRight(2)
            if (w.endsWith("kse")) w = w.dropRight(1) + "i"
          case "an" =>
            val pre = w.dropRight(2)
            if (Seq("lla", "na", "ssa", "ta", "lta", "sta").exists(pre.endsWith))
              w = pre
          case "än" =>
            val pre = w.dropRight(2)
            if (Seq("llä", "nä", "ssä", "tä", "ltä", "stä").exists(pre.endsWith))
              w = pre
          case "en" =>
            val pre = w.dropRight(2)
            if (pre.endsWith("lle") || pre.endsWith("ine")) w = pre
        }
    }

    // VI condition: ...Vi before the suffix, both inside R1
    def vi(sufLen: Int): Boolean = {
      val i = w.length - sufLen - 1
      i >= p1 && w.charAt(i) == 'i' && i - 1 >= p1 &&
        V2.indexOf(w.charAt(i - 1)) >= 0
    }

    // step 3: case endings (sets the ending_removed flag)
    locally {
      // (suffix, callback-or-null, case id); callbacks fall back to
      // shorter entries on failure, case conditions fail the whole step
      case class E(suf: String, cb: () => Boolean, kind: Int)
      val plain = Seq("lla", "na", "ssa", "ta", "lta", "sta", "lle",
        "ine", "ksi", "llä", "nä", "ssä", "tä", "ltä", "stä")
      val entries =
        plain.map(E(_, null, 0)) ++ Seq(
          E("a", null, 8), E("ä", null, 8),
          E("tta", null, 9), E("ttä", null, 9),
          E("n", null, 7),
          E("han", null, 'a'), E("hen", null, 'e'), E("hin", null, 'i'),
          E("hon", null, 'o'), E("hän", null, 'ä'), E("hön", null, 'ö'),
          E("den", () => vi(3), 0), E("tten", () => vi(4), 0),
          E("siin", () => vi(4), 0),
          E("seen", () => longAt(w, w.length - 4, p1), 0))
      val cands = entries.filter(e =>
        w.endsWith(e.suf) && w.length - e.suf.length >= p1)
        .sortBy(-_.suf.length)
      cands.find(e => e.cb == null || e.cb()).foreach { e =>
        val n = w.length; val sl = e.suf.length
        e.kind match {
          case 0 => w = w.dropRight(sl); endingRemoved = true
          case 7 =>
            w = w.dropRight(1)
            if (longAt(w, w.length, 0) || w.endsWith("ie"))
              w = w.dropRight(1)
            endingRemoved = true
          case 8 =>
            if (n >= 3 && isV1(w.charAt(n - 2)) && !isV1(w.charAt(n - 3))) {
              w = w.dropRight(1); endingRemoved = true
            }
          case 9 =>
            if (n - sl >= 1 && w.charAt(n - sl - 1) == 'e') {
              w = w.dropRight(sl); endingRemoved = true
            }
          case harmony =>
            if (n - sl >= 1 && w.charAt(n - sl - 1) == harmony.toChar) {
              w = w.dropRight(sl); endingRemoved = true
            }
        }
      }
    }

    // step 4: comparatives and -eja, limited to R2
    locally {
      val guarded = Set("mma", "mpa", "mmi", "mpi", "mmä", "mpä")
      val sufs = Seq("imma", "impa", "immi", "impi", "immä", "impä",
        "eja", "ejä") ++ guarded
      sufs.filter(s => w.endsWith(s) && w.length - s.length >= p2)
        .sortBy(-_.length).headOption.foreach { s =>
          if (!guarded.contains(s) || !w.dropRight(s.length).endsWith("po"))
            w = w.dropRight(s.length)
        }
    }

    // step 5: i-plural if a case ending came off, else t-plural
    if (endingRemoved) {
      val c = if (w.nonEmpty) w.charAt(w.length - 1) else ' '
      if ((c == 'i' || c == 'j') && w.length - 1 >= p1) w = w.dropRight(1)
    } else {
      val n = w.length
      if (n >= 2 && w.charAt(n - 1) == 't' && n - 1 >= p1 &&
          n - 2 >= p1 && isV1(w.charAt(n - 2))) {
        w = w.dropRight(1)
        val m = w.length
        if (w.endsWith("imma") && m - 4 >= p2) w = w.dropRight(4)
        else if (w.endsWith("mma") && m - 3 >= p2 &&
                 !w.dropRight(3).endsWith("po")) w = w.dropRight(3)
      }
    }

    // step 6: tidy
    if (longAt(w, w.length, p1)) w = w.dropRight(1)
    locally {
      val n = w.length
      if (n >= 2 && n - 1 >= p1 && n - 2 >= p1 &&
          AEI.indexOf(w.charAt(n - 1)) >= 0 && !isV1(w.charAt(n - 2)))
        w = w.dropRight(1)
    }
    locally {
      val n = w.length
      if (n >= 2 && n - 1 >= p1 && n - 2 >= p1 && w.charAt(n - 1) == 'j' &&
          (w.charAt(n - 2) == 'o' || w.charAt(n - 2) == 'u'))
        w = w.dropRight(1)
    }
    locally {
      val n = w.length
      if (n >= 2 && n - 1 >= p1 && n - 2 >= p1 && w.charAt(n - 1) == 'o' &&
          w.charAt(n - 2) == 'j')
        w = w.dropRight(1)
    }
    // final consonant undoubling after trailing vowels
    locally {
      var k = w.length - 1
      while (k >= 0 && isV1(w.charAt(k))) k -= 1
      if (k >= 1 && w.charAt(k - 1) == w.charAt(k))
        w = w.substring(0, k) + w.substring(k + 1)
    }
    w
  }
}
