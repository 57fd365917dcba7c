package graft.functions

/** The Snowball "french" stemmer (snowballstem.org), as vendored by the
  * reference (`src/libs/stemmer/src_c/stem_UTF_8_french.c`) — selected
  * for `@fr` literals by the full-text import. Implemented from the
  * published algorithm; verified vector-for-vector against the
  * reference's compiled stemmer in FullTextGoldenSpec.
  *
  * Control flow (per the published description): step 1; step 2a when
  * step 1 removed nothing or removed a -ment family ending; step 2b
  * when 2a ran empty; step 3 (final Y->i, ç->c) when the last obeyed
  * step altered the word, else step 4 (final s, ion/ier/e tidy);
  * steps 5 (undouble) and 6 (un-accent) always. Regions are computed
  * once on the marked word and survive suffix removal.
  */
object SnowballFrench {
  private def isVowel(c: Char): Boolean = c match {
    case 'a' | 'e' | 'i' | 'o' | 'u' | 'y' | 'â' | 'à' | 'ë' | 'é' |
         'ê' | 'è' | 'ï' | 'î' | 'ô' | 'û' | 'ù' => true
    case _ => false
  }

  def stem(input: String): String = {
    if (input.isEmpty) return input
    // prelude: mark u/i between vowels, y next to a vowel, u after q.
    // Ordered like the algorithm's scan: at each position the
    // vowel-ANCHORED pattern (v + u/i/y) is tried first — so in "…cyie"
    // the y (a vowel in the grouping) anchors the i, which gets marked,
    // and the y itself stays a vowel. Marks are visible to later tests.
    val cs = input.toCharArray
    var p = 0
    while (p < cs.length - 1) {
      val c2 = cs(p + 1)
      val anchored = isVowel(cs(p)) && {
        if (c2 == 'u' && p + 2 < cs.length && isVowel(cs(p + 2))) {
          cs(p + 1) = 'U'; true
        } else if (c2 == 'i' && p + 2 < cs.length && isVowel(cs(p + 2))) {
          cs(p + 1) = 'I'; true
        } else if (c2 == 'y') { cs(p + 1) = 'Y'; true }
        else false
      }
      if (anchored) p += 2
      else if (cs(p) == 'y' && isVowel(c2)) { cs(p) = 'Y'; p += 1 }
      else if (cs(p) == 'q' && c2 == 'u') { cs(p + 1) = 'U'; p += 2 }
      else p += 1
    }
    var w = new String(cs)

    val rv: Int = {
      val n = w.length
      if (n < 2) n
      else if (isVowel(w.charAt(0)) && isVowel(w.charAt(1))) math.min(3, n)
      else {
        var i = 1
        while (i < n && !isVowel(w.charAt(i))) i += 1
        if (i < n) i + 1 else n
      }
    }
    def regionAfterVC(s: String, from: Int): Int = {
      var i = from
      while (i < s.length && !isVowel(s.charAt(i))) i += 1
      while (i < s.length && isVowel(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1 = regionAfterVC(w, 0)
    val r2 = regionAfterVC(w, r1)
    def inRV(sufLen: Int): Boolean = w.length - sufLen >= rv
    def inR1(sufLen: Int): Boolean = w.length - sufLen >= r1
    def inR2(sufLen: Int): Boolean = w.length - sufLen >= r2

    var step1Changed = false
    var mentRemoved = false

    // ------------------------------------------------------- step 1
    locally {
      case class E(suf: String, act: () => Unit)
      def r2del(s: String): E = E(s, () =>
        if (inR2(s.length)) { w = w.dropRight(s.length); step1Changed = true })
      val entries: Seq[E] =
        Seq("ances", "iqUes", "ismes", "ables", "istes", "ance", "iqUe",
          "isme", "able", "iste", "eux").map(r2del) ++
        Seq("atrices", "ateurs", "ations", "atrice", "ateur", "ation")
          .map(s => E(s, () =>
            if (inR2(s.length)) {
              w = w.dropRight(s.length); step1Changed = true
              if (w.endsWith("ic")) {
                if (inR2(2)) w = w.dropRight(2)
                else w = w.dropRight(2) + "iqU"
              }
            })) ++
        Seq("logies", "logie").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length) + "log"; step1Changed = true
          })) ++
        Seq("usions", "utions", "usion", "ution").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length) + "u"; step1Changed = true
          })) ++
        Seq("ences", "ence").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length) + "ent"; step1Changed = true
          })) ++
        Seq("ements", "ement").map(s => E(s, () =>
          if (inRV(s.length)) {
            w = w.dropRight(s.length); step1Changed = true
            if (w.endsWith("iv") && inR2(2)) {
              w = w.dropRight(2)
              if (w.endsWith("at") && inR2(2)) w = w.dropRight(2)
            } else if (w.endsWith("eus")) {
              if (inR2(3)) w = w.dropRight(3)
              else if (inR1(3)) w = w.dropRight(3) + "eux"
            } else if (w.endsWith("abl") && inR2(3)) w = w.dropRight(3)
            else if (w.endsWith("iqU") && inR2(3)) w = w.dropRight(3)
            else if (w.endsWith("ièr") && inRV(3)) w = w.dropRight(3) + "i"
            else if (w.endsWith("Ièr") && inRV(3)) w = w.dropRight(3) + "i"
          })) ++
        Seq("ités", "ité").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length); step1Changed = true
            if (w.endsWith("abil")) {
              if (inR2(4)) w = w.dropRight(4)
              else w = w.dropRight(4) + "abl"
            } else if (w.endsWith("ic")) {
              if (inR2(2)) w = w.dropRight(2)
              else w = w.dropRight(2) + "iqU"
            } else if (w.endsWith("iv") && inR2(2)) w = w.dropRight(2)
          })) ++
        Seq("ives", "ifs", "ive", "if").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length); step1Changed = true
            if (w.endsWith("at") && inR2(2)) {
              w = w.dropRight(2)
              if (w.endsWith("ic")) {
                if (inR2(2)) w = w.dropRight(2)
                else w = w.dropRight(2) + "iqU"
              }
            }
          })) ++
        Seq(E("eaux", () => {
          w = w.dropRight(4) + "eau"; step1Changed = true
        })) ++
        Seq(E("aux", () =>
          if (inR1(3)) { w = w.dropRight(3) + "al"; step1Changed = true })) ++
        Seq("euses", "euse").map(s => E(s, () =>
          if (inR2(s.length)) {
            w = w.dropRight(s.length); step1Changed = true
          } else if (inR1(s.length)) {
            w = w.dropRight(s.length) + "eux"; step1Changed = true
          })) ++
        Seq("issements", "issement").map(s => E(s, () =>
          if (inR1(s.length) && w.length > s.length &&
              !isVowel(w.charAt(w.length - s.length - 1))) {
            w = w.dropRight(s.length); step1Changed = true
          })) ++
        Seq(E("amment", () =>
          if (inRV(6)) { w = w.dropRight(6) + "ant"; mentRemoved = true })) ++
        Seq(E("emment", () =>
          if (inRV(6)) { w = w.dropRight(6) + "ent"; mentRemoved = true })) ++
        Seq("ments", "ment").map(s => E(s, () => {
          val p = w.length - s.length - 1
          if (p >= 0 && isVowel(w.charAt(p)) && p >= rv) {
            w = w.dropRight(s.length); mentRemoved = true
          }
        }))
      entries.filter(e => w.endsWith(e.suf))
        .sortBy(-_.suf.length).headOption.foreach(_.act())
    }

    // ------------------------------------------------------- steps 2a/2b
    var lastAltered = step1Changed || mentRemoved
    val do2a = (!step1Changed && !mentRemoved) || mentRemoved
    if (do2a) {
      var removed2a = false
      val is = Seq("issaIent", "issantes", "issions", "issante",
        "issants", "issais", "issait", "issant", "issent", "issiez",
        "issons", "iraIent", "irions", "issez", "isses", "irais",
        "irait", "irent", "iriez", "irons", "iront", "isse", "îtes",
        "irai", "iras", "irez", "îmes", "ies", "ira", "ît", "ie",
        "ir", "is", "it", "i")
      is.filter(s => w.endsWith(s) && inRV(s.length))
        .sortBy(-_.length).headOption.foreach { s =>
          val p = w.length - s.length - 1
          if (p >= rv && !isVowel(w.charAt(p))) {
            w = w.dropRight(s.length)
            removed2a = true
          }
        }
      if (removed2a) lastAltered = true
      else {
        // step 2b
        var changed2b = false
        val eGroup = Set("eraIent", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "ées",
          "era", "iez", "ée", "er", "ez", "és", "é")
        val aGroup = Set("assions", "assent", "assiez", "aIent",
          "antes", "asses", "âtes", "âmes", "ante", "ants", "asse",
          "ais", "ait", "ant", "ât", "as", "ai", "a")
        val all = (Seq("ions") ++ eGroup ++ aGroup)
          .filter(s => w.endsWith(s) && inRV(s.length))
          .sortBy(-_.length)
        all.headOption.foreach { s =>
          if (s == "ions") {
            if (inR2(s.length)) { w = w.dropRight(s.length); changed2b = true }
          } else if (eGroup(s)) {
            w = w.dropRight(s.length); changed2b = true
          } else {
            w = w.dropRight(s.length); changed2b = true
            if (w.endsWith("e") && inRV(1)) w = w.dropRight(1)
          }
        }
        lastAltered = changed2b
      }
    }

    // ------------------------------------------------- steps 3 / 4
    if (lastAltered) {
      if (w.endsWith("Y")) w = w.dropRight(1) + "i"
      else if (w.endsWith("ç")) w = w.dropRight(1) + "c"
    } else {
      // step 4: final s unless preceded by a/i/o/u/è/s
      if (w.endsWith("s") && w.length >= 2 &&
          "aiouès".indexOf(w.charAt(w.length - 2)) < 0)
        w = w.dropRight(1)
      // tidy, in RV (longest among)
      val cands = Seq("Ière", "ière", "Ier", "ier", "ion", "ë", "e")
        .filter(s => w.endsWith(s) && inRV(s.length))
        .sortBy(-_.length)
      cands.headOption.foreach {
        case s @ ("ier" | "Ier" | "ière" | "Ière") =>
          w = w.dropRight(s.length) + "i"
        case "ion" =>
          if (inR2(3) && w.length >= 4 &&
              (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
            w = w.dropRight(3)
        case "ë" =>
          if (w.length >= 3 && w.substring(w.length - 3, w.length - 1) == "gu")
            w = w.dropRight(1)
        case "e" =>
          w = w.dropRight(1)
      }
    }

    // step 5: undouble enn/onn/ett/ell/eill
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(w.endsWith))
      w = w.dropRight(1)

    // step 6: un-accent é/è before a final run of non-vowels
    locally {
      var i = w.length - 1
      var sawNonVowel = false
      while (i >= 0 && !isVowel(w.charAt(i))) { sawNonVowel = true; i -= 1 }
      if (sawNonVowel && i >= 0 &&
          (w.charAt(i) == 'é' || w.charAt(i) == 'è'))
        w = w.substring(0, i) + "e" + w.substring(i + 1)
    }

    w.map { case 'U' => 'u'; case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }
}
