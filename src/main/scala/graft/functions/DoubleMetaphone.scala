package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Lawrence Philips' Double Metaphone phonetic algorithm (C/C++ Users
  * Journal, June 2000) — the key function behind the reference's
  * `fs:dmetaphone` full-text quads (`src/frontend/import.c:627-660`
  * calls it per token and emits the primary code, plus the secondary
  * when it differs).
  *
  * Byte-level contract: the reference implementation consumes the raw
  * C string, so multi-byte UTF-8 letters are seen as individual
  * Latin-1 bytes — only ASCII letters participate, except 0xC7 ('Ç')
  * which codes S and 0xD1 ('Ñ') which codes N; all other high bytes
  * are skipped. We reproduce that exactly by walking the UTF-8 bytes
  * (verified against reference-computed vectors over a 12k-word corpus
  * in FullTextGoldenSpec). Codes are capped at 4 characters; 'th' is
  * coded as the digit 0.
  */
object DoubleMetaphone {
  private final val CCedilla = 0xC7.toChar
  private final val NTilde = 0xD1.toChar

  /** primary+secondary codes; secondary == primary when no alternate. */
  def compute(word: String): (String, String) = {
    // the reference sees UTF-8 bytes; map each byte to a char 0-255
    val bytes = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = bytes.length
    // ASCII-only uppercase (C locale toupper), pad so lookahead is safe
    val w = new Array[Char](n + 5)
    var bi = 0
    while (bi < n) {
      val b = bytes(bi) & 0xFF
      w(bi) = if (b >= 'a' && b <= 'z') (b - 32).toChar else b.toChar
      bi += 1
    }
    java.util.Arrays.fill(w, n, n + 5, ' ')

    val last = n - 1
    val pri = new java.lang.StringBuilder(8)
    val sec = new java.lang.StringBuilder(8)
    def add(p: String, s: String): Unit = { pri.append(p); sec.append(s) }

    def at(pos: Int): Char = if (pos < 0 || pos >= n) ' ' else w(pos)
    def isVowel(pos: Int): Boolean = at(pos) match {
      case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' => true
      case _ => false
    }
    def strAt(start: Int, len: Int, cands: String*): Boolean = {
      if (start < 0) return false
      var ci = 0
      while (ci < cands.length) {
        val c = cands(ci)
        var i = 0
        var ok = c.length == len
        while (ok && i < len) { if (w(start + i) != c.charAt(i)) ok = false; i += 1 }
        if (ok) return true
        ci += 1
      }
      false
    }
    val slavoGermanic = {
      var found = false
      var i = 0
      while (!found && i < n) {
        val c = w(i)
        if (c == 'W' || c == 'K') found = true
        else if (c == 'C' && i + 1 < n && w(i + 1) == 'Z') found = true
        i += 1
      }
      found
    }

    var cur = 0
    // initial silent letters: GN-, KN-, PN-, WR-, PS-
    if (strAt(0, 2, "GN", "KN", "PN", "WR", "PS")) cur = 1
    // initial X is pronounced Z (coded S): Xavier
    if (n > 0 && w(0) == 'X') { add("S", "S"); cur = 1 }

    while ((pri.length < 4 || sec.length < 4) && cur < n) {
      w(cur) match {
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' =>
          if (cur == 0) add("A", "A")
          cur += 1

        case 'B' =>
          add("P", "P")
          cur += (if (at(cur + 1) == 'B') 2 else 1)

        case CCedilla =>
          add("S", "S")
          cur += 1

        case 'C' =>
          // germanic -ACH-: "macher", "bacher"
          if (cur > 1 && !isVowel(cur - 2) && strAt(cur - 1, 3, "ACH") &&
              (at(cur + 2) != 'I' &&
                (at(cur + 2) != 'E' || strAt(cur - 2, 6, "BACHER", "MACHER")))) {
            add("K", "K"); cur += 2
          } else if (cur == 0 && strAt(cur, 6, "CAESAR")) {
            add("S", "S"); cur += 2
          } else if (strAt(cur, 4, "CHIA")) { // italian "chianti"
            add("K", "K"); cur += 2
          } else if (strAt(cur, 2, "CH")) {
            if (cur > 0 && strAt(cur, 4, "CHAE")) { // michael
              add("K", "X"); cur += 2
            } else if (cur == 0 &&
                (strAt(cur + 1, 5, "HARAC", "HARIS") ||
                  strAt(cur + 1, 3, "HOR", "HYM", "HIA", "HEM")) &&
                !strAt(0, 5, "CHORE")) {
              // greek roots: chemistry, chorus
              add("K", "K"); cur += 2
            } else if ((strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH")) ||
                strAt(cur - 2, 6, "ORCHES", "ARCHIT", "ORCHID") ||
                strAt(cur + 2, 1, "T", "S") ||
                ((strAt(cur - 1, 1, "A", "O", "U", "E") || cur == 0) &&
                  strAt(cur + 2, 1, "L", "R", "N", "M", "B", "H", "F", "V",
                    "W", " "))) {
              // germanic | "architect" but not "arch" | "wachtler"
              add("K", "K"); cur += 2
            } else {
              if (cur > 0) {
                if (strAt(0, 2, "MC")) add("K", "K") else add("X", "K")
              } else add("X", "X")
              cur += 2
            }
          } else if (strAt(cur, 2, "CZ") && !strAt(cur - 2, 4, "WICZ")) {
            add("S", "X"); cur += 2 // "czerny"
          } else if (strAt(cur + 1, 3, "CIA")) { // "focaccia"
            add("X", "X"); cur += 3
          } else if (strAt(cur, 2, "CC") && !(cur == 1 && w(0) == 'M')) {
            // double C, but not McClellan
            if (strAt(cur + 2, 1, "I", "E", "H") && !strAt(cur + 2, 2, "HU")) {
              if ((cur == 1 && at(cur - 1) == 'A') ||
                  strAt(cur - 1, 5, "UCCEE", "UCCES")) {
                add("KS", "KS") // accident, succeed
              } else add("X", "X") // bacci
              cur += 3
            } else { add("K", "K"); cur += 2 } // Pierce's rule
          } else if (strAt(cur, 2, "CK", "CG", "CQ")) {
            add("K", "K"); cur += 2
          } else if (strAt(cur, 2, "CI", "CE", "CY")) {
            if (strAt(cur, 3, "CIO", "CIE", "CIA")) add("S", "X")
            else add("S", "S")
            cur += 2
          } else {
            add("K", "K")
            if (strAt(cur + 1, 2, " C", " Q", " G")) cur += 3 // "mac caffrey"
            else if (strAt(cur + 1, 1, "C", "K", "Q") &&
                !strAt(cur + 1, 2, "CE", "CI")) cur += 2
            else cur += 1
          }

        case 'D' =>
          if (strAt(cur, 2, "DG")) {
            if (strAt(cur + 2, 1, "I", "E", "Y")) { add("J", "J"); cur += 3 }
            else { add("TK", "TK"); cur += 2 }
          } else if (strAt(cur, 2, "DT", "DD")) { add("T", "T"); cur += 2 }
          else { add("T", "T"); cur += 1 }

        case 'F' =>
          add("F", "F")
          cur += (if (at(cur + 1) == 'F') 2 else 1)

        case 'G' =>
          if (at(cur + 1) == 'H') {
            if (cur > 0 && !isVowel(cur - 1)) { add("K", "K"); cur += 2 }
            else if (cur == 0) { // ghislane vs ghoulish
              if (at(cur + 2) == 'I') add("J", "J") else add("K", "K")
              cur += 2
            } else if ((cur > 1 && strAt(cur - 2, 1, "B", "H", "D")) ||
                (cur > 2 && strAt(cur - 3, 1, "B", "H", "D")) ||
                (cur > 3 && strAt(cur - 4, 1, "B", "H"))) {
              cur += 2 // silent: hugh, bough, broughton
            } else {
              // laugh, cough: -CUGH-, -LUGH- etc code F
              if (cur > 2 && at(cur - 1) == 'U' &&
                  strAt(cur - 3, 1, "C", "G", "L", "R", "T")) add("F", "F")
              else if (cur > 0 && at(cur - 1) != 'I') add("K", "K")
              cur += 2
            }
          } else if (at(cur + 1) == 'N') {
            if (cur == 1 && isVowel(0) && !slavoGermanic) add("KN", "N")
            else if (!strAt(cur + 2, 2, "EY") && at(cur + 1) != 'Y' &&
                !slavoGermanic) add("N", "KN")
            else add("KN", "KN")
            cur += 2
          } else if (strAt(cur + 1, 2, "LI") && !slavoGermanic) {
            add("KL", "L"); cur += 2 // "tagliaro"
          } else if (cur == 0 && (at(cur + 1) == 'Y' ||
              strAt(cur + 1, 2, "ES", "EP", "EB", "EL", "EY", "IB", "IL",
                "IN", "IE", "EI", "ER"))) {
            add("K", "J"); cur += 2 // ges-, gep- germanic/greek starts
          } else if ((strAt(cur + 1, 2, "ER") || at(cur + 1) == 'Y') &&
              !strAt(0, 6, "DANGER", "RANGER", "MANGER") &&
              !strAt(cur - 1, 1, "E", "I") &&
              !strAt(cur - 1, 3, "RGY", "OGY")) {
            add("K", "J"); cur += 2 // -ger-, -gy-
          } else if (strAt(cur + 1, 1, "E", "I", "Y") ||
              strAt(cur - 1, 4, "AGGI", "OGGI")) {
            if (strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH") ||
                strAt(cur + 1, 2, "ET")) add("K", "K") // germanic
            else if (strAt(cur + 1, 4, "IER ")) add("J", "J")
            else add("J", "K")
            cur += 2
          } else {
            if (at(cur + 1) == 'G') cur += 2 else cur += 1
            add("K", "K")
          }

        case 'H' =>
          // keep only between vowels or word-initial before vowel
          if ((cur == 0 || isVowel(cur - 1)) && isVowel(cur + 1)) {
            add("H", "H"); cur += 2
          } else cur += 1

        case 'J' =>
          if (strAt(cur, 4, "JOSE") || strAt(0, 4, "SAN ")) {
            // spanish: jose, san jacinto
            if ((cur == 0 && at(cur + 4) == ' ') || strAt(0, 4, "SAN "))
              add("H", "H")
            else add("J", "H")
            cur += 1
          } else {
            if (cur == 0 && !strAt(cur, 4, "JOSE")) add("J", "A")
            else if (isVowel(cur - 1) && !slavoGermanic &&
                (at(cur + 1) == 'A' || at(cur + 1) == 'O')) add("J", "H")
            else if (cur == last) add("J", "")
            else if (!strAt(cur + 1, 1, "L", "T", "K", "S", "N", "M", "B",
                "Z") && !strAt(cur - 1, 1, "S", "K", "L")) add("J", "J")
            // else silent
            cur += (if (at(cur + 1) == 'J') 2 else 1)
          }

        case 'K' =>
          add("K", "K")
          cur += (if (at(cur + 1) == 'K') 2 else 1)

        case 'L' =>
          if (at(cur + 1) == 'L') {
            // spanish -illo/-illa/-alle
            if ((cur == n - 3 && strAt(cur - 1, 4, "ILLO", "ILLA", "ALLE")) ||
                ((strAt(last - 1, 2, "AS", "OS") ||
                  strAt(last, 1, "A", "O")) && strAt(cur - 1, 4, "ALLE"))) {
              add("L", ""); cur += 2
            } else { add("L", "L"); cur += 2 }
          } else { add("L", "L"); cur += 1 }

        case 'M' =>
          if ((strAt(cur - 1, 3, "UMB") &&
                (cur + 1 == last || strAt(cur + 2, 2, "ER"))) ||
              at(cur + 1) == 'M') cur += 2
          else cur += 1
          add("M", "M")

        case 'N' =>
          add("N", "N")
          cur += (if (at(cur + 1) == 'N') 2 else 1)

        case NTilde =>
          add("N", "N")
          cur += 1

        case 'P' =>
          if (at(cur + 1) == 'H') { add("F", "F"); cur += 2 }
          else {
            add("P", "P")
            cur += (if (strAt(cur + 1, 1, "P", "B")) 2 else 1)
          }

        case 'Q' =>
          add("K", "K")
          cur += (if (at(cur + 1) == 'Q') 2 else 1)

        case 'R' =>
          // french -ier/-iere endings: silent primary R
          if (cur == last && !slavoGermanic && strAt(cur - 2, 2, "IE") &&
              !strAt(cur - 4, 2, "ME", "MA")) add("", "R")
          else add("R", "R")
          cur += (if (at(cur + 1) == 'R') 2 else 1)

        case 'S' =>
          if (strAt(cur - 1, 3, "ISL", "YSL")) cur += 1 // island, isle
          else if (cur == 0 && strAt(cur, 5, "SUGAR")) { add("X", "S"); cur += 1 }
          else if (strAt(cur, 2, "SH")) {
            // germanic -sheim etc stays S
            if (strAt(cur + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"))
              add("S", "S")
            else add("X", "X")
            cur += 2
          } else if (strAt(cur, 3, "SIO", "SIA") || strAt(cur, 4, "SIAN")) {
            if (!slavoGermanic) add("S", "X") else add("S", "S")
            cur += 3
          } else if ((cur == 0 && strAt(cur + 1, 1, "M", "N", "L", "W")) ||
              strAt(cur + 1, 1, "Z")) {
            // german-ish initial S + consonant, or -SZ-
            add("S", "X")
            cur += (if (strAt(cur + 1, 1, "Z")) 2 else 1)
          } else if (strAt(cur, 2, "SC")) {
            if (at(cur + 2) == 'H') {
              if (strAt(cur + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM")) {
                // dutch: school, schooner / schermerhorn
                if (strAt(cur + 3, 2, "ER", "EN")) add("X", "SK")
                else add("SK", "SK")
                cur += 3
              } else {
                if (cur == 0 && !isVowel(3) && at(3) != 'W') add("X", "S")
                else add("X", "X")
                cur += 3
              }
            } else if (strAt(cur + 2, 1, "I", "E", "Y")) {
              add("S", "S"); cur += 3
            } else { add("SK", "SK"); cur += 3 }
          } else {
            // french endings: -ais, -ois silent final S
            if (cur == last && strAt(cur - 2, 2, "AI", "OI")) add("", "S")
            else add("S", "S")
            cur += (if (strAt(cur + 1, 1, "S", "Z")) 2 else 1)
          }

        case 'T' =>
          if (strAt(cur, 4, "TION")) { add("X", "X"); cur += 3 }
          else if (strAt(cur, 3, "TIA", "TCH")) { add("X", "X"); cur += 3 }
          else if (strAt(cur, 2, "TH") || strAt(cur, 3, "TTH")) {
            // thomas, thames, or germanic: T; else th -> 0
            if (strAt(cur + 2, 2, "OM", "AM") ||
                strAt(0, 4, "VAN ", "VON ") || strAt(0, 3, "SCH"))
              add("T", "T")
            else add("0", "T")
            cur += 2
          } else {
            add("T", "T")
            cur += (if (strAt(cur + 1, 1, "T", "D")) 2 else 1)
          }

        case 'V' =>
          add("F", "F")
          cur += (if (at(cur + 1) == 'V') 2 else 1)

        case 'W' =>
          if (strAt(cur, 2, "WR")) { add("R", "R"); cur += 2 }
          else {
            if (cur == 0 && (isVowel(cur + 1) || strAt(cur, 2, "WH"))) {
              if (isVowel(cur + 1)) add("A", "F") // wasserman/vasserman
              else add("A", "A") // whirl
            }
            if ((cur == last && isVowel(cur - 1)) ||
                strAt(cur - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY") ||
                strAt(0, 3, "SCH")) {
              add("", "F"); cur += 1 // arnow/arnoff
            } else if (strAt(cur, 4, "WICZ", "WITZ")) {
              add("TS", "FX"); cur += 4 // polish
            } else cur += 1
          }

        case 'X' =>
          // french -aux/-oux: silent final X
          if (!(cur == last && (strAt(cur - 3, 3, "IAU", "EAU") ||
              strAt(cur - 2, 2, "AU", "OU")))) add("KS", "KS")
          cur += (if (strAt(cur + 1, 1, "C", "X")) 2 else 1)

        case 'Z' =>
          if (at(cur + 1) == 'H') { add("J", "J"); cur += 2 } // zhao
          else {
            if (strAt(cur + 1, 2, "ZO", "ZI", "ZA") ||
                (slavoGermanic && (cur > 0 && at(cur - 1) != 'T')))
              add("S", "TS")
            else add("S", "S")
            cur += (if (at(cur + 1) == 'Z') 2 else 1)
          }

        case _ =>
          cur += 1
      }
    }

    val p = if (pri.length > 4) pri.substring(0, 4) else pri.toString
    val s = if (sec.length > 4) sec.substring(0, 4) else sec.toString
    (p, s)
  }

  /** Distinct non-empty codes in emission order, as the reference emits
    * quads (`import.c:645-656`): primary first, secondary only when it
    * is non-empty and differs from the primary. */
  def codes(word: UTF8String): GenericArrayData = {
    val (p, s) = compute(word.toString)
    val out =
      if (p.isEmpty && s.isEmpty) Array.empty[Any]
      else if (p.isEmpty) Array[Any](UTF8String.fromString(s))
      else if (s.isEmpty || s == p) Array[Any](UTF8String.fromString(p))
      else Array[Any](UTF8String.fromString(p), UTF8String.fromString(s))
    new GenericArrayData(out)
  }
}

/** `dmetaphone_codes(token)`: array of the word's distinct double-
  * metaphone codes (primary, then secondary when it differs). */
final case class DMetaphoneCodes(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "dmetaphone_codes"
  override protected def nullSafeEval(input: Any): Any =
    DoubleMetaphone.codes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DoubleMetaphone.codes($c)")
  override protected def withNewChildInternal(newChild: Expression): DMetaphoneCodes =
    copy(child = newChild)
}
