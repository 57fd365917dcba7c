package graft

/** Dev-only harness: diff a golden stem TSV (word \t expected) against a
  * local stemmer implementation. Usage: runMain graft.ScratchGolden
  * /tmp/goldharness/stem_xx.tsv xx — writes mismatches to
  * /tmp/mismatches.txt and prints a count. Not part of the library API.
  */
object ScratchGolden {
  def main(args: Array[String]): Unit = {
    val fn: String => String = args(1) match {
      case "porter" => functions.SnowballPorter.stem
      case "fi" => functions.SnowballFinnish.stem
      case "hu" => functions.SnowballHungarian.stem
      case "ro" => functions.SnowballRomanian.stem
      case "en" => functions.SnowballEnglish.stem
      case other => sys.error(s"unknown lang $other")
    }
    val src = scala.io.Source.fromFile(args(0), "UTF-8")
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(
        new java.io.FileOutputStream("/tmp/mismatches.txt"), "UTF-8"))
    var n = 0; var bad = 0
    for (line <- src.getLines()) {
      val p = line.split("\t", -1)
      if (p.length == 2) {
        n += 1
        val got = fn(p(0))
        if (got != p(1)) { bad += 1; out.println(s"${p(0)}\t${p(1)}\t$got") }
      }
    }
    out.close(); src.close()
    println(s"checked=$n mismatch=$bad")
  }
}
