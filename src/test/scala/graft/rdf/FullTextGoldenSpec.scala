package graft.rdf

import graft.SparkTestBase
import graft.functions.{DoubleMetaphone, SnowballEnglish}

/** Golden parity for the full-text kernels against the REFERENCE'S OWN
  * implementations: the committed vector files were produced by running
  * the reference's `double_metaphone.c` and Snowball `english` stemmer
  * (compiled as-is) over a 12k-word corpus of real words, curated
  * phonetic edge cases, and deterministic cluster-fuzz strings
  * (including multi-byte UTF-8 to pin the byte-level contract).
  *
  *   src/test/resources/fulltext/dm.tsv       word \t primary \t secondary
  *   src/test/resources/fulltext/stem_en.tsv  word \t stem
  *
  * The fixture test replays the reference's own full-text test data
  * (`data/fulltext-test.ttl` + `data/config-test.ttl`) through the
  * import-time derivation and checks the emitted quads value-for-value.
  */
class FullTextGoldenSpec extends SparkTestBase {

  private def resourceLines(name: String): Iterator[String] = {
    val in = getClass.getResourceAsStream(name)
    assert(in != null, s"missing test resource $name")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
  }

  test("double-metaphone matches the reference kernel on 12k golden vectors") {
    var n = 0
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    for (line <- resourceLines("/fulltext/dm.tsv")) {
      val p = line.split("\t", -1)
      if (p.length == 3) {
        n += 1
        val (pri, sec) = DoubleMetaphone.compute(p(0))
        if (pri != p(1) || sec != p(2)) {
          if (bad.size < 20)
            bad += s"${p(0)}: got ($pri,$sec) want (${p(1)},${p(2)})"
        }
      }
    }
    assert(n > 12000, s"corpus unexpectedly small: $n")
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("double-metaphone byte-level contract for non-ASCII input") {
    // the reference consumes raw UTF-8 bytes: 0xC7 ('Ç' in Latin-1)
    // codes S, 0xD1 ('Ñ') codes N, all other high bytes are skipped.
    // Cyrillic "Корова" contains a 0xD1 byte (in 'р') -> "N".
    assert(DoubleMetaphone.compute("Корова") === (("N", "N")))
    assert(DoubleMetaphone.compute("può") === (("P", "P")))
    assert(DoubleMetaphone.compute("mañana") === (("MN", "MN")))
    assert(DoubleMetaphone.compute("Würde") === (("RT", "RT")))
  }

  private def checkStemGolden(resource: String, fn: String => String,
                              minWords: Int): Unit = {
    var n = 0
    val bad = new scala.collection.mutable.ArrayBuffer[String]
    for (line <- resourceLines(resource)) {
      val p = line.split("\t", -1)
      if (p.length == 2) {
        n += 1
        val got = fn(p(0))
        if (got != p(1)) {
          if (bad.size < 20) bad += s"${p(0)}: got $got want ${p(1)}"
        }
      }
    }
    assert(n > minWords, s"corpus unexpectedly small: $n")
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("snowball english stemmer matches the reference on 11k golden vectors") {
    checkStemGolden("/fulltext/stem_en.tsv", SnowballEnglish.stem, 11000)
  }

  test("snowball german stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_de.tsv",
      graft.functions.SnowballGerman.stem, 8000)
  }

  test("snowball russian stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_ru.tsv",
      graft.functions.SnowballRussian.stem, 7900)
  }

  test("snowball italian stemmer matches the reference on 7k golden vectors") {
    checkStemGolden("/fulltext/stem_it.tsv",
      graft.functions.SnowballItalian.stem, 7900)
  }

  test("snowball spanish stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_es.tsv",
      graft.functions.SnowballSpanish.stem, 7900)
  }

  test("snowball portuguese stemmer matches the reference on 7k golden vectors") {
    checkStemGolden("/fulltext/stem_pt.tsv",
      graft.functions.SnowballPortuguese.stem, 7900)
  }

  test("snowball french stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_fr.tsv",
      graft.functions.SnowballFrench.stem, 7900)
  }

  test("snowball danish stemmer matches the reference on 6k golden vectors") {
    checkStemGolden("/fulltext/stem_da.tsv",
      graft.functions.SnowballDanish.stem, 6900)
  }

  test("snowball norwegian stemmer matches the reference on 6k golden vectors") {
    checkStemGolden("/fulltext/stem_no.tsv",
      graft.functions.SnowballNorwegian.stem, 6900)
  }

  test("snowball swedish stemmer matches the reference on 6k golden vectors") {
    checkStemGolden("/fulltext/stem_sv.tsv",
      graft.functions.SnowballSwedish.stem, 6900)
  }

  test("snowball dutch stemmer matches the reference on 7k golden vectors") {
    checkStemGolden("/fulltext/stem_nl.tsv",
      graft.functions.SnowballDutch.stem, 7800)
  }

  test("classic porter stemmer matches the reference on 11k golden vectors") {
    checkStemGolden("/fulltext/stem_porter.tsv",
      graft.functions.SnowballPorter.stem, 11000)
  }

  test("snowball finnish stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_fi.tsv",
      graft.functions.SnowballFinnish.stem, 8800)
  }

  test("snowball hungarian stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_hu.tsv",
      graft.functions.SnowballHungarian.stem, 8700)
  }

  test("snowball romanian stemmer matches the reference on 8k golden vectors") {
    checkStemGolden("/fulltext/stem_ro.tsv",
      graft.functions.SnowballRomanian.stem, 8500)
  }

  test("reference fulltext fixture derives reference-exact quads") {
    import org.apache.spark.sql.Encoders
    val stmts =
      Turtle.parseFile("/root/reference/data/fulltext-test.ttl") ++
        Turtle.parseFile("/root/reference/data/config-test.ttl")
    val flat = spark.createDataset(stmts.map { case (s, p, o) =>
      val (sk, sl) = s match {
        case Uri(v) => (1, v); case BNode(b) => (2, b); case _ => (0, "")
      }
      val pl = p match { case Uri(v) => v; case _ => "" }
      val (ok, ol, od, og) = o match {
        case Uri(v) => (1, v, "", "")
        case BNode(b) => (2, b, "", "")
        case Lit(lex, dt, lang) => (0, lex, dt, lang)
      }
      FlatQuad("urn:g:ft", sk, sl, pl, ok, ol, od, og)
    })(Encoders.product[FlatQuad]).toDF()

    // config statements route each predicate to its derivation kind
    val cfg = FullText.configFrom(flat)
    assert(cfg.metaphone === Set("http://www.w3.org/2000/01/rdf-schema#label"))
    assert(cfg.token === Set("http://example.org/text#token"))
    assert(cfg.stem === Set("http://example.org/text#stem"))

    val derived = FullText.derivedQuads(flat, cfg)
      .select("sLex", "pLex", "oLex").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

    val T = FullText.tokenPred
    val M = FullText.phoneticPred
    val S = FullText.stemPred
    // expected values computed by the reference's compiled kernels over
    // the fixture's tokens (TOKEN_BOUNDARY split, metaphones on the raw
    // token, stems on the lowercased token)
    val expected =
      // en1 rdfs:label "This should get turned into metaphones"@en-GB
      Set("0S", "TS", "XLT", "KT", "TRNT", "ANT", "MTFN")
        .map(c => ("ex:en1", M, c)) ++
      // en2/en3 ex:token literals, comma and period are boundaries
      Set("this", "should", "get", "tokenised").map(t => ("ex:en2", T, t)) ++
      Set("this", "should", "also", "get", "tokenised")
        .map(t => ("ex:en3", T, t)) ++
      // en4 ex:stem (no language tag -> english), \n is a boundary
      Set("this", "should", "get", "stem", "it", "has", "sever", "line")
        .map(s => ("ex:en4", S, s)) ++
      // @IT-gb -> italian, @ru -> russian, @de -> german — stems
      // computed by the reference's own compiled stemmers
      Set("ran", "mang", "le", "mosc", "ma", "non", "può", "vol")
        .map(s => ("ex:it", S, s)) ++
      Set("коров", "хайнак", "морфолог").map(s => ("ex:ru", S, s)) ++
      Set("all", "mensch", "sind", "frei", "und", "gleich", "an", "wurd",
        "recht", "gebor", "sie", "mit", "vernunft", "gewiss", "begabt",
        "soll", "einand", "im", "geist", "der", "bruder", "begegn")
        .map(s => ("ex:de", S, s))
    assert(derived === expected,
      s"missing=${expected -- derived}\nextra=${derived -- expected}")
  }

  test("fromFile applies text:index config carried by the import stream") {
    // the reference importer reads `<pred> text:index text:*` from its
    // config graph and emits derived quads on EVERY import
    // (import.c:706-760); the engine reads the same statements from the
    // imported stream itself — no programmatic setup
    val ttl = java.io.File.createTempFile("ftcfg", ".ttl")
    ttl.deleteOnExit()
    val w = new java.io.PrintWriter(ttl, "UTF-8")
    w.println("@prefix text: <http://4store.org/fulltext#> .")
    w.println("<urn:title> text:index text:token , text:stem .")
    w.println("<urn:d1> <urn:title> \"Database Query Engines\" .")
    w.println("<urn:d2> <urn:other> \"Unindexed Prose\" .")
    w.close()
    val st = QuadStore.fromFile(spark, ttl.getPath)
    def oLexOf(pred: Long): Set[(String, String)] = {
      import org.apache.spark.sql.functions.col
      val v = st.valued.get
      v.filter(col("p") === pred).select("sLex", "oLex").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }
    assert(oLexOf(FullText.tokenPredRid) ===
      Set("urn:d1" -> "database", "urn:d1" -> "query",
        "urn:d1" -> "engines"))
    // stems: default-english snowball over the lowercased tokens
    assert(oLexOf(FullText.stemPredRid) ===
      Set("urn:d1" -> "databas", "urn:d1" -> "queri",
        "urn:d1" -> "engin"))
    // unconfigured predicate and absent dmetaphone kind derive nothing
    assert(oLexOf(FullText.phoneticPredRid).isEmpty)
  }
}
