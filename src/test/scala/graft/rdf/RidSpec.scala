package graft.rdf

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RidSpec extends SparkTestBase {
  import spark.implicits._

  test("plan-side and column-side RID hashing agree") {
    val uris = Seq("urn:t:nation:1", "http://example.org/a", "")
    val df = uris.toDF("u").select(Rid.uriCol(col("u")).as("rid"))
    assert(df.collect().map(_.getLong(0)).toSeq == uris.map(Rid.uri))
  }

  test("literal RIDs are salted by datatype and language") {
    val a = Rid.literal("5", Xsd.int)
    val b = Rid.literal("5", Xsd.string)
    val c = Rid.literal("5", lang = "en")
    val d = Rid.literal("5")
    assert(Set(a, b, c).size == 3)
    assert(b == d) // xsd:string == plain (RDF 1.1)
  }

  test("column literal RID matches scala literal RID incl. attr salt") {
    val rows = Seq(("5", Xsd.int, ""), ("chat", "", "fr"), ("x", "", ""))
    val df = rows.toDF("lex", "dt", "lang")
      .select(Rid.literalCol(col("lex"),
        Rid.attrCol(col("dt"), col("lang"))).as("rid"))
    val expect = rows.map { case (l, d, g) => Rid.literal(l, d, g) }
    assert(df.collect().map(_.getLong(0)).toSeq == expect)
  }

  test("tag bits partition the space; type tests work on Longs") {
    val u = Rid.uri("urn:x"); val b = Rid.bnode("b1"); val l = Rid.literal("v")
    val df = Seq(u, b, l).toDF("rid").select(
      Rid.isUriCol(col("rid")).as("isu"),
      Rid.isBNodeCol(col("rid")).as("isb"),
      Rid.isLiteralCol(col("rid")).as("isl"),
      Rid.typeRankCol(col("rid")).as("rank"))
    val r = df.collect()
    assert(r(0).getBoolean(0) && !r(0).getBoolean(1) && !r(0).getBoolean(2))
    assert(!r(1).getBoolean(0) && r(1).getBoolean(1) && !r(1).getBoolean(2))
    assert(!r(2).getBoolean(0) && !r(2).getBoolean(1) && r(2).getBoolean(2))
    assert(r.map(_.getInt(3)).toSeq == Seq(2, 1, 3))
  }

  test("NTriples line parser handles the grammar subset") {
    val l1 = NTriples.parseLine(
      """<urn:s> <urn:p> "hi \"there\""@en .""")
    assert(l1.contains((Uri("urn:s"), Uri("urn:p"),
      Lit("hi \"there\"", lang = "en"), None)))
    val l2 = NTriples.parseLine(
      """_:b1 <urn:p> "5"^^<http://www.w3.org/2001/XMLSchema#int> <urn:g> .""")
    assert(l2.contains((BNode("b1"), Uri("urn:p"),
      Lit("5", dt = Xsd.int), Some(Uri("urn:g")))))
    assert(NTriples.parseLine("# comment").isEmpty)
    assert(NTriples.parseLine("").isEmpty)
    assert(NTriples.parseLine("garbage line").isEmpty)
  }

  test("quad store from terms: quads and dictionary round-trip") {
    val st = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri(Rdf.typ), Uri("urn:T")),
      (Uri("urn:a"), Uri("urn:name"), Lit("Alice")),
      (Uri("urn:b"), Uri("urn:name"), Lit("Bob", lang = "en"))))
    assert(st.quads.count() == 3)
    // dictionary resolves the literal back
    val names = st.quads
      .filter(col("p") === Rid.uri("urn:name"))
      .join(st.resources, col("o") === col("rid"))
      .select("lex").as[String].collect().sorted.toSeq
    assert(names == Seq("Alice", "Bob"))
    // default graph rid present
    assert(st.quads.select("g").distinct().as[Long].head() ==
      WellKnown.defaultGraph)
  }

  test("dump to N-Quads and restore round-trips quads and values") {
    val st = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:name"), Lit("Ali\"ce\nX")),
      (Uri("urn:a"), Uri("urn:age"), Lit("42", dt = Xsd.integer)),
      (Uri("urn:b"), Uri("urn:name"), Lit("Bob", lang = "en")),
      (BNode("n1"), Uri("urn:p"), Uri("urn:o"))))
    val dir = java.nio.file.Files.createTempDirectory("dump").toString
    st.dumpNQuads(dir)
    val restored = QuadStore.fromNTriples(spark, dir)
    assert(restored.quads.count() == 4)
    // identical quad RID sets (term identity survives the round trip)
    val a = st.quads.select("g", "s", "p", "o")
    val b = restored.quads.select("g", "s", "p", "o")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // typed literal restored with its datatype attr
    val age = restored.quads
      .filter(col("p") === Rid.uri("urn:age"))
      .join(restored.resources, col("o") === col("rid"))
      .select("lex", "dt").collect().head
    assert(age.getString(0) == "42")
    assert(age.getLong(1) == Rid.uri(Xsd.integer))
  }
}
