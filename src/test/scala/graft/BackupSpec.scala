package graft

import graft.rdf._
import org.apache.spark.sql.functions._

class BackupSpec extends SparkTestBase {

  test("dump writes one ## GRAPH file per graph; restore round-trips") {
    val st = QuadStore.fromQuadTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:name"), Lit("Ali\"ce"), None),
      (Uri("urn:b"), Uri("urn:age"), Lit("41", dt = Xsd.integer),
        Some("urn:g1")),
      (Uri("urn:b"), Uri("urn:label"), Lit("bé", lang = "fr"),
        Some("urn:g1")),
      (Uri("urn:c"), Uri("urn:p"), Uri("urn:o"), Some("urn:g2"))))

    val dir = java.nio.file.Files.createTempDirectory("graft_bk").toString
    val dumped = BackupCli.dump(st, dir)
    assert(dumped.map(_._1).toSet ==
      Set(WellKnown.defaultGraphUri, "urn:g1", "urn:g2"))
    // reference layout: file per graph, md5 name, ## GRAPH header
    val g1 = dumped.toMap.apply("urn:g1")
    assert(g1.endsWith(BackupCli.md5hex("urn:g1") + ".nt"))
    val src = scala.io.Source.fromFile(g1, "UTF-8")
    val lines = try src.getLines().toList finally src.close()
    assert(lines.head == "## GRAPH urn:g1")
    assert(lines.tail.size == 2 && lines.tail.forall(_.endsWith(" .")))

    val back = BackupCli.restore(spark, dir)
    assert(back.quads.count() == 4)
    // per-graph content identical after the round trip
    def key(s: QuadStore) = s.resolve(s.quads, Seq("g", "s", "p", "o"))
      .select("g__lex", "s__lex", "p__lex", "o__lex", "o__dt", "o__lang")
      .collect().map(_.toString).toSet
    assert(key(back) == key(st))
  }
}
