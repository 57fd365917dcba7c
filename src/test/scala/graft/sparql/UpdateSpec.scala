package graft.sparql

import graft.SparkTestBase
import graft.rdf._
import org.apache.spark.sql.functions._

class UpdateSpec extends SparkTestBase {

  private def freshStore = QuadStore.fromTerms(spark, Seq(
    (Uri("urn:a"), Uri("urn:name"), Lit("Alice")),
    (Uri("urn:b"), Uri("urn:name"), Lit("Bob")),
    (Uri("urn:a"), Uri("urn:age"), Lit("30", Xsd.integer))))

  private def askTrue(st: QuadStore, q: String): Boolean =
    Sparql.run(st, spark, q).collect()(0).getBoolean(0)

  /** Drop a durable store's tables AND their warehouse directories — a
    * crashed prior run can leave a location with no catalog entry, which
    * blocks the next `saveAsTable`. */
  private def dropDurable(name: String): Unit = {
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    for (base <- Seq(s"${name}_quads", s"${name}_resources",
                     s"${name}_dels");
         t <- Seq(base, s"${base}__stage", s"${base}__old")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = wh.resolve(t).toFile
      if (dir.exists) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
  }

  test("INSERT DATA then ASK") {
    val st = Update(freshStore, spark,
      """INSERT DATA { <urn:c> <urn:name> "Carol" }""")
    assert(askTrue(st, """ASK { <urn:c> <urn:name> "Carol" }"""))
    assert(st.quads.count() == 4)
  }

  test("DELETE DATA removes exactly the ground quad") {
    val st = Update(freshStore, spark,
      """DELETE DATA { <urn:b> <urn:name> "Bob" }""")
    assert(!askTrue(st, """ASK { <urn:b> <urn:name> "Bob" }"""))
    assert(st.quads.count() == 2)
  }

  test("DELETE WHERE with pattern") {
    val st = Update(freshStore, spark,
      """DELETE WHERE { ?s <urn:name> ?n }""")
    assert(st.quads.count() == 1) // only the age triple remains
  }

  test("DELETE/INSERT WHERE rewrites matched rows") {
    val st = Update(freshStore, spark,
      """DELETE { ?s <urn:age> ?a } INSERT { ?s <urn:ageClass> "adult" }
        WHERE { ?s <urn:age> ?a FILTER(?a >= 18) }""")
    assert(!askTrue(st, "ASK { ?s <urn:age> ?a }"))
    assert(askTrue(st, """ASK { <urn:a> <urn:ageClass> "adult" }"""))
  }

  test("INSERT WHERE derives new triples") {
    val st = Update(freshStore, spark,
      """INSERT { ?s <urn:flagged> "yes" } WHERE { ?s <urn:name> ?n }""")
    assert(st.quads.count() == 5)
  }

  test("CLEAR GRAPH and CLEAR ALL") {
    val g2 = QuadStore.fromTerms(spark,
      Seq((Uri("urn:x"), Uri("urn:p"), Lit("v"))), graph = "urn:g2")
    val merged = freshStore.union(g2)
    val cleared = Update(merged, spark, "CLEAR GRAPH <urn:g2>")
    assert(cleared.quads.count() == 3)
    val all = Update(merged, spark, "CLEAR ALL")
    assert(all.quads.count() == 0)
  }

  test("ADD / COPY / MOVE between graphs") {
    val g2 = QuadStore.fromTerms(spark,
      Seq((Uri("urn:x"), Uri("urn:p"), Lit("v"))), graph = "urn:g2")
    val merged = freshStore.union(g2) // 3 default + 1 in g2
    val defaultUri = WellKnown.defaultGraphUri

    val added = Update.applyOp(merged, spark,
      Update.GraphCopy("ADD", Some("urn:g2"), None))
    assert(added.quads.count() == 5) // x/p/v now ALSO in default graph
    assert(added.quads.filter(col("g") === WellKnown.defaultGraph)
      .count() == 4)

    val moved = Update.applyOp(merged, spark,
      Update.GraphCopy("MOVE", None, Some("urn:g3")))
    assert(moved.quads.filter(col("g") === WellKnown.defaultGraph)
      .count() == 0)
    assert(moved.quads.filter(col("g") === Rid.uri("urn:g3")).count() == 3)

    val copied = Update.applyOp(merged, spark,
      Update.GraphCopy("COPY", None, Some("urn:g2")))
    assert(copied.quads.filter(col("g") === Rid.uri("urn:g2")).count() == 3)
  }

  test("INSERT WHERE with a property path in the WHERE clause") {
    val chain = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:x"), Uri("urn:next"), Uri("urn:y")),
      (Uri("urn:y"), Uri("urn:next"), Uri("urn:z"))))
    val st = Update(chain, spark,
      """INSERT { ?a <urn:reaches> ?b } WHERE { ?a <urn:next>+ ?b }""")
    assert(askTrue(st, """ASK { <urn:x> <urn:reaches> <urn:z> }"""))
    assert(st.quads.count() == 5) // 2 next + 3 closure pairs
  }

  test("DELETE WHERE with a subquery in the WHERE clause") {
    val st = Update(freshStore, spark,
      """DELETE { ?p <urn:name> ?n } WHERE {
           ?p <urn:name> ?n .
           { SELECT ?p WHERE { ?p <urn:age> ?a . FILTER(?a > 20) } } }""")
    assert(!askTrue(st, """ASK { <urn:a> <urn:name> ?n }"""))
    assert(askTrue(st, """ASK { <urn:b> <urn:name> "Bob" }"""))
  }

  test("sequential ops separated by ;") {
    val st = Update(freshStore, spark,
      """INSERT DATA { <urn:c> <urn:name> "Carol" } ;
         DELETE DATA { <urn:a> <urn:name> "Alice" }""")
    assert(st.quads.count() == 3)
  }

  test("LOAD SILENT on a missing file is a no-op") {
    val st = Update(freshStore, spark,
      "LOAD SILENT <file:///no/such/file.nt> INTO GRAPH <urn:gx>")
    assert(st.quads.count() == freshStore.quads.count())
    intercept[Exception] {
      Update(freshStore, spark,
        "LOAD <file:///no/such/file.nt>").quads.count()
    }
  }

  test("LOAD <file> INTO GRAPH imports with format auto-detection") {
    val g = "http://example.com/nasty.ttl"
    val st = Update(freshStore, spark,
      s"LOAD <file:///root/reference/data/nasty.ttl> INTO GRAPH <$g>")
    assert(st.quads.filter(col("g") === Rid.uri(g)).count() > 40)
    // loaded quads are queryable alongside the existing store
    val r = graft.sparql.Sparql.run(st, spark,
      """SELECT ?o WHERE { <foo:a> <foo:p> ?o }""").collect()
    assert(r.map(_.getString(0)).toSeq == Seq("p1"))
  }
  test("LOAD is a fresh document read each time: re-loading mints " +
      "distinct bnodes, never unifying with the earlier import") {
    val f = java.nio.file.Files.createTempFile("load_twice", ".nt")
    java.nio.file.Files.write(f,
      "_:obs <urn:val> \"1\" .\n".getBytes("UTF-8"))
    try {
      val once = Update(freshStore, spark,
        s"LOAD <file://$f> INTO GRAPH <urn:lg>")
      val twice = Update(once, spark,
        s"LOAD <file://$f> INTO GRAPH <urn:lg>")
      val n = graft.sparql.Sparql.run(twice, spark,
        """SELECT (COUNT(?b) AS ?n) WHERE {
             GRAPH <urn:lg> { ?b <urn:val> ?v } }""")
        .collect()(0).getString(0)
      assert(n == "2", s"expected 2 distinct observations, got $n")
    } finally java.nio.file.Files.deleteIfExists(f)
  }

  test("INSERT with GRAPH template targets that graph") {
    val st = Update(freshStore, spark,
      """INSERT { GRAPH <urn:g9> { ?s <urn:copyOf> ?n } }
         WHERE { ?s <urn:name> ?n }""")
    assert(askTrue(st, """ASK { GRAPH <urn:g9> { <urn:a> <urn:copyOf> "Alice" } }"""))
    // nothing landed in the default graph
    assert(st.quads.filter(col("g") === WellKnown.defaultGraph &&
      col("p") === Rid.uri("urn:copyOf")).count() == 0)
  }

  test("WITH scopes bare templates and the WHERE pattern") {
    val g2 = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:x"), Uri("urn:name"), Lit("Xu")),
      (Uri("urn:x"), Uri("urn:tag"), Lit("keep"))), graph = "urn:g2")
    val st = Update(freshStore.union(g2), spark,
      """WITH <urn:g2> DELETE { ?s <urn:name> ?n }
         INSERT { ?s <urn:renamed> ?n } WHERE { ?s <urn:name> ?n }""")
    // only g2's name triple was rewritten; the default graph kept its names
    assert(!askTrue(st, """ASK { GRAPH <urn:g2> { ?s <urn:name> ?n } }"""))
    assert(askTrue(st, """ASK { GRAPH <urn:g2> { <urn:x> <urn:renamed> "Xu" } }"""))
    assert(askTrue(st, """ASK { <urn:a> <urn:name> "Alice" }"""))
    assert(st.quads.filter(col("g") === WellKnown.defaultGraph &&
      col("p") === Rid.uri("urn:renamed")).count() == 0)
  }

  test("USING restricts the WHERE dataset like FROM") {
    val g2 = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:x"), Uri("urn:name"), Lit("Xu"))), graph = "urn:g2")
    val st = Update(freshStore.union(g2), spark,
      """INSERT { ?s <urn:seen> "yes" } USING <urn:g2>
         WHERE { ?s <urn:name> ?n }""")
    // only g2 subjects matched; default-graph names were out of scope
    assert(askTrue(st, """ASK { <urn:x> <urn:seen> "yes" }"""))
    assert(!askTrue(st, """ASK { <urn:a> <urn:seen> "yes" }"""))
  }

  test("DELETE WHERE with a GRAPH box deletes only from that graph") {
    val g2 = QuadStore.fromTerms(spark, Seq(
      (Uri("urn:a"), Uri("urn:name"), Lit("Alice"))), graph = "urn:g2")
    val st = Update(freshStore.union(g2), spark,
      """DELETE WHERE { GRAPH <urn:g2> { ?s <urn:name> ?n } }""")
    assert(!askTrue(st, """ASK { GRAPH <urn:g2> { ?s ?p ?o } }"""))
    assert(askTrue(st, """ASK { <urn:a> <urn:name> "Alice" }"""))
  }

  // ---- durable updates (reference backend writes,
  // src/backend/import-backend.c): update -> save -> reload round-trip

  test("durable INSERT appends to a saved store and survives reload") {
    dropDurable("durt1")
    freshStore.saveBucketed("durt1")
    Update.durable(spark, "durt1",
      """INSERT DATA { <urn:c> <urn:name> "Carol" }""")
    // a fresh load (new reader session) must see the insert
    val st = QuadStore.loadBucketed(spark, "durt1")
    val names = Sparql.run(st, spark,
      "SELECT ?n WHERE { ?s <urn:name> ?n } ORDER BY ?n")
      .collect().map(_.getString(0)).toSeq
    assert(names == Seq("Alice", "Bob", "Carol"))
  }

  test("durable DELETE/Modify rewrite via staging swap and survive reload") {
    dropDurable("durt2")
    freshStore.saveBucketed("durt2")
    Update.durable(spark, "durt2",
      """DELETE DATA { <urn:b> <urn:name> "Bob" }""")
    Update.durable(spark, "durt2",
      """INSERT { ?s <urn:greeting> ?n } WHERE { ?s <urn:name> ?n }""")
    val st = QuadStore.loadBucketed(spark, "durt2")
    assert(!askTrue(st, """ASK { <urn:b> <urn:name> "Bob" }"""))
    assert(askTrue(st, """ASK { <urn:a> <urn:greeting> "Alice" }"""))
    // deletes keep the dictionary (reference rhash behavior); the
    // resources table still resolves the remaining terms
    val rows = Sparql.run(st, spark,
      "SELECT ?p ?o WHERE { <urn:a> ?p ?o } ORDER BY ?p ?o")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows == Seq(("urn:age", "30"), ("urn:greeting", "Alice"),
      ("urn:name", "Alice")))
  }

  test("durable deletes tombstone, never rewrite; re-insert revives") {
    dropDurable("durt4")
    // big enough that one tombstone stays under the compaction threshold
    QuadStore.fromTerms(spark,
      (Uri("urn:b"), Uri("urn:name"), Lit("Bob")) +:
        Seq.tabulate(29)(i =>
          (Uri(s"urn:s$i"), Uri("urn:v"), Lit(i.toString, Xsd.integer))))
      .saveBucketed("durt4")
    val rawBefore = spark.table("durt4_quads").count()
    Update.durable(spark, "durt4",
      """DELETE DATA { <urn:b> <urn:name> "Bob" }""")
    // the quads table was NOT rewritten — the delete is a tombstone
    assert(spark.table("durt4_quads").count() == rawBefore)
    assert(spark.table("durt4_dels").count() == 1)
    assert(!askTrue(QuadStore.loadBucketed(spark, "durt4"),
      """ASK { <urn:b> <urn:name> "Bob" }"""))
    // re-inserting the tombstoned quad revives it (tombstone dropped,
    // no duplicate row appended)
    Update.durable(spark, "durt4",
      """INSERT DATA { <urn:b> <urn:name> "Bob" }""")
    assert(spark.table("durt4_quads").count() == rawBefore)
    assert(spark.table("durt4_dels").count() == 0)
    assert(askTrue(QuadStore.loadBucketed(spark, "durt4"),
      """ASK { <urn:b> <urn:name> "Bob" }"""))
  }

  test("compaction folds tombstones back into the quads table") {
    dropDurable("durt5")
    freshStore.saveBucketed("durt5")
    Update.durable(spark, "durt5",
      """DELETE DATA { <urn:b> <urn:name> "Bob" }""")
    // 1 tombstone / 3 rows > 10% -> maybeCompact already folded it in
    assert(!spark.catalog.tableExists("durt5_dels"))
    assert(spark.table("durt5_quads").count() == 2)
    assert(!askTrue(QuadStore.loadBucketed(spark, "durt5"),
      """ASK { <urn:b> <urn:name> "Bob" }"""))
  }

  test("transaction brackets updates; rollback discards, commit persists") {
    dropDurable("durt6")
    freshStore.saveBucketed("durt6")
    // rollback: nothing persists
    Update.begin(spark, "durt6")
      .update("""INSERT DATA { <urn:x> <urn:name> "Nope" }""")
      .rollback()
    assert(!askTrue(QuadStore.loadBucketed(spark, "durt6"),
      """ASK { <urn:x> <urn:name> "Nope" }"""))
    // batch of updates commits as ONE delta
    val tx = Update.begin(spark, "durt6")
      .update("""INSERT DATA { <urn:c> <urn:name> "Carol" }""")
      .update("""DELETE DATA { <urn:b> <urn:name> "Bob" }""")
    // uncommitted work is invisible to other readers
    assert(askTrue(QuadStore.loadBucketed(spark, "durt6"),
      """ASK { <urn:b> <urn:name> "Bob" }"""))
    tx.commit()
    val st = QuadStore.loadBucketed(spark, "durt6")
    assert(askTrue(st, """ASK { <urn:c> <urn:name> "Carol" }"""))
    assert(!askTrue(st, """ASK { <urn:b> <urn:name> "Bob" }"""))
  }

  test("durable CLEAR GRAPH drops only that graph durably") {
    dropDurable("durt3")
    val st0 = Update(freshStore, spark,
      """INSERT DATA { GRAPH <urn:g1> { <urn:x> <urn:name> "Xu" } }""")
    st0.saveBucketed("durt3")
    Update.durable(spark, "durt3", "CLEAR GRAPH <urn:g1>")
    val st = QuadStore.loadBucketed(spark, "durt3")
    assert(!askTrue(st, """ASK { GRAPH <urn:g1> { ?s ?p ?o } }"""))
    assert(askTrue(st, """ASK { <urn:a> <urn:name> "Alice" }"""))
  }

  test("second concurrent writer fails cleanly; stale lock is taken over") {
    dropDurable("durt5")
    freshStore.saveBucketed("durt5")
    val wh = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"))
    val lock = wh.resolve("durt5.__writer_lock")
    // a LIVE holder (this JVM's pid): the commit must refuse, not
    // interleave with the staged-rename dance
    java.nio.file.Files.write(lock,
      ProcessHandle.current().pid().toString.getBytes("UTF-8"))
    val e = intercept[IllegalStateException] {
      Update.durable(spark, "durt5",
        """INSERT DATA { <urn:c> <urn:name> "Carol" }""")
    }
    assert(e.getMessage.contains("durt5"))
    java.nio.file.Files.deleteIfExists(lock)
    // a STALE holder (dead pid, crashed writer): taken over silently
    java.nio.file.Files.write(lock, "999999999".getBytes("UTF-8"))
    Update.durable(spark, "durt5",
      """INSERT DATA { <urn:d> <urn:name> "Dan" }""")
    assert(askTrue(QuadStore.loadBucketed(spark, "durt5"),
      """ASK { <urn:d> <urn:name> "Dan" }"""))
    // the lock is released after a successful commit
    assert(!java.nio.file.Files.exists(lock))
  }

}
