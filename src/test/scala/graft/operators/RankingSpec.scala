package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "spark joins data with hash joins"),        // 'joins' != 'join'
    (1L, "join join join elsewhere"),                // high tf, short
    (2L, "a very long document about nothing at all with many many " +
      "filler words and a single join somewhere in the middle"),
    (3L, "spark spark spark"),                       // other term only
    (4L, "no matching terms here"),
    (5L, "join spark")                               // both terms, tiny
  ).toDF("doc_id", "text")

  test("bm25: non-matching docs absent, all matches ranked") {
    val out = Ranking.bm25TopK(docs, "doc_id", "text",
        Seq("join", "spark"), k = 10)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    assert(out.map(_._2).toSet == Set(0L, 1L, 2L, 3L, 5L))
    assert(out.map(_._1) == (1 to out.size))
  }

  test("bm25: tf saturation and length normalization order sensibly") {
    val out = Ranking.bm25TopK(docs, "doc_id", "text",
        Seq("join"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // doc 1 (tf=3, short) must outrank doc 2 (tf=1, long)
    assert(out(1L) > out(2L))
    // doc 5 (tf=1, 2 tokens) must outrank doc 2 (tf=1, much longer)
    assert(out(5L) > out(2L))
    assert(!out.contains(0L)) // 'joins' is not 'join'
  }

  test("bm25 top-k truncates at k by score") {
    val out = Ranking.bm25TopK(docs, "doc_id", "text",
        Seq("join", "spark"), k = 2)
      .select("rank", "doc_id").as[(Int, Long)].collect().toSeq
    assert(out.size == 2)
    assert(out.map(_._1) == Seq(1, 2))
  }

  test("bm25 rank deterministic across reruns and partitionings") {
    val a = Ranking.bm25TopK(docs, "doc_id", "text",
      Seq("join", "spark"), k = 10).collect().toSeq
    val b = Ranking.bm25TopK(docs.repartition(7), "doc_id", "text",
      Seq("join", "spark"), k = 10)
      .collect().toSeq
    assert(a == b)
  }

  test("linear classifier score is exact and label thresholds at 0") {
    val out = TextAnalysis.linearScore(docs, "doc_id", "text",
        Seq("spark" -> 0.5, "join" -> 0.25), bias = -0.75)
      .select("doc_id", "n_hits", "score", "label")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 3: 3*0.5 - 0.75 = 0.75 -> positive
    assert(out(3L) == ((3L, 3L, 0.75, true)))
    // doc 4: no hits -> bias only
    assert(out(4L) == ((4L, 0L, -0.75, false)))
    // doc 5: 0.5 + 0.25 - 0.75 = 0.0 -> label true at exactly 0
    assert(out(5L) == ((5L, 2L, 0.0, true)))
    // doc 1: 3 'join' hits: 0.75 - 0.75 = 0
    assert(out(1L)._3 == 0.0)
  }

  test("inverted index: query path is bit-identical to the direct " +
      "path, including the score doubles") {
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Ranking.buildTextIndex(docs, "doc_id", "text", dir)
    for (terms <- Seq(Seq("join", "spark"), Seq("join"),
        Seq("nothing", "filler"), Seq("absentterm", "join"))) {
      val direct = Ranking.bm25TopK(docs, "doc_id", "text", terms, k = 10)
        .collect().map(_.toSeq).toSeq
      val viaIdx = Ranking.bm25TopKFromIndex(spark, dir, terms, k = 10)
        .collect().map(_.toSeq).toSeq
      assert(viaIdx == direct, s"terms $terms diverge")
    }
  }

  test("inverted index fails closed without its sidecar (interrupted " +
      "build is never silently queried)") {
    val dir = java.nio.file.Files.createTempDirectory("bm25bad").toString
    Ranking.buildTextIndex(docs, "doc_id", "text", dir)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir, "params.index.txt"))
    val e = intercept[IllegalArgumentException] {
      Ranking.bm25TopKFromIndex(spark, dir, Seq("join"), k = 5)
    }
    assert(e.getMessage.contains("params.index.txt"))
  }

  test("index append: build half + append half is bit-identical to a " +
      "fresh build of everything, and to the direct path") {
    val dirGrown = java.nio.file.Files
      .createTempDirectory("bm25grow").toString
    val dirFresh = java.nio.file.Files
      .createTempDirectory("bm25fresh").toString
    Ranking.buildTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dirGrown)
    Ranking.appendToTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", dirGrown, "drop1")
    Ranking.buildTextIndex(docs, "doc_id", "text", dirFresh)
    val terms = Seq("join", "spark")
    val grown = Ranking.bm25TopKFromIndex(spark, dirGrown, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    val fresh = Ranking.bm25TopKFromIndex(spark, dirFresh, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    val direct = Ranking.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .collect().map(_.toSeq).toSeq
    assert(grown == fresh, "append diverges from fresh build")
    assert(grown == direct, "append diverges from direct path")
    // restart replay: re-appending the SAME snapshot replaces its
    // partitions (dynamic overwrite), so results do not double-count
    Ranking.appendToTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", dirGrown, "drop1")
    val replayed = Ranking.bm25TopKFromIndex(spark, dirGrown, terms,
      k = 10).collect().map(_.toSeq).toSeq
    assert(replayed == direct, "same-snapshot re-append must be " +
      "idempotent")
    // a THIRD snapshot accumulates: the manifest read inside the
    // write lock must carry base+drop1 forward, not clobber them
    val extra = Seq((100L, "join spark join extra")).toDF(
      "doc_id", "text")
    Ranking.appendToTextIndex(extra, "doc_id", "text", dirGrown,
      "drop2")
    val all3 = Ranking.bm25TopKFromIndex(spark, dirGrown, terms, k = 10)
      .collect().map(_.toSeq).toSeq
    val direct3 = Ranking.bm25TopK(docs.unionByName(extra), "doc_id",
      "text", terms, k = 10).collect().map(_.toSeq).toSeq
    assert(all3 == direct3, "third append lost an earlier snapshot")
    // appending to a never-built dir fails closed (no silent bootstrap)
    val e = intercept[IllegalArgumentException] {
      Ranking.appendToTextIndex(docs, "doc_id", "text",
        java.nio.file.Files.createTempDirectory("bm25none").toString,
        "drop1")
    }
    assert(e.getMessage.contains("params.index.txt"))
    // a fresh build refuses a dir already holding an index
    val e2 = intercept[IllegalArgumentException] {
      Ranking.buildTextIndex(docs, "doc_id", "text", dirGrown)
    }
    assert(e2.getMessage.contains("already holds"))
    // writers are single-writer: a held lock refuses the append with
    // the holder's identity (the dedup-index lock discipline)
    val lock = java.nio.file.Paths.get(dirGrown, "lock")
    java.nio.file.Files.write(lock, "op=test holder".getBytes("UTF-8"))
    val e3 = intercept[IllegalStateException] {
      Ranking.appendToTextIndex(docs.filter(col("doc_id") === 0L),
        "doc_id", "text", dirGrown, "drop3")
    }
    assert(e3.getMessage.contains("locked by"))
    java.nio.file.Files.delete(lock)
  }

  test("soft quality filter: endpoints are deterministic, midband " +
      "keeps proportionally, seed re-draws") {
    val w = Seq("good" -> 0.5, "bad" -> -1.0)
    val many = (0L until 400L).map { i =>
      val t = if (i % 4 == 0) "good good good"      // score 1.5 -> p=1
      else if (i % 4 == 1) "bad text"               // score -1  -> p=0
      else "good only"                              // score 0.5 -> p=.5
      (i, t)
    }.toDF("doc_id", "text")
    val out = TextAnalysis.softQualityFilter(many, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(4)))).toMap
    (0L until 400L).foreach { i =>
      if (i % 4 == 0) assert(out(i) == ((1.5, true)), s"doc $i")
      else if (i % 4 == 1) assert(out(i) == ((-1.0, false)), s"doc $i")
    }
    // the p=0.5 band keeps roughly half (binomial over 200 docs)
    val mid = (0L until 400L).filter(i => i % 4 >= 2)
    val kept = mid.count(i => out(i)._2)
    assert(kept > 60 && kept < 140, s"p=0.5 band kept $kept of 200")
    // a different seed re-draws the midband, not the endpoints
    val out7 = TextAnalysis.softQualityFilter(many, "doc_id", "text", w,
        seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(mid.exists(i => out7(i) != out(i)._2))
    assert((0L until 400L).filter(_ % 4 == 0).forall(out7(_)))
    // deterministic under repartitioning
    val outRep = TextAnalysis.softQualityFilter(many.repartition(7),
        "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert((0L until 400L).forall(i => outRep(i) == out(i)._2))
  }
}
