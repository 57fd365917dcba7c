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
}
