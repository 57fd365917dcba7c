package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Byte-pair-encoding subword tokenizer: corpus-trained merges, applied
  * distributed.
  *
  * The industrial shape for BPE at corpus scale (what tokenizer trainers
  * do over web-scale text): training never iterates over the corpus —
  * one distributed word-count aggregation (map-side combined) reduces
  * 100 TB of text to a word-frequency table bounded by `maxWords`, which
  * is collected and trained on the driver in O(vocab × merges). Encoding
  * is a map-only pass: the merge ranks broadcast to every executor, each
  * partition memoizes word → pieces (word frequencies are Zipfian, so
  * the memo hit rate approaches 1), and no shuffle touches the text.
  */
object Bpe {

  /** End-of-word sentinel appended to each word's symbol sequence, so a
    * word-final piece ("ing</w>") is distinct from a word-internal one. */
  val EndOfWord = "</w>"

  /** Distributed word-frequency table: lowercase whitespace words,
    * top-`maxWords` by (count desc, word asc) — the deterministic
    * truncation making training reproducible run-to-run. */
  def wordCounts(df: DataFrame, textCol: String,
                 maxWords: Int): Seq[(String, Long)] =
    df.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Train `numMerges` merges from a word-frequency table: classic BPE
    * (Sennrich et al. 2016) — repeatedly merge the most frequent
    * adjacent symbol pair, ties broken lexicographically so training is
    * deterministic. Driver-side by design: the input is the aggregated
    * vocabulary, not the corpus. */
  def trainFromCounts(counts: Seq[(String, Long)],
                      numMerges: Int): Seq[(String, String)] = {
    // each word as a mutable symbol vector: chars + EndOfWord
    val words = counts.map { case (w, n) =>
      (mutable.ArrayBuffer(w.map(_.toString): _*) += EndOfWord, n)
    }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    while (iter < numMerges) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (pairCounts.isEmpty) iter = numMerges
      else {
        val best = pairCounts.toSeq
          .maxBy { case ((a, b), n) => (n, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))._1
        merges += best
        val joined = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = joined; syms.remove(i + 1)
            } else i += 1
          }
        }
        iter += 1
      }
    }
    merges.toSeq
  }

  /** One-call training: word counts (one shuffle) then driver merges. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000): Seq[(String, String)] =
    trainFromCounts(wordCounts(df, textCol, maxWords), numMerges)

  /** Segment one word with the trained merges: start from characters +
    * EndOfWord and always apply the lowest-rank applicable merge — the
    * standard BPE inference rule. */
  def segmentWord(word: String,
                  rank: collection.Map[(String, String), Int]): List[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms.toList
  }

  /** Frozen merge table for the ORACLE-GATED encode path (p27): trained
    * ONCE from the driver corpus (sf0.01 `documents.text`,
    * `numMerges = 200`, `maxWords = 50000`) via the deterministic
    * [[trainFromCounts]] and committed as a resource, so a SQL oracle
    * can replicate the encode against the same table as a literal
    * relation. Training itself stays corpus-driven and spec-gated
    * (BpeSpec, [[train]]); this freeze exists because an oracle query
    * is a static string and cannot re-run the iterative argmax.
    * Regenerate with `graft.BpeFreeze` if the driver corpus changes. */
  lazy val canonicalMerges: Seq[(String, String)] = {
    val in = getClass.getResourceAsStream("/graft/bpe_canonical_merges.tsv")
    require(in != null, "bpe_canonical_merges.tsv resource missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { l =>
      val t = l.split("\t", 2)
      (t(0), t(1))
    }.toList
    finally src.close()
  }

  /** Distributed encode: (id, tokens, n_tokens) per document. Map-only —
    * merge ranks ride a broadcast variable; each partition keeps a word
    * memo so repeated words (the overwhelming majority under Zipf) cost
    * one hash lookup. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap)
    df.select(col(idCol).cast("long").as("id"),
        lower(col(textCol)).as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val rank = bc.value
        val memo = mutable.HashMap.empty[String, List[String]]
        it.map { case (id, t) =>
          val toks = t.split("\\s+").iterator.filter(_.nonEmpty)
            .flatMap(w => memo.getOrElseUpdate(w, segmentWord(w, rank)))
            .toArray
          (id, toks, toks.length.toLong)
        }
      }
      .toDF("id", "tokens", "n_tokens")
  }
}
