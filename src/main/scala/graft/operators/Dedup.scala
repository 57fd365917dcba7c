package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication operators for large-scale text corpora.
  *
  * All variants are pure DataFrame programs (codegen'd higher-order array
  * functions, no UDFs) and scale by construction: the only shuffles are the
  * final groupBy/join on compact keys; candidate generation is LSH-style
  * (band buckets), never an all-pairs product.
  */
object Dedup {

  /** Exact dedup: keep one representative (min of `keep`) per identical
    * value of `on`. One hash-shuffle; at 100 TB this is the cheapest
    * possible full-corpus pass. */
  def exact(df: DataFrame, on: Column, keep: Column): DataFrame = {
    val w = Window.partitionBy(on).orderBy(keep)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Lower-cased word array of a text column. */
  private def words(text: Column): Column =
    filter(split(lower(text), "\\s+"), w => length(w) > 0)

  /** k-word shingle array from a MATERIALIZED word-array column (distinct,
    * full k-word windows only: fewer than k words -> no shingles).
    *
    * `ws` must be an attribute reference, not an expression: HOF lambdas
    * are interpreted, and an embedded expression would be re-evaluated per
    * array element (the 55x minhash regression, commit 8cb6d50). */
  def shingleArray(ws: Column, k: Int): Column =
    when(size(ws) < k, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(ws) - k),
          i => concat_ws(" ", slice(ws, i + 1, lit(k))))))

  /** k-word shingles of a text column. Convenience for small/test inputs;
    * the scaling path is [[shingleRows]], which materializes the word
    * array behind a shuffle barrier first. */
  def shingles(text: Column, k: Int): Column = shingleArray(words(text), k)

  /** MinHash signature: H minimums of independent permutations
    * h_i(x) = (a_i * xxhash64(x) + b_i) mod p over the shingle set.
    * Deterministic seeds; array-typed column, fully codegen. */
  def minhash(sh: Column, h: Int): Column = {
    // 31-bit modulus keeps a*h+b within a long under ANSI arithmetic
    val p = 2147483647L // 2^31 - 1 (Mersenne prime)
    val seeds = (0 until h).map { i =>
      (((0x9E3779B97F4A7C15L * (i + 1)) & 0x7FFFFFFFL) | 1L,
        (0x7F4A7C159E3779B9L * (i + 7)) & 0x7FFFFFFFL)
    }
    // hash each shingle string ONCE; the h permutations are then pure
    // long arithmetic over the hashed array (h x cheaper than re-hashing
    // strings per permutation)
    val hashed = transform(sh, s => pmod(xxhash64(s), lit(p)))
    array(seeds.map { case (a, b) =>
      array_min(transform(hashed,
        x => pmod(x * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  /** (id, shingle) rows: materialize the word array, repartition (a tiny
    * shuffle of the raw docs that both blocks Catalyst from inlining the
    * word-array expression into the interpreted shingle lambda and spreads
    * single-file inputs over all cores), then shingle + explode in-row.
    * Shingles are distinct per document (set semantics). */
  def shingleRows(df: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // explode_outer, NOT explode: InferFiltersFromGenerate would turn a
    // plain explode into a `size(shingles) > 0` scan filter whose
    // interpreted HOF re-evaluates split() per array element — O(words^2)
    // per document (observed 7x slowdown). Outer explode infers nothing;
    // the cheap IS NOT NULL below drops shingle-less docs instead.
    df.select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .repartition(par)
      .select(col("id"), explode_outer(shingleArray(col("ws"), k)).as("s"))
      .filter(col("s").isNotNull)
  }

  /** MinHash signatures via explode + 32 codegen'd min-aggregates.
    *
    * NOT the nested-HOF formulation: array HOF lambdas are interpreted and
    * Catalyst does not share the common shingle/hash subexpression across
    * the h permutations, which recomputes string hashing h times per
    * shingle (measured 115s for 5k docs). Exploding shingle rows hashes
    * each shingle once in whole-stage codegen, and the h permutations are
    * h parallel min() aggregates with map-side partial aggregation —
    * the formulation that scales on a cluster as well.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int, h: Int): DataFrame = {
    val p = 2147483647L
    val seeds = (0 until h).map { i =>
      (((0x9E3779B97F4A7C15L * (i + 1)) & 0x7FFFFFFFL) | 1L,
        (0x7F4A7C159E3779B9L * (i + 7)) & 0x7FFFFFFFL)
    }
    // duplicates don't affect min() -> no distinct needed
    val hashed = shingleRows(df, idCol, textCol, k)
      .select(col("id"), pmod(xxhash64(col("s")), lit(p)).as("h0"))
    val aggs = seeds.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h0") * lit(a) + lit(b), lit(p))).as(s"m$i")
    }
    hashed.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until h).map(i => col(s"m$i")): _*)
        .as("sig"))
  }

  /** Candidate near-duplicate pairs via banded MinHash-LSH:
    * split the H-length signature into `bands` bands, bucket-join on
    * (band index, band hash), then estimate Jaccard as the fraction of
    * matching signature positions and keep pairs >= threshold.
    *
    * Returns (id1, id2, est_jaccard) with id1 < id2.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, h: Int = 32, bands: Int = 16,
                   threshold: Double = 0.5, minBands: Int = 1): DataFrame = {
    val rows = h / bands
    val sig = minhashSignatures(df, idCol, textCol, k, h).cache()
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    // dedupe candidates on compact (id1, id2) keys only, then fetch the
    // two signatures back with joins — signatures never ride the
    // bucket-join shuffle
    // minBands > 1 demands collisions in several independent bands before
    // a pair reaches signature verification — on low-entropy corpora this
    // prunes the random-collision tail by orders of magnitude while
    // keeping high-similarity pairs (which collide almost everywhere)
    val cand = banded.select(col("band"), col("bucket"),
        col("id").as("id1"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id2")),
        Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= minBands)
      .select("id1", "id2")
    cand
      .join(sig.select(col("id").as("id1"), col("sig").as("sig1")), "id1")
      .join(sig.select(col("id").as("id2"), col("sig").as("sig2")), "id2")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig1"), col("sig2"), _ === _),
          x => x)).cast("double") / h)
      .filter(col("est_jaccard") >= threshold)
      .select("id1", "id2", "est_jaccard")
  }

  /** 64-bit SimHash over word hashes: per-bit majority vote. Computed as
    * 64 codegen'd sum aggregates over exploded words (no UDAF). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val wordRows = df.select(col(idCol).as("id"),
        explode(words(col(textCol))).as("w"))
      .select(col("id"), xxhash64(col("w")).as("h"))
      .withColumn("cnt", lit(1))
    val bitSums = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"b$b"))
    val agg = wordRows.groupBy("id")
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") * 2 > col("n"), shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("id"), sim.as("simhash"))
  }

  /** Near-dup pairs by SimHash: LSH on 4 16-bit chunks (a pair within
    * Hamming distance <= maxHamming shares at least one chunk when
    * maxHamming < 4), verified with bit_count(xor). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 6): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val chunked = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("simhash"), c * 16)
          .bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val l = chunked.select(col("chunk"), col("key"),
      col("id").as("id1"), col("simhash").as("h1"))
    val r = chunked.select(col("chunk"), col("key"),
      col("id").as("id2"), col("simhash").as("h2"))
    l.join(r, Seq("chunk", "key"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard similarity join via inverted index:
    * explode distinct shingles, self-join on shingle (the index), count
    * common shingles per pair, Jaccard = common / (|A| + |B| - common).
    * Only pairs sharing >= 1 shingle are ever materialized.
    *
    * Shuffle-minimal shape: the distinct shingle set AND its size are
    * computed in-row (array HOF, one pass per document — no window sort,
    * no distinct shuffle, no counts join), and shingles are collapsed to
    * 64-bit hashes so the single real shuffle (the inverted-index
    * self-join) moves longs, not strings. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // explode_outer for the same InferFiltersFromGenerate reason as
    // shingleRows; empty-shingle docs can't reach the join anyway
    val inv = df
      .select(col(idCol).as("id"), words(col(textCol)).as("ws"))
      .repartition(par)
      .select(col("id"), shingleArray(col("ws"), k).as("sh"))
      .select(col("id"), size(col("sh")).as("nsh"),
        explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .select(col("id"), col("nsh"), xxhash64(col("s")).as("h"))
    val l = inv.select(col("h"), col("id").as("id1"), col("nsh").as("n1"))
    val r = inv.select(col("h"), col("id").as("id2"), col("nsh").as("n2"))
    l.join(r, "h").filter(col("id1") < col("id2"))
      .groupBy("id1", "id2", "n1", "n2")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }
}
