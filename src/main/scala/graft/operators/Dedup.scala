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

  /** k-word shingles of a text column (distinct). */
  def shingles(text: Column, k: Int): Column = {
    val ws = words(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(ws) - k, lit(0))),
        i => concat_ws(" ", slice(ws, i + 1, lit(k)))))
  }

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
    array(seeds.map { case (a, b) =>
      array_min(transform(sh,
        s => pmod(pmod(xxhash64(s), lit(p)) * lit(a) + lit(b), lit(p))))
    }: _*)
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
                   threshold: Double = 0.5): DataFrame = {
    val rows = h / bands
    val sig = df.select(col(idCol).as("id"),
      minhash(shingles(col(textCol), k), h).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = banded.select(col("band"), col("bucket"),
      col("id").as("id1"), col("sig").as("sig1"))
    val r = banded.select(col("band"), col("bucket"),
      col("id").as("id2"), col("sig").as("sig2"))
    val cand = l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2", "sig1", "sig2").distinct()
    cand.withColumn("est_jaccard",
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
    * Only pairs sharing >= 1 shingle are ever materialized. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol).as("id"),
      shingles(col(textCol), k).as("sh"))
      .withColumn("nsh", size(col("sh")))
    val inv = sh.select(col("id"), col("nsh"), explode(col("sh")).as("s"))
    val l = inv.select(col("s"), col("id").as("id1"), col("nsh").as("n1"))
    val r = inv.select(col("s"), col("id").as("id2"), col("nsh").as("n2"))
    l.join(r, "s").filter(col("id1") < col("id2"))
      .groupBy("id1", "id2", "n1", "n2")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double") /
        (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }
}
