package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: sequence
  * packing (concat-and-chunk), per-group token-budget sampling, and
  * deterministic seeded sharding. All are built from windowed scans —
  * no joins beyond a broadcast of per-chunk prefix sums — so they run
  * as one shuffle (or none) at 100 TB.
  */
object Curation {

  /** Concat-and-chunk sequence packing: documents are laid out in
    * `idCol` order on a single virtual token tape, which is then cut
    * into fixed-`capacity` bins — exactly how pretraining pipelines
    * pack documents into context windows. Emits each document's bin id
    * and offset within the bin's tape segment.
    *
    * The global running sum is computed scalably in two passes: a
    * partition-local cumulative sum per id-chunk, plus a broadcast
    * prefix over the (tiny: one row per `chunkSize` ids) chunk totals.
    * No single-partition window ever sees the full corpus, so the
    * operator holds at 1000 executors; the only global barrier is the
    * chunk-totals aggregate (#chunks rows).
    *
    * `idCol` must be non-negative and numeric (the chunk key is
    * `id / chunkSize`); ids need not be dense.
    */
  def packSequences(df: DataFrame, idCol: String, lenCol: String,
                    capacity: Long, chunkSize: Long = 1 << 16): DataFrame = {
    val chunk = (col(idCol) / lit(chunkSize)).cast("long")
    val local = df.withColumn("_chunk", chunk)
      .withColumn("_local_cum",
        sum(col(lenCol)).over(Window.partitionBy("_chunk").orderBy(idCol)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefixes = df.groupBy(chunk.as("_chunk"))
      .agg(sum(col(lenCol)).as("_tot"))
      .withColumn("_prefix",
        coalesce(sum(col("_tot")).over(Window.orderBy("_chunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_chunk", "_prefix")
    val start = (col("_prefix") + col("_local_cum") - col(lenCol))
      .cast("long")
    local.join(broadcast(prefixes), "_chunk")
      .withColumn("bin_id", floor(start / lit(capacity)).cast("long"))
      .withColumn("bin_offset", (start % lit(capacity)).cast("long"))
      .drop("_chunk", "_local_cum", "_prefix")
  }

  /** Token-budget mixture sampling: within each `groupCol` (language,
    * source, domain …) take documents in a deterministic seeded-random
    * order until the group's cumulative `lenCol` reaches `budget` —
    * whole documents only. This is how a training mix is drawn to hit
    * per-domain token quotas.
    *
    * The per-group running sum uses the same two-pass shape as
    * [[packSequences]], NOT a `Window.partitionBy(group)` over the raw
    * corpus — that would put one giant domain ("web" at 80% of a 100 TB
    * mix) on ONE task. The seeded order key is an md5 hex string, so its
    * leading 3 hex chars are an order-preserving 4096-way chunking:
    * sorting by (chunk, key) equals sorting by key. Pass 1 cumsums
    * within (group, chunk); pass 2 prefixes the per-(group, chunk)
    * totals — ≤4096 rows per group — and broadcasts them back.
    */
  def budgetSample(df: DataFrame, groupCol: String, idCol: String,
                   lenCol: String, budget: Long, seed: Int = 42): DataFrame = {
    val key = shuffleKey(col(idCol), seed)
    val chunkC = substring(key, 1, 3)
    val local = df.withColumn("_key", key).withColumn("_kchunk", chunkC)
      .withColumn("_local_cum", sum(col(lenCol)).over(
        Window.partitionBy(groupCol, "_kchunk").orderBy("_key")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefixes = df.withColumn("_kchunk", chunkC)
      .groupBy(groupCol, "_kchunk").agg(sum(col(lenCol)).as("_tot"))
      .withColumn("_prefix", coalesce(sum(col("_tot")).over(
        Window.partitionBy(groupCol).orderBy("_kchunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol).as("_pg"), col("_kchunk"), col("_prefix"))
    local.join(broadcast(prefixes),
        col(groupCol) === col("_pg") && local("_kchunk") === prefixes("_kchunk"))
      .filter((col("_prefix") + col("_local_cum")).cast("long") <= budget)
      .drop("_key", "_kchunk", "_local_cum", "_pg", "_prefix")
  }

  /** Deterministic seeded shuffle into `shards` output shards with a
    * stable position inside each shard — the "shuffle then write shard
    * files" step of a training pipeline, reproducible across runs and
    * engines. Shard = 60 bits of md5(id:seed) mod `shards`; position =
    * rank of the full digest within the shard. Windows are partitioned
    * by shard (at 100 TB use shards ≈ executors×10; no global sort).
    */
  def seededShuffle(df: DataFrame, idCol: String, shards: Int,
                    seed: Int = 42): DataFrame = {
    val hex = shuffleKey(col(idCol), seed)
    // first 15 hex chars = 60 bits: fits a signed long in both Spark
    // (conv) and the DuckDB oracle (::UBIGINT::BIGINT)
    val shard = (conv(substring(hex, 1, 15), 16, 10).cast("long")
      % shards).cast("int")
    df.withColumn("shard", shard)
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(hex)).cast("long"))
  }

  /** md5 hex of "id:seed" — the portable ordering key shared with the
    * DuckDB oracle (md5(id::VARCHAR || ':seed')). */
  def shuffleKey(id: Column, seed: Int): Column =
    md5(concat(id.cast("string"), lit(":" + seed)).cast("binary"))

  /** Per-group frequency capping: keep at most `maxPerGroup` rows of
    * each group, selected by the seeded shuffle order — the "domain
    * cap" of crawl curation (no single source may dominate the corpus),
    * deterministic across runs and engines. Exactly [[budgetSample]]
    * with unit length, so it inherits the chunked two-pass rank: no
    * whole-group window sort, a mega-domain costs the same per-chunk
    * windows as anyone else. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  maxPerGroup: Long, seed: Int = 42): DataFrame =
    budgetSample(df.withColumn("_one", lit(1L)), groupCol, idCol,
      "_one", budget = maxPerGroup, seed = seed).drop("_one")

  /** Leakage-safe train/val/test split: every row of a group lands in
    * the SAME split, so near-identical documents sharing a group key
    * (source domain, or a near-dup component id from
    * [[Dedup.connectedComponents]]) can never straddle train and eval.
    * Assignment is a pure function of the group key — md5 bucket in
    * millionths against cumulative weight thresholds — so the pass is
    * map-only codegen: no shuffle, no join, no state; at 100 TB the
    * split costs one projection over the corpus, and adding data later
    * never reassigns an existing group. */
  def leakageSafeSplit(df: DataFrame, groupCol: String,
                       weights: Seq[(String, Double)],
                       seed: Int = 42): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = conv(substring(shuffleKey(col(groupCol), seed), 1, 15),
      16, 10).cast("long") % 1000000L
    var acc = 0.0
    val cuts = weights.init.map { case (name, w) =>
      acc += w / total; (name, (acc * 1e6).toLong)
    }
    val split = cuts.foldRight(lit(weights.last._1): Column) {
      case ((name, cut), rest) => when(bucket < cut, name).otherwise(rest)
    }
    df.withColumn("split", split)
  }

  /** Deterministic stratified sample: exactly min(k, |group|) rows per
    * group, chosen by seeded md5 order — the reproducible per-stratum
    * eval-slice / inspection draw. Output adds `rank` (1-based within
    * the group's seeded order).
    *
    * Scale: the global per-group rank uses the same (group, md5-prefix
    * chunk) two-pass scheme as [[budgetSample]] — a local row_number
    * within each 4096-way chunk plus a broadcast prefix of per-chunk
    * counts — so no window ever sees a whole group on one task. */
  /** Shared two-pass chunked seeded rank: every row's 1-based position
    * within its group under the seeded md5 order, WITHOUT a one-task-
    * per-group window — ranks are computed per (group, 3-hex-digit key
    * chunk) and shifted by broadcast per-chunk prefix counts (the same
    * shape as [[budgetSample]]'s cumulative sums). Adds `_key` (the md5
    * order key) and `rank`. */
  private def seededGroupRank(df: DataFrame, groupCol: String,
                              idCol: String, seed: Int): DataFrame = {
    val key = shuffleKey(col(idCol), seed)
    val chunkC = substring(key, 1, 3)
    val local = df.withColumn("_key", key).withColumn("_kchunk", chunkC)
      .withColumn("_lrn", row_number().over(
        Window.partitionBy(groupCol, "_kchunk").orderBy("_key"))
        .cast("long"))
    val prefixes = df.withColumn("_kchunk", chunkC)
      .groupBy(groupCol, "_kchunk").agg(count(lit(1)).as("_cnt"))
      .withColumn("_prefix", coalesce(sum(col("_cnt")).over(
        Window.partitionBy(groupCol).orderBy("_kchunk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(groupCol).as("_pg"), col("_kchunk"), col("_prefix"))
    local.join(broadcast(prefixes),
        col(groupCol) === col("_pg") &&
          local("_kchunk") === prefixes("_kchunk"))
      .withColumn("rank", (col("_prefix") + col("_lrn")).cast("long"))
      .drop("_kchunk", "_lrn", "_pg", "_prefix")
  }

  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       k: Int, seed: Int = 42): DataFrame = {
    require(k > 0, "k must be positive")
    seededGroupRank(df, groupCol, idCol, seed)
      .filter(col("rank") <= k)
      .drop("_key")
  }

  /** Deterministic cross-domain interleaving — the training-order pass:
    * reading the corpus in `(grp_rank, ord_in_rank)` order cycles
    * through the domains (one seeded-random row per domain, then the
    * next row of each, ...), so a sequential trainer never sees a long
    * single-domain run regardless of how the corpus was written.
    *
    * `grp_rank` is the row's seeded position within its own group
    * ([[seededGroupRank]] — two-pass chunked, no per-group task);
    * `ord_in_rank` breaks ties WITHIN one rank slice by the seeded md5
    * key (a slice holds at most one row per group, so its row_number
    * window is bounded by the domain count, never by data volume).
    * Deterministic for a fixed (corpus, seed); append-stable per group.
    */
  def interleave(df: DataFrame, groupCol: String, idCol: String,
                 seed: Int = 42): DataFrame =
    seededGroupRank(df, groupCol, idCol, seed)
      .withColumnRenamed("rank", "grp_rank")
      .withColumn("ord_in_rank", row_number().over(
        Window.partitionBy("grp_rank").orderBy("_key")).cast("long"))
      .drop("_key")

  /** Temperature-based domain mixture sampling: resample a corpus so
    * domain `d` contributes ∝ count_d^T of the output, the exponential
    * smoothing used to rebalance multi-domain/multilingual pretraining
    * mixes (T=1 keeps natural proportions, T→0 approaches uniform).
    * Each row is emitted `floor(rate_d)` times plus one more when its
    * seeded md5 bucket falls under the fractional part — deterministic
    * down-sampling of over-represented domains AND replication-based
    * up-sampling of rare ones, reproducible across runs and engines.
    *
    * Output: input columns + `copy` (0-based replica index).
    *
    * Scale: per-domain rates come from one tiny groupBy-count (domains
    * are few by construction) broadcast back; the emit pass is map-side
    * explode with no shuffle, so the operator costs one aggregate plus
    * one scan at 100 TB. */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String,
                     temperature: Double, targetRows: Long,
                     seed: Int = 42): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    val counts = df.groupBy(groupCol)
      .agg(count(lit(1)).cast("double").as("_cnt"))
      .withColumn("_pw", pow(col("_cnt"), temperature))
    val tot = counts.agg(sum(col("_pw")).as("_tot"))
    val rates = counts.crossJoin(tot)
      .select(col(groupCol).as("_rg"),
        (lit(targetRows.toDouble) * col("_pw") / col("_tot") / col("_cnt"))
          .as("_rate"))
    val bucket = conv(substring(shuffleKey(col(idCol), seed), 1, 15),
      16, 10).cast("long") % 1000000L
    val nCopies = (floor(col("_rate")) +
      when(bucket < floor((col("_rate") - floor(col("_rate"))) * 1e6), 1L)
        .otherwise(0L)).cast("long")
    df.join(broadcast(rates), col(groupCol) === col("_rg"))
      .withColumn("_n", nCopies)
      .withColumn("copy",
        explode(when(col("_n") > 0, sequence(lit(0L), col("_n") - 1))
          .otherwise(array().cast("array<long>"))))
      .drop("_rg", "_rate", "_n")
  }

  /** PII redaction: mask email addresses and long digit runs (ids,
    * phone-like numbers). Pure map-side regex pass — codegen'd, no
    * shuffle. Patterns are deliberately RE2-compatible so the same
    * redaction runs in other engines.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val numRe = "[0-9]{4,}"

  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, emailRe, "<EMAIL>"),
      numRe, "<NUM>")

  /** Count of PII spans that [[redactPii]] would mask (emails counted
    * before digit runs so overlaps are not double-counted). */
  def piiCount(text: Column): Column = {
    val noEmail = regexp_replace(text, emailRe, " ")
    (size(regexp_extract_all(text, lit(emailRe), lit(0))) +
      size(regexp_extract_all(noEmail, lit(numRe), lit(0)))).cast("long")
  }
}
