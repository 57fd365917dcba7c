package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed —
  * the manual complement to AQE's skew-join splitting (which only fires
  * on sort-merge joins above its thresholds, and cannot help when one
  * hot key dominates a whole executor).
  *
  * `saltedJoin` replicates the BUILD side `salts` times (each copy tagged
  * with a salt value) and scatters the PROBE side uniformly across the
  * salt range, so one hot key's rows spread over `salts` reducers instead
  * of one. Classic fact-to-dim salting: dim rows are duplicated
  * (dim × salts is small), fact rows are not. Results are identical to
  * the plain join — the salt column is an equi-join refinement, never a
  * filter.
  */
object Skew {

  /** Equi-join of `probe` and `build` on `key`, salted `salts` ways.
    * `build` (the smaller/replicable side) is exploded once per salt;
    * `probe` rows pick a deterministic pseudo-random salt. Only inner and
    * left-side join types are allowed: an unmatched BUILD row exists once
    * per salt copy, so right/full outer joins would duplicate it. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types only, got $joinType")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts))
        .cast("int"))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    p.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Top-N key frequencies of `df(key)` — the cheap skew probe to decide
    * whether salting is worth it (run on a sample at 100 TB). */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
