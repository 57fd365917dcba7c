package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only generator for the sf1 scale-rehearsal dataset (10× the
  * largest driver-shipped scale): every sf0.1 fact table replicated
  * `copies` times with per-copy key offsets (+i·10⁸ on every key column)
  * so referential joins stay consistent; dimension tables (region,
  * nation) copy once. Documents get a per-copy suffix token and
  * embeddings a small per-copy jitter, so the corpus models a realistic
  * duplicate-heavy crawl (copy-count-way near-dup clusters) rather than
  * exact clones. See SCALE_REHEARSAL.md for the findings.
  *
  * Usage: `sbt "runMain graft.Sf1Gen [/tmp/sf1 [copies [tables]]]"` —
  * `tables` is an optional comma list (e.g. `documents,embeddings`) to
  * generate only the corpus a family rehearsal needs (the sf10 dedup
  * rehearsal skips the 60M-row lineitem it never reads).
  */
object Sf1Gen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val only: Option[Set[String]] =
      args.lift(2).map(_.split(",").map(_.trim).toSet)
    def wanted(t: String): Boolean = only.forall(_.contains(t))
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val off = 100000000L
    def rep(t: String, keys: Seq[String],
            tweak: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      if (!wanted(t)) return
      val base = core.Tables.t(spark, src, t)
      val all = (0 until copies).map { i =>
        val shifted = keys.foldLeft(base)((d, k) =>
          d.withColumn(k, col(k) + lit(i * off)))
        tweak(shifted, i)
      }.reduce(_ unionByName _)
      all.repartition(32).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[sf1gen] $t x$copies -> $out/$t.parquet")
    }
    def copy(t: String): Unit = {
      if (!wanted(t)) return
      core.Tables.t(spark, src, t).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"[sf1gen] $t (dim, 1 copy)")
    }

    copy("region"); copy("nation")
    rep("customer", Seq("c_custkey"))
    rep("supplier", Seq("s_suppkey"))
    rep("part", Seq("p_partkey"))
    rep("orders", Seq("o_orderkey", "o_custkey"))
    rep("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    rep("events", Seq("event_id", "user_id"))
    // near-dup clusters, not exact clones: copy i appends a distinct
    // suffix token (changes a handful of trailing shingles)
    rep("documents", Seq("doc_id"), (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" copytoken$i"))))
    // embedding jitter: deterministic tiny per-copy offset on one
    // component keeps cosines ~1 within a cluster without exact equality
    rep("embeddings", Seq("vec_id"), (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + when(j === (i % 8), lit(0.001f * (i + 1))).otherwise(lit(0f)))
            .cast("float"))))
    spark.stop()
  }
}
