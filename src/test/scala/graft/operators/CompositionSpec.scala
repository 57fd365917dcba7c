package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The monthly-crawl-drop COMPOSITION at fixture scale — the per-commit
  * test behind `ScaleProbeMonthly` (which measures the same chain at
  * sf10): WET framing → Gopher quality + repetition gates → language
  * ID → SAVED per-language backoff model scoring → per-language
  * perplexity buckets → incremental dedup against a persisted index.
  * The probe proves the cost; this spec pins the SEMANTICS of the
  * stages composing — including the contract that the monthly chain's
  * plan reads the model and the snapshot and never rescans the train
  * corpus (the whole point of train-once/score-many + the persisted
  * index). */
class CompositionSpec extends SparkTestBase {
  import spark.implicits._
  private val T = TextAnalysis

  test("monthly-drop composition: framing, gates, langId, saved " +
      "per-lang model, per-lang buckets, incremental dedup — and the " +
      "monthly plan never rescans the train corpus") {
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    // 24 docs, two languages by construction: even ids English, odd
    // ids Chinese-marked (enough CJK share for langId, still ≥80%
    // alpha words and ≥3 mean word length for the Gopher gate). Every
    // doc distinct via its token suffix.
    // per-doc VOCABULARIES: docs must be genuinely distinct (near-dup
    // LSH correctly flags template text that differs by one token), a
    // "the" for the stopword gate, and doc-unique CJK markers for
    // langId's CJK share without shared shingles between zh docs
    def body(i: Int) = (1 to 20).map(j => s"word${i}x$j").mkString(" ")
    def enText(i: Int) = "the " + body(i)
    def zhText(i: Int) =
      s"的的的的的的${i}a 的的的的的的${i}b the " + body(i)
    val docs = (0 until 24)
      .map(i => (i.toLong, if (i % 2 == 0) enText(i) else zhText(i)))
      .toDF("doc_id", "text")
    // the train corpus lives ON DISK so "never rescanned" is a real
    // plan property, not a vacuous one
    val trainDir = tmp("graft-comp-train-")
    docs.write.mode("overwrite").parquet(trainDir)
    val train = spark.read.parquet(trainDir)

    // setup artifacts (what a production site persists between drops)
    val modelDir = tmp("graft-comp-model-")
    val indexDir = tmp("graft-comp-index-")
    T.saveLmModel(train.withColumn("lang_id", T.langId(col("text"))),
      "text", modelDir, order = 3, langCol = Some("lang_id"))
    Dedup.dedupAgainstIndex(train.filter(col("doc_id") < 16),
      "doc_id", "text", indexDir, "2026-07").count()

    // the monthly snapshot: docs 8..23 as ONE WET blob in its own dir
    // (8..15 overlap last month's snapshot — the dedup stage's work)
    val crlf = "\r\n"
    val rec = concat(lit("WARC/1.0" + crlf),
      lit("WARC-Type: conversion" + crlf),
      lit("WARC-Target-URI: urn:doc:"), col("doc_id"), lit(crlf),
      lit("WARC-Date: 2026-08-01T00:00:00Z" + crlf),
      lit("Content-Length: "), octet_length(col("text")).cast("string"),
      lit(crlf + crlf), col("text"), lit(crlf + crlf))
    val wetDir = tmp("graft-comp-wet-") + "/snap"
    docs.filter(col("doc_id") >= 8).withColumn("r", rec)
      .groupBy().agg(concat_ws("", collect_list(col("r"))).as("raw"))
      .write.mode("overwrite").parquet(wetDir)

    // ---- the monthly composition (the probe's chain, verbatim)
    val raw = spark.read.parquet(wetDir)
    val framed = WarcIngest.wetDocuments(raw, "raw")
      .withColumn("doc_id",
        regexp_extract(col("url"), "urn:doc:(\\d+)", 1).cast("long"))
      .select("doc_id", "text")
    assert(framed.count() == 16, "all 16 monthly records frame")
    val gated = T.repetitionSignals(
        T.gopherQuality(framed, "text", minWords = 5,
          minStopwords = 1), "text")
      .filter(col("gopher_pass") && col("rep_pass"))
      .select("doc_id", "text")
    assert(gated.count() == 16,
      "the fixture is calibrated to pass both gate batteries")
    val withLang = gated.withColumn("lang_id", T.langId(col("text")))
    val langs = withLang.groupBy("lang_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs == Map("en" -> 8L, "zh" -> 8L),
      s"langId must split the fixture 8/8: $langs")
    val scored = T.ngramLmScoreWithModel(modelDir, withLang,
      "doc_id", "text", langCol = Some("lang_id"))
    // per-language models are REAL here: each language's docs hit
    // their own language's trigram table (n_hit3 > 0), proving the
    // scoring joined per-lang tables rather than one merged pile
    val hits = scored.groupBy("lang")
      .agg(min(col("n_hit3")).as("mn")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set("en", "zh") && hits.values.forall(_ > 0),
      s"every doc must hit its own language's trained trigrams: $hits")
    val picked = T.perplexityBuckets(
        scored.filter(col("ppl").isNotNull),
        "id", "ppl", Seq("lang"), k = 3, quota = Some(100L))
      .select(col("id").as("doc_id"))
      .join(withLang.select("doc_id", "text"), Seq("doc_id"))
    // the no-rescan contract, on the PLAN: model + snapshot read,
    // train corpus NOT read by the monthly chain
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains(modelDir), "plan must read the saved model")
    assert(plan.contains(wetDir), "plan must read the WET snapshot")
    assert(!plan.contains(trainDir),
      "the monthly chain must never rescan the train corpus")
    // incremental dedup: the 8 docs last month's snapshot already
    // holds drop exact; the 8 new ones keep
    val verdicts = Dedup.dedupAgainstIndex(picked, "doc_id", "text",
        indexDir, "2026-08")
      .select("id", "verdict").as[(Long, String)].collect().toMap
    assert((8L to 15L).forall(verdicts(_) == "drop_exact"),
      s"seeded-overlap docs must drop: $verdicts")
    assert((16L to 23L).forall(verdicts(_) == "keep"),
      s"fresh docs must keep: $verdicts")
  }
}
