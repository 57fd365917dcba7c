package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE MONTHLY CRAWL DROP AS ONE COMPOSITION (r15 verdict task 2):
  * every prior sf10 probe timed the pipeline's stages separately, and
  * the p72/p68 artifacts exist precisely so a monthly run reuses a
  * SAVED model and a PERSISTED dedup index — but no probe had ever
  * run the operating shape end to end. This one does, in two phases:
  *
  * SETUP (untimed, the "history" a production site already has):
  * language-ID the train slice, save ONE per-language pruned order-5
  * backoff model ([[graft.operators.TextAnalysis.saveLmModel]] with
  * `langCol` — CCNet §3.3's one-KenLM-per-language, trained in one
  * multilingual pass), and seed the persisted dedup index with a
  * prior snapshot ("2026-07").
  *
  * MONTHLY (timed as ONE composition): a fresh WET snapshot (the
  * monthly slice framed into Content-Length WET blobs and written to
  * its own directory) → WARC framing → Gopher quality + repetition
  * gates → language ID → SAVED-model per-language scoring (the train
  * corpus is NEVER rescanned — asserted on the composition's physical
  * plan, which must reference the model dir and the snapshot dir and
  * must NOT reference the corpus parquet) → per-language
  * perplexity-bucket quota → incremental dedup against the persisted
  * index ("2026-08"; history text is never rescanned BY CONSTRUCTION
  * — the index stores digests only, and its pruned-scan shape is
  * PlanSpec-gated). Per-stage surviving rows and the end-to-end wall
  * time land in the JSON; the disk + CPU probes are recorded beside
  * the run per the standing discipline.
  *
  * Usage: runMain graft.ScaleProbeMonthly <sfDir> [quota] [outJson]
  */
object ScaleProbeMonthly {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val quota = args.lift(1).map(_.toLong).getOrElse(10000L)
    val outJson = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T = graft.operators.TextAnalysis
    val D = graft.operators.Dedup

    val dd = graft.probe.DiskProbe.writeMBps()
    val cpu = graft.probe.DiskProbe.cpuRefSec()
    println(f"[monthly] dd $dd%.0f MB/s cpuRef $cpu%.2f s")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm page cache

    // ---- SETUP (untimed): the artifacts a production site persists
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString
    val modelDir = tmp("graft-monthly-model-")
    val indexDir = tmp("graft-monthly-index-")
    val wetDir = tmp("graft-monthly-wet-") + "/snap"
    // one per-language model, trained in ONE multilingual pass on the
    // langId-labeled train slice (labels must come from the SAME
    // classifier that labels the monthly side — the CCNet discipline)
    val t0 = System.nanoTime()
    T.saveLmModel(
      docs.filter(col("doc_id") % 10 =!= 0)
        .withColumn("lang_id", T.langId(col("text"))),
      "text", modelDir, order = 5, minCount = 2,
      langCol = Some("lang_id"))
    val trainSec = (System.nanoTime() - t0) / 1e9
    // seed the index with last month's snapshot
    val t1 = System.nanoTime()
    D.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", indexDir, "2026-07").count()
    val seedSec = (System.nanoTime() - t1) / 1e9
    println(f"[monthly] setup: train+save $trainSec%.1f s, " +
      f"index seed $seedSec%.1f s")
    // the monthly snapshot as WET blobs in its own directory: the %3
    // slice (onethird of the corpus; ids ≡ 0 mod 6 overlap the seeded
    // snapshot, so the dedup stage has real exact-dup work to do),
    // 64 blob "files" of Content-Length-framed conversion records
    val crlf = "\r\n"
    val rec = concat(lit("WARC/1.0" + crlf),
      lit("WARC-Type: conversion" + crlf),
      lit("WARC-Target-URI: urn:doc:"), col("doc_id"), lit(crlf),
      lit("WARC-Date: 2026-08-01T00:00:00Z" + crlf),
      // octet_length, NOT length: the WARC walk is byte-driven (the
      // p69 framer's rule) — a character count under-frames any
      // multi-byte doc and poisons the rest of its blob
      lit("Content-Length: "), octet_length(col("text")).cast("string"),
      lit(crlf + crlf), col("text"), lit(crlf + crlf))
    docs.filter(col("doc_id") % 3 === 0)
      .withColumn("rec_str", rec)
      .withColumn("file", pmod(col("doc_id"), lit(64L)))
      .groupBy("file")
      .agg(concat_ws("", collect_list(col("rec_str"))).as("raw"))
      .write.mode("overwrite").parquet(wetDir)
    println(s"[monthly] wet snapshot at $wetDir")

    // ---- MONTHLY (timed): the one composition a crawl drop runs
    def composed(): (DataFrame, DataFrame) = {
      val raw = spark.read.parquet(wetDir)
      val framed = graft.operators.WarcIngest.wetDocuments(raw, "raw")
        .withColumn("doc_id",
          regexp_extract(col("url"), "urn:doc:(\\d+)", 1).cast("long"))
        .select("doc_id", "text")
      val gated = T.repetitionSignals(
          T.gopherQuality(framed, "text", minWords = 5,
            minStopwords = 1), "text")
        .filter(col("gopher_pass") && col("rep_pass"))
        .select("doc_id", "text")
      val withLang = gated.withColumn("lang_id", T.langId(col("text")))
      val scored = T.ngramLmScoreWithModel(modelDir, withLang,
        "doc_id", "text", langCol = Some("lang_id"))
      val picked = T.perplexityBuckets(
          scored.filter(col("ppl").isNotNull),
          "id", "ppl", Seq("lang"), k = 3, quota = Some(quota))
        .select(col("id").as("doc_id"))
        .join(withLang.select("doc_id", "text"), Seq("doc_id"))
      (gated, picked)
    }
    // warm lap (codegen + JIT; the standing probe discipline), with
    // the dedup stage warmed on a THROWAWAY index so the real monthly
    // probe+delta against the seeded index is first-time work
    D.dedupAgainstIndex(composed()._2, "doc_id", "text",
      tmp("graft-monthly-warm-"), "2026-08").count()

    val t2 = System.nanoTime()
    val (gated, picked) = composed()
    val dec = D.dedupAgainstIndex(picked, "doc_id", "text",
      indexDir, "2026-08")
    val mix = dec.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val monthlySec = (System.nanoTime() - t2) / 1e9

    // the no-rescan assertion, on the PLAN, not prose: the timed
    // composition reads the WET snapshot and the saved model — never
    // the train corpus parquet (which would mean a monthly retrain)
    val plan = picked.queryExecution.executedPlan.toString
    val readsModel = plan.contains(modelDir)
    val readsWet = plan.contains(wetDir)
    val readsCorpus = plan.contains("documents.parquet")
    require(readsModel && readsWet && !readsCorpus,
      s"monthly composition plan must read model+snapshot only: " +
        s"model=$readsModel wet=$readsWet corpusRescan=$readsCorpus")

    // per-stage surviving rows (untimed — the numbers a curation
    // report needs beside the wall time)
    val nFramed = spark.read.parquet(wetDir)
      .transform(r => graft.operators.WarcIngest.wetDocuments(r, "raw"))
      .count()
    val nGated = gated.count()
    val nPicked = picked.count()
    println(f"[monthly] monthly drop $monthlySec%.1f s: framed=" +
      f"$nFramed gated=$nGated picked=$nPicked mix=$mix " +
      f"(plan: model=$readsModel wet=$readsWet rescan=$readsCorpus)")

    val json = s"""{"metric":"monthly_drop","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"cpu_ref_sec":$cpu%.2f,""" +
      f""""setup_train_save_sec":$trainSec%.1f,""" +
      f""""setup_index_seed_sec":$seedSec%.1f,""" +
      f""""monthly_sec":$monthlySec%.1f,"quota":$quota,""" +
      s""""rows":{"framed":$nFramed,"gated":$nGated,""" +
      s""""picked":$nPicked,"keep":${mix.getOrElse("keep", 0L)},""" +
      s""""drop_exact":${mix.getOrElse("drop_exact", 0L)},""" +
      s""""drop_near":${mix.getOrElse("drop_near", 0L)}},""" +
      s""""plan_reads_model":$readsModel,""" +
      s""""plan_reads_snapshot":$readsWet,""" +
      s""""plan_rescans_train_corpus":$readsCorpus,""" +
      s""""dedup_history_rescan":"none by construction: the index """ +
      s"""stores digests only (PlanSpec-gated pruned scans)"}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
