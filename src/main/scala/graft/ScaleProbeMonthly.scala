package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE MONTHLY CRAWL DROP AS ONE COMPOSITION — the FULL C4 §2.1 +
  * CCNet §3 stage order, line-grain and URL stages included (r16
  * verdict task 1; the r15 version composed only the doc-grain
  * chain, adjudicated in commit b22a9e7 because the single-line
  * fixture degenerated the line stages). Two phases:
  *
  * SETUP (untimed, the "history" a production site already has):
  * one per-language pruned order-5 backoff model saved from the train
  * slice ([[graft.operators.TextAnalysis.saveLmModel]] with `langCol`
  * — CCNet §3.3's one-KenLM-per-language, trained in one multilingual
  * pass), a seeded DOC fingerprint index and a seeded LINE digest
  * index ("2026-07" = the even-id snapshot, pushed through the SAME
  * crawl reshaping, so cross-month exact/near/line hits are real),
  * and the monthly WET snapshot written to its own directory.
  *
  * THE FIXTURE (r16 verdict task 3 — crawl-like, every stage binds):
  * each monthly doc becomes a WET conversion record whose
  * WARC-Target-URI is a real (adversarially cased/ported/tracked) URL
  * on one of 1009 domains, and whose payload is multi-line: a
  * per-domain banner (~165 docs/domain at sf10 → scrubbed at
  * minDocs=3), the doc's words reflowed into 10-token lines each
  * carrying a doc-unique head token and an " of the" connective (the
  * stopword the Sf1Gen re-vocabularied groups lost — the r15 fixture
  * kept only 7.6% because 9 of 10 groups had NO required stopword,
  * so the post-gate stages were measured on an unrepresentative
  * trickle), a "trending topic" line shared by 50 consecutive ids
  * across ~50 domains (survives the per-domain scrub, dies against
  * the July line index), and three planted failure arms — doc_id%10
  * in {6,7} hash spam and == 8 ellipsis spam (Gopher fails),
  * == 9 a 9×-duplicated line (repetition battery fails) — so the
  * gates keep a crawl-like ~65% instead of 7.6%.
  *
  * MONTHLY (timed as ONE composition): WET framing → URL front door
  * (blocklist + registrable-host keying) → INCREMENTAL DOC dedup
  * against the persisted index (July overlap = ids ≡ 0 mod 6 drops
  * at the front door; history digests-only, scanned never shuffled)
  * → per-domain boilerplate scrub → Gopher quality + repetition
  * gates on the SCRUBBED text → INCREMENTAL LINE dedup against the
  * persisted line index (trending lines die to July) → language ID
  * → SAVED-model per-language scoring (the train corpus is NEVER
  * rescanned) → per-language perplexity-bucket quota. The no-rescan
  * contract is asserted on the PHYSICAL PLANS: the index machinery's
  * internal checkpoints split the chain into segments, so the gate
  * segment must reference the WET dir and the scoring segment the
  * model dir, and NEITHER may reference the corpus parquet.
  *
  * Usage: runMain graft.ScaleProbeMonthly <sfDir> [quota] [outJson]
  */
object ScaleProbeMonthly {
  /** The crawl-like reshaping, deterministic from (doc_id, text) —
    * shared by the July index seeding and the WET snapshot build so
    * cross-month dedup hits are by construction. */
  private def reshape(docId: Column, text: Column): Column = {
    val ws = filter(split(text, " "), w => length(w) > 0)
    val nLines =
      greatest(ceil(size(ws).cast("double") / 10).cast("int"), lit(1))
    val body = array_join(
      transform(sequence(lit(0), nLines - 1),
        c => concat(lit("d"), docId, lit("l"), c.cast("string"),
          lit(" "),
          array_join(slice(ws, c * 10 + 1, lit(10)), " "),
          lit(" of the"))), "\n")
    val banner = concat(lit("welcome to site"),
      pmod(docId, lit(1009L)).cast("string"), lit(".com"))
    val trending = concat(lit("trending topic "),
      floor(docId / 50).cast("long").cast("string"), lit(" of note"))
    // failure-arm lines carry the doc-unique head token so the
    // per-domain scrub CANNOT save the doc by electing them as
    // boilerplate (an identical spam line shared by ≥3 same-domain
    // docs would be scrubbed before the gates ever saw it)
    val arm = pmod(docId, lit(10L))
    val tail =
      when(arm === 6 || arm === 7,
          concat(lit("\nd"), docId,
            lit("h " + Seq.fill(20)("#").mkString(" "))))
        .when(arm === 8, concat(lit("\nd"), docId,
          lit("e " + Seq.fill(20)("...").mkString(" "))))
        .when(arm === 9, concat(lit("\n"), array_join(transform(
          sequence(lit(1), lit(9)),
          _ => concat(lit("d"), docId, lit(" dup notice line"))),
          "\n")))
        .otherwise(lit(""))
    concat(banner, lit("\n"), body, lit("\n"), trending, tail)
  }

  /** The crawl URL, deterministic from doc_id: adversarial casing,
    * default port, dot segments, tracking params — the front door
    * must canonicalize and domain-key it. */
  private def crawlUrl(docId: Column): Column =
    concat(lit("HTTP://WWW.Site"),
      pmod(docId, lit(1009L)).cast("string"),
      lit(".COM:80/a/../p/"), docId.cast("string"),
      lit("?utm_source=feed"))

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
    val U = graft.operators.UrlOps

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
    val lineIndexDir = tmp("graft-monthly-lines-")
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
    // seed BOTH indexes with last month's snapshot, pushed through
    // the SAME reshaping the WET payloads get — cross-month hits
    // (exact docs, near docs, trending lines) are by construction
    val t1 = System.nanoTime()
    val july = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"),
        reshape(col("doc_id"), col("text")).as("text"))
    D.dedupAgainstIndex(july, "doc_id", "text", indexDir,
      "2026-07").count()
    D.dedupLinesAgainstIndex(july, "doc_id", "text", lineIndexDir,
      "2026-07").count()
    val seedSec = (System.nanoTime() - t1) / 1e9
    println(f"[monthly] setup: train+save $trainSec%.1f s, " +
      f"index seed $seedSec%.1f s")
    // the monthly snapshot as WET blobs in its own directory: the %3
    // slice (one third of the corpus; ids ≡ 0 mod 6 overlap the
    // seeded snapshot, so the doc-dedup stage has real exact-dup
    // work), 64 blob "files" of Content-Length-framed conversion
    // records with REAL target URLs
    val crlf = "\r\n"
    def writeWet(residue: Int, date: String, dir: String): Unit = {
      val payload = reshape(col("doc_id"), col("text"))
      val rec = concat(lit("WARC/1.0" + crlf),
        lit("WARC-Type: conversion" + crlf),
        lit("WARC-Target-URI: "), crawlUrl(col("doc_id")), lit(crlf),
        lit(s"WARC-Date: ${date}T00:00:00Z" + crlf),
        // octet_length, NOT length: the WARC walk is byte-driven (the
        // p69 framer's rule) — a character count under-frames any
        // multi-byte doc and poisons the rest of its blob
        lit("Content-Length: "), octet_length(payload).cast("string"),
        lit(crlf + crlf), payload, lit(crlf + crlf))
      docs.filter(col("doc_id") % 3 === residue)
        .withColumn("rec_str", rec)
        .withColumn("file", pmod(col("doc_id"), lit(64L)))
        .groupBy("file")
        .agg(concat_ws("", collect_list(col("rec_str"))).as("raw"))
        .write.mode("overwrite").parquet(dir)
    }
    writeWet(0, "2026-08-01", wetDir)
    // September: the %3==1 slice in its own dir (ids ≡ 4 mod 6
    // overlap July's seed; its trending/xline groups overlap August's
    // deltas — the SECOND month probes indexes GROWN by the first)
    val wetDirSep = tmp("graft-monthly-wet-sep-") + "/snap"
    writeWet(1, "2026-09-01", wetDirSep)
    println(s"[monthly] wet snapshots at $wetDir , $wetDirSep")

    // ---- MONTHLY: the one composition a crawl drop runs. The index
    // probes checkpoint internally (pinned-before-delta-write), so the
    // lazy chain has three segments: framing→front→docDedup input,
    // scrub→gates→lineDedup input, langId→scoring→buckets.
    case class Run(front: DataFrame, mix: Map[String, Long],
                   gated: DataFrame, lded: DataFrame,
                   picked: DataFrame)
    def composed(wet: String, docIdx: String, lineIdx: String,
                 snapshotId: String): Run = {
      val raw = spark.read.parquet(wet)
      val framed = graft.operators.WarcIngest.wetDocuments(raw, "raw")
        .withColumn("doc_id",
          regexp_extract(col("url"), "/p/(\\d+)", 1).cast("long"))
        .select("doc_id", "url", "text")
      // URL front door: blocklist + registrable-host domain key
      val front = U.dropBlockedHosts(framed, "url",
          Seq("site13.com", "site404.com"))
        .withColumn("reg_host", U.registrableHost(col("url")))
        .filter(col("reg_host") =!= "")
      // incremental DOC dedup at the front door: docs last month's
      // snapshot already holds never reach the expensive stages
      val dec = D.dedupAgainstIndex(front.select("doc_id", "text"),
        "doc_id", "text", docIdx, snapshotId)
      val mix = dec.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val keep = front.join(
        dec.filter(col("verdict") === "keep")
          .select(col("id").as("doc_id")), Seq("doc_id"))
      // per-domain boilerplate scrub, then BOTH gate batteries on the
      // SCRUBBED text (gates judge what survives cleanup, not banners)
      val gated = T.repetitionSignals(
          T.gopherQuality(
            D.scrubBoilerplateLines(keep, "doc_id", "reg_host",
              "text", minDocs = 3),
            "cleaned", minWords = 5, minStopwords = 1),
          "cleaned")
        .filter(col("gopher_pass") && col("rep_pass"))
        .select("doc_id", "cleaned")
      // incremental LINE dedup: the C4 global-first rule against the
      // persisted line index (trending lines die to July's snapshot)
      val lded = D.dedupLinesAgainstIndex(gated, "doc_id", "cleaned",
          lineIdx, snapshotId)
        .select(col("doc_id"), col("n_kept_lines"), col("deduped"))
      val withLang = lded.withColumn("lang_id",
        T.langId(col("deduped")))
      val scored = T.ngramLmScoreWithModel(modelDir, withLang,
        "doc_id", "deduped", langCol = Some("lang_id"))
      val picked = T.perplexityBuckets(
          scored.filter(col("ppl").isNotNull),
          "id", "ppl", Seq("lang"), k = 3, quota = Some(quota))
        .select(col("id").as("doc_id"))
        .join(withLang.select("doc_id", "deduped"), Seq("doc_id"))
      Run(front, mix, gated, lded, picked)
    }
    // warm lap (codegen + JIT; the standing probe discipline) against
    // THROWAWAY indexes so the real monthly probe+delta against the
    // seeded history is first-time work
    composed(wetDir, tmp("graft-monthly-warmidx-"),
      tmp("graft-monthly-warmlines-"), "2026-08").picked.count()

    val t2 = System.nanoTime()
    val run = composed(wetDir, indexDir, lineIndexDir, "2026-08")
    val nPicked = run.picked.count()
    val monthlySec = (System.nanoTime() - t2) / 1e9

    // the no-rescan assertions, on the PLANS, not prose: the gate
    // segment reads the WET snapshot, the scoring segment reads the
    // saved model, and NO segment reads the train corpus parquet
    // (which would mean a monthly retrain / history rescan)
    val gatePlan = run.gated.queryExecution.executedPlan.toString
    val scorePlan = run.picked.queryExecution.executedPlan.toString
    val readsWet = gatePlan.contains(wetDir)
    val readsModel = scorePlan.contains(modelDir)
    val readsCorpus = gatePlan.contains("documents.parquet") ||
      scorePlan.contains("documents.parquet")
    require(readsModel && readsWet && !readsCorpus,
      s"monthly composition plans must read model+snapshot only: " +
        s"model=$readsModel wet=$readsWet corpusRescan=$readsCorpus")

    // per-stage surviving rows (untimed — the numbers a curation
    // report needs beside the wall time)
    val nFramed = spark.read.parquet(wetDir)
      .transform(r => graft.operators.WarcIngest.wetDocuments(r, "raw"))
      .count()
    // every front row got a dedup verdict, so front = Σ mix — no
    // need to replay the framing + URL kernels for a count; and the
    // line-dedup output (pinned by the index machinery) carries one
    // row per gated doc, so it answers both line totals AND the
    // gated count without re-running the 3-shuffle scrub election
    val mix = run.mix
    val nFront = mix.values.sum
    val nKept = mix.getOrElse("keep", 0L)
    val lineStats = run.lded.agg(
        count(lit(1)), coalesce(sum(col("n_kept_lines")), lit(0L)))
      .collect()(0)
    val nGated = lineStats.getLong(0)
    val keptFrac = if (nKept == 0) 0.0 else nGated.toDouble / nKept
    println(f"[monthly] monthly drop $monthlySec%.1f s: framed=" +
      f"$nFramed front=$nFront mix=$mix gated=$nGated " +
      f"(kept-frac ${keptFrac * 100}%.1f%% of dedup survivors) " +
      f"lines=${lineStats.getLong(1)} picked=$nPicked " +
      f"(plans: wet=$readsWet model=$readsModel rescan=$readsCorpus)")

    // ---- BETWEEN DROPS: offline compaction of both indexes (the
    // operating loop's maintenance step — re-bounds each index at
    // DISTINCT keys ever seen; replay-identity is spec-proven)
    val t3 = System.nanoTime()
    D.compactDedupIndex(spark, indexDir)
    D.compactDedupIndex(spark, lineIndexDir)
    val compactSec = (System.nanoTime() - t3) / 1e9
    println(f"[monthly] inter-month compaction $compactSec%.1f s")

    // ---- SEPTEMBER: the second drop probes indexes GROWN by August
    // (and just compacted) — the cost must stay flat, and the chain
    // is identical by construction (same composed())
    val t4 = System.nanoTime()
    val sep = composed(wetDirSep, indexDir, lineIndexDir, "2026-09")
    val nPickedSep = sep.picked.count()
    val sepSec = (System.nanoTime() - t4) / 1e9
    val mixSep = sep.mix
    val nGatedSep = sep.lded.count() // pinned — no scrub replay
    println(f"[monthly] september drop $sepSec%.1f s: mix=$mixSep " +
      f"gated=$nGatedSep picked=$nPickedSep")

    val json = s"""{"metric":"monthly_drop","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"cpu_ref_sec":$cpu%.2f,""" +
      f""""setup_train_save_sec":$trainSec%.1f,""" +
      f""""setup_index_seed_sec":$seedSec%.1f,""" +
      f""""monthly_sec":$monthlySec%.1f,"quota":$quota,""" +
      s""""rows":{"framed":$nFramed,"front_door":$nFront,""" +
      s""""keep":$nKept,""" +
      s""""drop_exact":${mix.getOrElse("drop_exact", 0L)},""" +
      s""""drop_near":${mix.getOrElse("drop_near", 0L)},""" +
      s""""gated":$nGated,""" +
      s""""deduped_docs":${lineStats.getLong(0)},""" +
      s""""deduped_lines":${lineStats.getLong(1)},""" +
      s""""picked":$nPicked},""" +
      f""""gate_kept_frac":$keptFrac%.3f,""" +
      f""""intermonth_compaction_sec":$compactSec%.1f,""" +
      f""""september_sec":$sepSec%.1f,""" +
      s""""september_rows":{""" +
      s""""keep":${mixSep.getOrElse("keep", 0L)},""" +
      s""""drop_exact":${mixSep.getOrElse("drop_exact", 0L)},""" +
      s""""drop_near":${mixSep.getOrElse("drop_near", 0L)},""" +
      s""""gated":$nGatedSep,"picked":$nPickedSep},""" +
      s""""plan_reads_model":$readsModel,""" +
      s""""plan_reads_snapshot":$readsWet,""" +
      s""""plan_rescans_train_corpus":$readsCorpus,""" +
      s""""dedup_history_rescan":"none by construction: both indexes """ +
      s"""store digests only (PlanSpec-gated pruned scans)"}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
