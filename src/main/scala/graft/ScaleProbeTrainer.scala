package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10 probe of [[graft.operators.TextAnalysis.trainLinearClassifier]]
  * at REALISTIC width (r14 verdict task: the p67 gate trains 64
  * buckets; production curated-vs-crawl classifiers hash to 2^16+).
  * Times the full fixed-point train at `buckets` (default 65536) over
  * the sf10 corpus — total for 1 and 3 iterations, so the marginal
  * per-iteration cost (one partial-agg margin groupBy + one id-keyed
  * gradient join + a B-long driver update) is separated from the
  * one-time feature build — then round-trips the learned weights
  * through `linearScoreHashed` at the same width with a threshold
  * count, and checks the scaladoc's overflow budget against the
  * corpus's ACTUAL token mass (|G_b| <= 4S · train tokens; the prose
  * claims fracBits 20 holds to ~10^12 tokens). Disk + CPU reference
  * probes recorded beside the numbers per the standing discipline.
  *
  * Usage: runMain graft.ScaleProbeTrainer <sfDir> [buckets] [outJson]
  */
object ScaleProbeTrainer {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val buckets = args.lift(1).map(_.toInt).getOrElse(65536)
    val outJson = args.lift(2)
    val lrShiftArg = args.lift(3).map(_.toInt)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T = graft.operators.TextAnalysis

    val dd = graft.probe.DiskProbe.writeMBps()
    val cpu = graft.probe.DiskProbe.cpuRefSec()
    println(f"[trainer] dd $dd%.0f MB/s cpuRef $cpu%.2f s")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm page cache
    // the rehearsal corpus carries NO lexical label signal (its vocab
    // is group-prefixed and shared across langs/sources — lang is
    // metadata, not a property of the text; measured: a lang=en label
    // trains to exactly the majority baseline). So the probe PLANTS
    // the separation at corpus scale — OperatorsSpec's
    // planted-separation test at 500k docs and production width: a
    // marker token on a BALANCED half of the docs (balanced classes
    // are how curated-vs-crawl quality classifiers are actually
    // trained — GPT-3 App. A samples negatives to match; an
    // unbalanced label leaks the class prior into the shared-filler
    // weights of this bias-free model, measured at 2:1 skew), and the
    // recorded train_agreement shows fixed-point GD recovering it.
    val labeled = docs.withColumn("y", col("doc_id") % 2 === 0)
      .withColumn("text", when(col("y"),
          concat_ws(" ", col("text"), lit("qualitymarker8861")))
        .otherwise(col("text")))
    val nDocs = labeled.count()
    // token mass drives both the gradient magnitude and the overflow
    // budget; lrShift is sized from it (unnormalized gradient — the
    // operator's documented scale-dependent knob): step ~ G / 2^lrShift
    // with |G| ~ 4S * tokens-on-the-label-majority-buckets
    val trainTokens = labeled
      .agg(sum(size(split(col("text"), "\\s+")))).collect()(0).getLong(0)
    val lrShift = lrShiftArg.getOrElse(math.min(48,
      math.max(0, 2 + 20 + (63 - java.lang.Long
        .numberOfLeadingZeros(math.max(trainTokens, 1L))) - 20)))
    println(s"[trainer] n_docs=$nDocs train_tokens=$trainTokens " +
      s"buckets=$buckets lrShift=$lrShift")

    // untimed warm pass at tiny width: codegen + JIT for the feature
    // build and both per-iteration aggregates
    T.trainLinearClassifier(labeled.limit(2000), "doc_id", "text", "y",
      buckets = 64, iters = 1, fracBits = 20, lrShift = lrShift,
      portableHash = true)

    def train(iters: Int): (org.apache.spark.sql.DataFrame, Double) = {
      val t0 = System.nanoTime()
      val m = T.trainLinearClassifier(labeled, "doc_id", "text", "y",
        buckets = buckets, iters = iters, fracBits = 20,
        lrShift = lrShift, portableHash = true)
      m.write.format("noop").mode("overwrite").save()
      (m, (System.nanoTime() - t0) / 1e9)
    }
    val (_, sec1) = train(1)
    val (model, sec3) = train(3)
    val perIter = (sec3 - sec1) / 2
    println(f"[trainer] iters=1 $sec1%.1f s, iters=3 $sec3%.1f s " +
      f"-> per-iteration $perIter%.1f s (feature build ~" +
      f"${sec1 - perIter}%.1f s)")

    // round-trip at the same width: score all docs, threshold at 0
    val t0 = System.nanoTime()
    val scored = T.linearScoreHashed(labeled, "doc_id", "text", model,
      buckets = buckets, portableHash = true)
    scored.write.format("noop").mode("overwrite").save()
    val scoreSec = (System.nanoTime() - t0) / 1e9
    val mix = scored.groupBy("label").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    // did the fixed-point trainer actually separate? Two operating
    // points: (a) threshold 0 — the raw `label` column; without a bias
    // term the unnormalized GD absorbs even the balanced 1/2-1/2 class
    // prior's filler mass into the shared-filler weights, so 0 is not
    // guaranteed to be the natural boundary — and (b) the production
    // move: threshold at the MEASURED positive-fraction quantile of
    // the score distribution (derived from the data, not hard-coded,
    // so recalibrating the planted split never silently skews the
    // operating point; callers of quality classifiers pick an
    // operating point — CCNet keeps a fraction, not a fixed logit).
    // (b) is the separation evidence; train accuracy, not a
    // generalization claim.
    val joined = scored.join(labeled.select(col("doc_id"), col("y")),
      Seq("doc_id"))
    val agree0 = joined.filter(col("label") === col("y")).count()
    val posFrac = joined.agg(avg(col("y").cast("double")))
      .collect()(0).getDouble(0) // planted split: 1/2 on doc_id parity
    val thr = joined.agg(
      percentile_approx(col("score"), lit(1.0 - posFrac), lit(100000)))
      .collect()(0).getDouble(0)
    val agreeQ = joined
      .filter((col("score") >= thr) === col("y")).count()
    val nzW = model.filter(col("w") =!= 0L).count()
    val maxW = model.agg(max(abs(col("w")))).collect()(0).getLong(0)
    // overflow headroom: the per-bucket gradient bound 4S * tokens
    // against 2^63 (the budget the scaladoc documents)
    val bound = 4.0 * (1L << 20) * trainTokens
    val headroom = Long.MaxValue / bound
    println(f"[trainer] score $scoreSec%.1f s mix=$mix " +
      f"agree0=$agree0 agreeQ=$agreeQ (thr=$thr%.4f) " +
      f"nonzero_w=$nzW max|w|=$maxW headroom=$headroom%.0fx")

    val json = s"""{"metric":"trainer_width","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"cpu_ref_sec":$cpu%.2f,""" +
      s""""n_docs":$nDocs,"train_tokens":$trainTokens,""" +
      s""""buckets":$buckets,"lr_shift":$lrShift,""" +
      f""""train_iters1_sec":$sec1%.1f,"train_iters3_sec":$sec3%.1f,""" +
      f""""per_iteration_sec":$perIter%.1f,""" +
      f""""score_roundtrip_sec":$scoreSec%.1f,""" +
      s""""n_label_true":${mix.getOrElse(true, 0L)},""" +
      s""""n_label_false":${mix.getOrElse(false, 0L)},""" +
      s""""train_agreement_thr0":$agree0,""" +
      s""""train_agreement_quantile":$agreeQ,""" +
      f""""quantile_threshold":$thr%.6f,""" +
      s""""nonzero_weights":$nzW,"max_abs_w":$maxW,""" +
      f""""gradient_overflow_headroom":$headroom%.0f}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
