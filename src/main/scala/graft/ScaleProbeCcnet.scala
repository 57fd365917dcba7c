package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf10 probe of the HEADLINE CCNet pipeline END TO END (r13 verdict
  * task: the stages p62/p32/p66 gate individually, timed as the one
  * chain a production caller runs): train an LM on the 90% slice,
  * score EVERY document with float perplexity, bucket per language
  * into head/middle/tail by exact rank, apply bucket-quota sampling.
  * Runs the chain per scorer shape — the add-k bigram
  * ([[graft.operators.TextAnalysis.ngramLmScore]], the p32/p62 shape),
  * the order-3 stupid-backoff scorer
  * ([[graft.operators.TextAnalysis.ngramLmScoreBackoff]], the p66
  * CCNet/KenLM shape), and (r15) its PRUNED production variant
  * (minCount=2 singleton pruning over the fused one-pass count step,
  * the p71 shape) — so each upgrade's scale cost at 500k docs is a
  * recorded number, not a guess. noop-format writes (count()
  * would prune the output projection — the Bench r10 caveat); the
  * disk probe is recorded beside the run per the standing discipline.
  *
  * Usage: runMain graft.ScaleProbeCcnet <sfDir> [quota] [outJson]
  */
object ScaleProbeCcnet {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val quota = args.lift(1).map(_.toLong).getOrElse(30000L)
    val outJson = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T = graft.operators.TextAnalysis

    val dd = graft.probe.DiskProbe.writeMBps()
    println(f"[ccnet] dd $dd%.0f MB/s")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm page cache
    val nDocs = docs.count()

    def bucketed(scored: DataFrame): DataFrame =
      T.perplexityBuckets(
        scored.filter(col("ppl").isNotNull)
          .join(docs.select(col("doc_id").as("id"), col("lang")),
            Seq("id")),
        "id", "ppl", Seq("lang"), k = 3, quota = Some(quota))

    def lap(name: String, chain: () => DataFrame): (String, Double) = {
      // untimed warm pass: whole-stage-codegen compile + JIT (the r13
      // ScaleProbeCluster advice — without it the FIRST lap absorbs
      // the session's cold start and cross-lap comparison is biased:
      // measured 13.8 s cold vs 7.1 s warm for the same bigram chain)
      chain().write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      chain().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = chain().count() // untimed
      println(f"[ccnet] $name sec=$sec%.1f rows=$rows " +
        f"(${nDocs / sec}%.0f docs/s)")
      (f""""$name":{"sec":$sec%.1f,"rows":$rows}""", sec)
    }

    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val laps = Seq(
      // scoring stage alone, then the full chain, per scorer
      lap("score_bigram", () =>
        T.ngramLmScore(train, docs, "doc_id", "text")),
      lap("chain_bigram", () =>
        bucketed(T.ngramLmScore(train, docs, "doc_id", "text"))),
      lap("score_backoff3", () =>
        T.ngramLmScoreBackoff(train, docs, "doc_id", "text", order = 3)),
      lap("chain_backoff3", () =>
        bucketed(T.ngramLmScoreBackoff(train, docs, "doc_id", "text",
          order = 3))),
      // the r15 production shape: KenLM singleton pruning (minCount=2
      // empties the singleton mass out of the order-3 table) on top of
      // the fused one-pass count step — the r14 verdict's ask was this
      // chain's cost materially below the unpruned 62.0 s
      lap("score_backoff3_pruned", () =>
        T.ngramLmScoreBackoff(train, docs, "doc_id", "text", order = 3,
          minCount = 2)),
      lap("chain_backoff3_pruned", () =>
        bucketed(T.ngramLmScoreBackoff(train, docs, "doc_id", "text",
          order = 3, minCount = 2))),
      // CCNet's ACTUAL model order (§3.3: pruned 5-gram KenLM) — the
      // widest shape the operator supports below its order cap; 9
      // count-table joins and 6 per-order arrays per doc, all still
      // off ONE kernel call and ONE tagged count shuffle
      lap("score_backoff5_pruned", () =>
        T.ngramLmScoreBackoff(train, docs, "doc_id", "text", order = 5,
          minCount = 2)),
      lap("chain_backoff5_pruned", () =>
        bucketed(T.ngramLmScoreBackoff(train, docs, "doc_id", "text",
          order = 5, minCount = 2))),
      // the same chain with the scoring frame PINNED before bucketing
      // (what a production caller does between stages): the unpinned
      // vs pinned delta is the measured cost of whatever re-execution
      // the bucketing stage induces over the order-5 scoring DAG
      lap("chain_backoff5_pruned_pinned", () =>
        bucketed(T.ngramLmScoreBackoff(train, docs, "doc_id", "text",
          order = 5, minCount = 2).localCheckpoint())))

    val json = s"""{"metric":"ccnet_chain","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"n_docs":$nDocs,"quota":$quota,""" +
      laps.map(_._1).mkString("\"stages\":{", ",", "}}")
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
