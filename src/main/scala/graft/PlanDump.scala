package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Ranking, TextAnalysis}

/** Dev-only: dump the INTERNAL physical plans that the public APIs hide
  * behind localCheckpoint or a write action — before-shapes replicated
  * inline (value-identical, the reverted/previous formulations),
  * after-shapes from the live operators. Writes plans/<round>/<name>.txt.
  * Not driver contract.
  *
  * Usage: runMain graft.PlanDump [outDir] [which]
  *   which = r18 (default) | r17 (the round-17 dumps, kept reproducible)
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("/root/repo/plans/r18")
    val which = args.lift(1).getOrElse("r18")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))

    def planText(df: DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    def dump(name: String, sections: (String, DataFrame)*): Unit = {
      val txt = sections.map { case (hdr, df) =>
        s"---- $hdr ----\n" + planText(df)
      }.mkString("\n")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name")
    }

    if (which == "r18") {
      // ---- p81/p83 bm25 index build: two-pass doclens (before) vs
      // one-pass sentinel postings (after). The write action itself is
      // not explainable; dumped frames are exactly what each pass
      // writes / aggregates.
      {
        val F = graft.functions.F
        val tokens = docs.select(col("doc_id"),
          F.wordsArray(col("text")).as("__ws"))
        val withLen = tokens.select(col("doc_id"),
          size(col("__ws")).cast("long").as("dl"), col("__ws"))
        val oldPostings = withLen
          .select(col("doc_id"), col("dl"),
            explode(col("__ws")).as("term"))
          .groupBy("term", "doc_id")
          .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
          .withColumn("snap", lit("base"))
          .repartitionByRange(col("term"))
          .sortWithinPartitions("term", "doc_id")
        val oldDoclens = withLen.select(col("doc_id"), col("dl"),
          lit("base").as("snap"))
        dump("p81_bm25_index_build_before",
          "pass 1: postings write frame" -> oldPostings,
          "pass 2: doclens write frame (second corpus scan+tokenize)" ->
            oldDoclens)
        val newPostings = withLen
          .select(col("doc_id"), col("dl"),
            explode(concat(array(lit("")),
              coalesce(col("__ws"), array().cast("array<string>"))))
              .as("term"))
          .groupBy("term", "doc_id")
          .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
          .withColumn("snap", lit("base"))
          .repartitionByRange(col("term"), col("doc_id"))
          .sortWithinPartitions("term", "doc_id")
        dump("p81_bm25_index_build_after",
          "single pass: sentinel postings write frame" -> newPostings)
        // stats read-back: doclens table scan (before) vs pruned
        // sentinel scan of postings (after) — built on real dirs
        val dir = java.nio.file.Files
          .createTempDirectory("graft-plandump-idx-").toString
        Ranking.buildTextIndex(docs, "doc_id", "text", dir)
        dump("p81_bm25_index_stats_after",
          "corpus-stats scan (sentinel rows only, pruned)" ->
            spark.read.parquet(s"$dir/postings")
              .filter(col("snap").isin("base"))
              .filter(col("term") === "")
              .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")))
        dump("p81_bm25_index_query_after",
          "query path (unchanged shape + sentinel exclusion pushed)" ->
            Ranking.bm25TopKFromIndex(spark, dir,
              Seq("dup", "join", "spark"), k = 20))
      }

      // ---- p72/p73/p76 saved-LM scoring: per-broadcast parquet
      // re-reads (before) vs one pinned read (after)
      {
        val dir = java.nio.file.Files
          .createTempDirectory("graft-plandump-lm-").toString
        TextAnalysis.saveLmModel(docs.filter(col("doc_id") % 10 =!= 0),
          "text", dir, order = 3, minCount = 2, portableHash = true,
          langCol = Some("lang"))
        val ev = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("sid"), col("lang"), col("text"))
        // before-replica: the r17 shape — per-k views over the pruned
        // parquet read, every broadcast build re-scans the model
        val kvLines = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(dir, "params.lm.txt")), "UTF-8")
          .trim.split("\n")
        val langNv = kvLines.tail.map(_.split(" ").map(_.split("=", 2))
          .map(a => a(0) -> a(1)).toMap)
          .map(m => (m("lang"), m("n").toLong, m("v").toLong))
        import scala.jdk.CollectionConverters._
        val nvDf = spark.createDataFrame(
          langNv.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))
            .toSeq.asJava,
          org.apache.spark.sql.types.StructType.fromDDL(
            "lang STRING, __n BIGINT, __v BIGINT"))
        val listed = spark.read
          .schema("h BIGINT, c BIGINT, lang STRING, k INT")
          .parquet(s"$dir/counts")
          .filter(col("lang").isin(langNv.map(_._1).toSeq: _*))
        val cnts = (1 to 3).map { k =>
          listed.filter(col("k") === k)
            .select(col("lang"), col("h").as(s"nk$k"),
              col("c").as(s"cn$k"))
        }
        dump("p73_lm_scorer_before",
          "r17 shape: every count join re-reads counts parquet" ->
            TextAnalysis.lmBackoffScore(ev, "sid", "text", cnts,
              Right(nvDf), 3, 2, 5, portableHash = true,
              langCol = Some("lang"), broadcastModel = true))
        dump("p73_lm_scorer_after",
          "pre-pin counts read (manifest partition pruning lives here)"
            -> TextAnalysis.lmSavedCounts(spark, dir),
          "live scorer: joins consume the pinned counts" ->
            TextAnalysis.ngramLmScoreWithModel(dir, ev, "sid", "text",
              langCol = Some("lang")))
      }
    }

    // curation two-pass rank: live (separate scans per pass) vs a
    // shared explicit repartition consumed by both the cumsum window
    // and the totals aggregate. Dumped with AQE OFF so plan-level
    // ReuseExchange (if it fires) is visible in the explain output.
    if (which == "cur") {
      import org.apache.spark.sql.expressions.Window
      val aqeKey = "spark.sql.adaptive.enabled"
      spark.conf.set(aqeKey, "false")
      def curInput: DataFrame = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.subwordCountEstimate(col("text")).as("n_tok"))
      val key = graft.operators.Curation.shuffleKey(col("doc_id"), 42)
      val chunkC = substring(key, 1, 3)
      def liveFrame: DataFrame = {
        val df = curInput
        val local = df.withColumn("_key", key)
          .withColumn("_kchunk", chunkC)
          .withColumn("_local_cum", sum(col("n_tok")).over(
            Window.partitionBy("lang", "_kchunk").orderBy("_key")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val prefixes = df.withColumn("_kchunk", chunkC)
          .groupBy(col("lang"), col("_kchunk"))
          .agg(sum(col("n_tok")).as("_tot"))
          .withColumn("_prefix", coalesce(sum(col("_tot")).over(
            Window.partitionBy("lang").orderBy("_kchunk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("lang").as("_pg"), col("_kchunk"), col("_prefix"))
        local.join(broadcast(prefixes),
            col("lang") === col("_pg") &&
              local("_kchunk") === prefixes("_kchunk"))
          .filter((col("_prefix") + col("_local_cum")).cast("long")
            <= 3000)
          .drop("_key", "_kchunk", "_local_cum", "_pg", "_prefix")
      }
      def sharedFrame: DataFrame = {
        val keyed = curInput.withColumn("_key", key)
          .withColumn("_kchunk", chunkC)
          .repartition(col("lang"), col("_kchunk"))
        val local = keyed.withColumn("_local_cum", sum(col("n_tok")).over(
          Window.partitionBy("lang", "_kchunk").orderBy("_key")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val prefixes = keyed.groupBy(col("lang"), col("_kchunk"))
          .agg(sum(col("n_tok")).as("_tot"))
          .withColumn("_prefix", coalesce(sum(col("_tot")).over(
            Window.partitionBy("lang").orderBy("_kchunk")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("lang").as("_pg"), col("_kchunk").as("_pk"),
            col("_prefix"))
        local.join(broadcast(prefixes),
            col("lang") === col("_pg") && col("_kchunk") === col("_pk"))
          .filter((col("_prefix") + col("_local_cum")).cast("long")
            <= 3000)
          .drop("_key", "_kchunk", "_local_cum", "_pg", "_pk", "_prefix")
      }
      dump("curation_rank_live", "live two-pass (AQE off)" -> liveFrame)
      dump("curation_rank_shared",
        "shared repartition (AQE off)" -> sharedFrame)
      Seq("curation_rank_live" -> liveFrame,
          "curation_rank_shared" -> sharedFrame).foreach { case (n, f) =>
        val p = planText(f)
        println(s"[cur] $n scans=${"Scan parquet".r.findAllIn(p).size} " +
          s"exchanges=${"Exchange".r.findAllIn(p).size} " +
          s"reused=${"ReusedExchange".r.findAllIn(p).size}")
      }
      spark.conf.set(aqeKey, "true")
    }

    if (which == "r17") r17Dumps(spark, docs, outDir)
    spark.stop()
  }

  /** The round-17 dumps, kept reproducible (plans/r17 is committed). */
  private def r17Dumps(spark: SparkSession, docs: DataFrame,
                       outDir: String): Unit = {
    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name")
    }

    // ---- p68 probe: live (after) --------------------------------------
    {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-plandump-").toString
      Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir, "snapA", portableHash = true)
      val snap = docs.filter(col("doc_id") % 2 === 1)
      val fpDf = snap.select(col("doc_id").as("id"),
        TextAnalysis.fingerprintMd5(col("text")).as("fp"))
      val banded = Dedup.minhashSignatures(snap, "doc_id", "text", 3, 32,
          portableHash = true)
        .select(col("id"),
          posexplode(Dedup.bandBucketArray(col("sig"), 16, 2)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val idxFp = spark.read.parquet(s"$dir/fp").select("fp")
      val idxBands = spark.read.parquet(s"$dir/bands")
        .select("band", "bucket")
      dump("p68_probe_after",
        Dedup.dedupProbe(fpDf, banded, idxFp, idxBands))
      // before-shape replica (the pre-r17 probe), same inputs
      val hitFps = idxFp
        .join(fpDf.select("fp").filter(col("fp").isNotNull).distinct(),
          Seq("fp"), "left_semi").distinct()
      val hitBuckets = idxBands
        .join(banded.select("band", "bucket").distinct(),
          Seq("band", "bucket"), "left_semi").distinct()
      val dropExact = fpDf.join(hitFps, Seq("fp"), "left_semi").select("id")
        .unionByName(fpDf
          .join(fpDf.groupBy("fp").agg(min(col("id")).as("first_id")),
            Seq("fp"))
          .filter(col("id") > col("first_id")).select("id"))
        .distinct()
      val dropNear =
        banded.join(hitBuckets, Seq("band", "bucket"), "left_semi")
          .select("id")
          .unionByName(banded
            .join(banded.groupBy("band", "bucket")
                .agg(min(col("id")).as("first_id")),
              Seq("band", "bucket"))
            .filter(col("id") > col("first_id")).select("id"))
          .distinct()
      dump("p68_probe_before", fpDf
        .join(dropExact.withColumn("__de", lit(true)), Seq("id"), "left")
        .join(dropNear.withColumn("__dn", lit(true)), Seq("id"), "left")
        .select(col("id"), col("fp"),
          when(col("__de"), lit("drop_exact"))
            .when(col("__dn"), lit("drop_near"))
            .otherwise(lit("keep")).as("verdict")))
    }

    // ---- p67 gradient iteration: after (live cache shape) vs before --
    {
      val F = graft.functions.F
      val buckets = 64
      val df = docs.withColumn("y", (col("lang") === "en").cast("long"))
      def featOf(rep: Boolean): DataFrame = {
        val f0 = df.select(col("doc_id").as("id"), col("y"),
            explode(F.wordHashes(col("text"), true)).as("h"))
          .select(col("id"), col("y"),
            pmod(col("h"), lit(buckets.toLong)).as("b"))
          .groupBy("id", "y", "b").agg(count(lit(1)).as("x"))
        if (rep) f0.repartition(col("id")) else f0
      }
      def iterPlan(feat: DataFrame): DataFrame = {
        val warr = typedLit(Array.fill(buckets)(0L))
        val scale = 1L << 20
        val resid = feat.groupBy("id", "y")
          .agg(sum(col("x") * element_at(warr, col("b").cast("int") + 1))
            .as("z"))
          .select(col("id"),
            (greatest(lit(0L), least(lit(4 * scale),
              lit(2 * scale) + col("z"))) - lit(4 * scale) * col("y"))
              .as("r"))
        feat.join(resid, Seq("id"))
          .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
      }
      // cache() so the iteration plan sees InMemoryRelation partitioning
      val fOld = featOf(rep = false).cache(); fOld.count()
      dump("p67_iteration_before", iterPlan(fOld)); fOld.unpersist()
      val fNew = featOf(rep = true).cache(); fNew.count()
      dump("p67_iteration_after", iterPlan(fNew)); fNew.unpersist()
    }

    // ---- p51 winnowing pairs: before-replica (HOF fps chain) ---------
    {
      val hs0 = graft.functions.F
        .shinglePosHashes(col("text"), 5, true)
      val hs = transform(hs0, h => h.bitwiseAND(lit(Long.MaxValue)))
      val base = docs.select(col("doc_id").as("id"), hs.as("hs"))
        .withColumn("fps",
          when(size(col("hs")) === 0, array().cast("array<bigint>"))
          .when(size(col("hs")) < 8, array(array_min(col("hs"))))
          .otherwise(array_sort(array_distinct(
            transform(sequence(lit(0), size(col("hs")) - 8),
              i => array_min(slice(col("hs"), i + lit(1), lit(8))))))))
      val u0 = base.select(col("id"), col("fps"))
        .localCheckpoint(eager = false)
        .select(col("id"), explode(col("fps")).as("fp"))
      val rare = u0.groupBy("fp")
        .agg(count(lit(1)).as("_df")).filter(col("_df") <= 128)
        .select("fp")
      val u = u0.join(rare, Seq("fp"), "left_semi")
      dump("p51_winnowing_pairs_before", u.as("a").join(u.as("b"),
          col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
        .agg(count(lit(1)).as("n_shared")))
      dump("p51_winnowing_pairs_after",
        Dedup.winnowingPairs(docs, "doc_id", "text", k = 5, w = 8,
          maxDf = 128, portableHash = true))
    }
  }
}
