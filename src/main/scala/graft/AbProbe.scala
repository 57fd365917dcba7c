package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dev-only same-JVM A/B harness for the r17 optimization round: the
  * box's write/CPU phases swing 2-20x between runs (SCALE_REHEARSAL),
  * so cross-run bench comparisons cannot attribute a delta to code.
  * This probe interleaves the OLD formulation (replicated inline,
  * value-identical) with the NEW operator in one session, several
  * rounds each, and prints per-variant best/median. Not driver
  * contract.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // page-cache warm
    val which = args.headOption.getOrElse("all")
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def report(name: String, variants: Seq[(String, () => Unit)]): Unit = {
      // one untimed warm pass each, then `rounds` interleaved samples
      variants.foreach(_._2())
      val samples = scala.collection.mutable.Map[String, Vector[Double]]()
        .withDefaultValue(Vector.empty)
      for (_ <- 1 to rounds; (vn, f) <- variants)
        samples(vn) = samples(vn) :+ time(f())
      variants.foreach { case (vn, _) =>
        val s = samples(vn).sorted
        println(f"[ab] $name/$vn best=${s.head}%.3f med=${s(s.size / 2)}%.3f worst=${s.last}%.3f")
      }
    }

    // ---- A: line-dedup election (p58 shape) --------------------------
    def oldElect(df: DataFrame, idCol: String): DataFrame = {
      val lined = df.select(col(idCol),
        translate(col("text"), " ", "\n").as("text"))
      val candidates = lined.select(col(idCol),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      val winners = candidates.groupBy("line")
        .agg(min(struct(col(idCol), col("pos"))).as("w"))
      val kept = candidates.join(winners,
        candidates("line") === winners("line") &&
          struct(candidates(idCol), candidates("pos")) === winners("w"),
        "left_semi")
      val rebuilt = kept.groupBy(idCol).agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line"))).as("deduped"),
        count(lit(1)).as("__nkept"))
      lined.join(rebuilt, Seq(idCol), "left")
        .withColumn("deduped", coalesce(col("deduped"), lit("")))
        .withColumn("n_kept_lines",
          coalesce(col("__nkept"), lit(0L)).cast("long"))
        .drop("__nkept")
    }
    def newElect(df: DataFrame, idCol: String): DataFrame =
      Dedup.dedupLinesGlobal(df.select(col(idCol),
        translate(col("text"), " ", "\n").as("text")), idCol, "text")
    if (which == "all" || which == "elect")
      report("elect", Seq(
        "old" -> (() => oldElect(docs, "doc_id")
          .write.format("noop").mode("overwrite").save()),
        "new" -> (() => newElect(docs, "doc_id")
          .write.format("noop").mode("overwrite").save())))

    // ---- B: dedupAgainstIndex (p68 shape) ----------------------------
    def oldIncr(): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-old-").toString
      def probe(snap: DataFrame, sid: String): DataFrame = {
        val fpDf = snap.select(col("doc_id").as("id"),
            TextAnalysis.fingerprintMd5(col("text")).as("fp"))
          .localCheckpoint()
        val banded =
          Dedup.minhashSignatures(snap, "doc_id", "text", 3, 32, true)
            .select(col("id"),
              posexplode(Dedup.bandBucketArray(col("sig"), 16, 2)))
            .withColumnRenamed("pos", "band")
            .withColumnRenamed("col", "bucket")
            .localCheckpoint()
        val subSchemas = Map(
          "fp" -> "fp STRING, snapshot STRING",
          "bands" -> "band INT, bucket BIGINT, snapshot STRING")
        def readIndex(sub: String, names: Seq[String],
                      empty: Seq[Column]): DataFrame = {
          val path = s"$dir/$sub"
          if (new java.io.File(path).exists())
            spark.read.schema(subSchemas(sub)).parquet(path)
              .filter(col("snapshot") < lit(sid))
              .select(names.map(col): _*)
          else spark.emptyDataFrame.select(empty: _*).limit(0)
        }
        val idxFp = readIndex("fp", Seq("fp"), Seq(lit("").as("fp")))
        val idxBands = readIndex("bands", Seq("band", "bucket"),
          Seq(lit(0).as("band"), lit(0L).as("bucket")))
        // OLD dedupProbe replica (pre-r17): per-family semi-join ∪
        // election-join → distinct, then two left joins
        val hitFps = idxFp
          .join(fpDf.select("fp").filter(col("fp").isNotNull).distinct(),
            Seq("fp"), "left_semi")
          .distinct()
        val hitBuckets = idxBands
          .join(banded.select("band", "bucket").distinct(),
            Seq("band", "bucket"), "left_semi")
          .distinct()
        val dropExact = fpDf.join(hitFps, Seq("fp"), "left_semi")
          .select("id")
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
        val decisions = fpDf
          .join(dropExact.withColumn("__de", lit(true)), Seq("id"), "left")
          .join(dropNear.withColumn("__dn", lit(true)), Seq("id"), "left")
          .select(col("id"), col("fp"),
            when(col("__de"), lit("drop_exact"))
              .when(col("__dn"), lit("drop_near"))
              .otherwise(lit("keep")).as("verdict"))
          .localCheckpoint()
        def writeDelta(df: DataFrame, sub: String): Unit =
          df.withColumn("snapshot", lit(sid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("snapshot")
            .parquet(s"$dir/$sub")
        writeDelta(banded, "bands")
        writeDelta(fpDf, "fp")
        decisions
      }
      val a = probe(docs.filter(col("doc_id") % 2 === 0), "snapA")
      val b = probe(docs.filter(col("doc_id") % 2 === 1), "snapB")
      a.unionByName(b).write.format("noop").mode("overwrite").save()
    }
    def newIncr(): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-new-").toString
      val a = Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", dir, "snapA", portableHash = true)
      val b = Dedup.dedupAgainstIndex(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", dir, "snapB", portableHash = true)
      a.unionByName(b).write.format("noop").mode("overwrite").save()
    }
    if (which == "all" || which == "incr")
      report("incr", Seq("old" -> (() => oldIncr()),
        "new" -> (() => newIncr())))
    if (which == "incr-flip")
      report("incr", Seq("new" -> (() => newIncr()),
        "old" -> (() => oldIncr())))

    // phase breakdown of the old/live dedupAgainstIndex shape
    def phasedIncr(): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-ph-").toString
      def probe(snap: DataFrame, sid: String): DataFrame = {
        val t0 = System.nanoTime()
        val fpDf = snap.select(col("doc_id").as("id"),
            TextAnalysis.fingerprintMd5(col("text")).as("fp"))
          .localCheckpoint()
        val t1 = System.nanoTime()
        val banded =
          Dedup.minhashSignatures(snap, "doc_id", "text", 3, 32, true)
            .select(col("id"),
              posexplode(Dedup.bandBucketArray(col("sig"), 16, 2)))
            .withColumnRenamed("pos", "band")
            .withColumnRenamed("col", "bucket")
            .localCheckpoint()
        val t2 = System.nanoTime()
        val subSchemas = Map(
          "fp" -> "fp STRING, snapshot STRING",
          "bands" -> "band INT, bucket BIGINT, snapshot STRING")
        def readIndex(sub: String, names: Seq[String],
                      empty: Seq[Column]): DataFrame = {
          val path = s"$dir/$sub"
          if (new java.io.File(path).exists())
            spark.read.schema(subSchemas(sub)).parquet(path)
              .filter(col("snapshot") < lit(sid))
              .select(names.map(col): _*)
          else spark.emptyDataFrame.select(empty: _*).limit(0)
        }
        val idxFp = readIndex("fp", Seq("fp"), Seq(lit("").as("fp")))
        val idxBands = readIndex("bands", Seq("band", "bucket"),
          Seq(lit(0).as("band"), lit(0L).as("bucket")))
        val decisions = Dedup.dedupProbe(fpDf, banded, idxFp, idxBands)
          .localCheckpoint()
        val t3 = System.nanoTime()
        def writeDelta(df: DataFrame, sub: String): Unit =
          df.withColumn("snapshot", lit(sid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("snapshot")
            .parquet(s"$dir/$sub")
        writeDelta(banded, "bands")
        writeDelta(fpDf, "fp")
        val t4 = System.nanoTime()
        println(f"[ph] $sid fp=${(t1 - t0) / 1e9}%.3f " +
          f"banded=${(t2 - t1) / 1e9}%.3f probe=${(t3 - t2) / 1e9}%.3f " +
          f"deltas=${(t4 - t3) / 1e9}%.3f")
        decisions
      }
      val a = probe(docs.filter(col("doc_id") % 2 === 0), "snapA")
      val b = probe(docs.filter(col("doc_id") % 2 === 1), "snapB")
      val t5 = System.nanoTime()
      a.unionByName(b).write.format("noop").mode("overwrite").save()
      println(f"[ph] final=${(System.nanoTime() - t5) / 1e9}%.3f")
    }
    if (which == "phases")
      (1 to rounds).foreach(_ => phasedIncr())

    // ---- D: tokenizer kernel vs interpreted HOF (p80/p34 shapes) ----
    def hofWords(c: Column): Column =
      filter(split(lower(c), "\\s+"), w => length(w) > 0)
    def topNgramsWith(ws: Column): DataFrame = {
      val n = 3
      val tok = docs.select(col("doc_id").as("__id"), ws.as("__ws"))
      val grams = when(size(col("__ws")) >= n,
        transform(sequence(lit(1), size(col("__ws")) - lit(n - 1)),
          i => concat_ws(" ", slice(col("__ws"), i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val perDoc = tok.select(explode(grams).as("ngram"), col("__id"))
        .groupBy(col("ngram"), col("__id")).agg(count(lit(1)).as("__c"))
      perDoc.groupBy("ngram")
        .agg(sum(col("__c")).as("total_count"), count(lit(1)).as("n_docs"))
        .orderBy(col("total_count").desc, col("ngram").asc).limit(20)
    }
    def subOld(c: Column): Column = {
      val pieces = filter(split(lower(c), "[^a-z0-9]+"), p => length(p) > 0)
      aggregate(pieces, lit(0L),
        (acc, p) => acc + greatest(ceil(length(p) / 4.0), lit(1L)))
    }
    // ---- E: pageRank co-partitioned loop (p40 shape) -----------------
    // pairs pinned ONCE outside the variants: the expensive upstream
    // must not ride the A/B samples
    lazy val prPairsPinned: DataFrame = Dedup.minhashPairs(docs,
        "doc_id", "text", k = 3, h = 32, bands = 16, threshold = 0.5,
        portableHash = true)
      .select(col("id1"), col("id2")).localCheckpoint()
    def prPairs: DataFrame = prPairsPinned
    def oldPr(): Unit = {
      val ids = docs.select(col("doc_id").as("id"))
      val pairs = prPairs
      val sym = pairs.select(col("id1").as("a"), col("id2").as("b"))
        .unionByName(pairs.select(col("id2").as("a"), col("id1").as("b")))
        .filter(col("a") =!= col("b")).distinct().localCheckpoint()
      val deg = sym.groupBy("a").agg(count(lit(1)).as("deg"))
      val edges = sym.join(deg, "a").localCheckpoint()
      var ranks = ids.select(col("id"), lit(1.0).as("rank"))
      for (i <- 1 to 10) {
        val contrib = edges.join(ranks, edges("a") === ranks("id"))
          .groupBy(col("b").as("id"))
          .agg(sum(col("rank") / col("deg")).as("__c"))
        ranks = ids.select(col("id")).join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(0.15) + lit(0.85) * coalesce(col("__c"), lit(0.0)))
              .as("rank"))
        if (i % 5 == 0 && i < 10) ranks = ranks.localCheckpoint()
      }
      ranks.write.format("noop").mode("overwrite").save()
    }
    def newPr(): Unit =
      graft.operators.GraphAnalytics.pageRank(
          docs.select(col("doc_id").as("id")), prPairs)
        .write.format("noop").mode("overwrite").save()
    if (which == "pr")
      report("pr", Seq("old" -> (() => oldPr()),
        "new" -> (() => newPr())))

    // ---- F: winnowing fps kernel vs interpreted HOF chain ------------
    def oldWinnowBase(k: Int, w: Int): DataFrame = {
      val hs0 = graft.functions.F
        .shinglePosHashes(col("text"), k, true)
      val hs = transform(hs0, h => h.bitwiseAND(lit(Long.MaxValue)))
      docs.select(col("doc_id").as("id"), hs.as("hs"))
        .withColumn("fps",
          when(size(col("hs")) === 0, array().cast("array<bigint>"))
          .when(size(col("hs")) < w, array(array_min(col("hs"))))
          .otherwise(array_sort(array_distinct(
            transform(sequence(lit(0), size(col("hs")) - w),
              i => array_min(slice(col("hs"), i + lit(1), lit(w))))))))
    }
    def oldWinnowPairs(): Unit = {
      val u0 = oldWinnowBase(5, 8).select(col("id"), col("fps"))
        .localCheckpoint(eager = false)
        .select(col("id"), explode(col("fps")).as("fp"))
      val rare = u0.groupBy("fp")
        .agg(count(lit(1)).as("_df")).filter(col("_df") <= 128)
        .select("fp")
      val u = u0.join(rare, Seq("fp"), "left_semi")
      u.as("a").join(u.as("b"),
          col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
        .agg(count(lit(1)).as("n_shared"))
        .write.format("noop").mode("overwrite").save()
    }
    def newWinnowPairs(): Unit =
      Dedup.winnowingPairs(docs, "doc_id", "text", k = 5, w = 8,
          maxDf = 128, portableHash = true)
        .write.format("noop").mode("overwrite").save()
    if (which == "winnow")
      report("winnow", Seq("old" -> (() => oldWinnowPairs()),
        "new" -> (() => newWinnowPairs())))

    // ---- G: bm25 pinned base vs double tokenize (p34 shape) ----------
    def oldBm25(): Unit = {
      val qTerms = Seq("dup", "join", "spark")
      val ws = graft.functions.F.wordsArray(col("text"))
      val tokens = docs.select(col("doc_id"), ws.as("__ws"))
      val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
        (size(col("__ws")) - size(array_remove(col("__ws"), lit(t))))
          .cast("long").as(s"tf_$i")
      }
      val base = tokens.select(
        (col("doc_id") +: size(col("__ws")).cast("long").as("dl") +:
          tfCols): _*)
      val statCols = count(lit(1)).as("n") +:
        avg(col("dl")).as("avgdl") +:
        qTerms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
      val stats = base.agg(statCols.head, statCols.tail: _*).first()
      val n = stats.getAs[Long]("n")
      val avgdl = stats.getAs[Double]("avgdl")
      val idf = qTerms.indices.map { i =>
        val df = stats.getAs[Long](s"df_$i")
        math.log(1.0 + (n - df + 0.5) / (df + 0.5))
      }
      val lenNorm = lit(1.2) * (lit(0.25) +
        lit(0.75) * col("dl").cast("double") / lit(avgdl))
      val score = qTerms.indices.map { i =>
        lit(idf(i)) * (col(s"tf_$i").cast("double") * lit(2.2)) /
          (col(s"tf_$i").cast("double") + lenNorm)
      }.reduce(_ + _)
      val tfTotal = qTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _)
      base.withColumn("tf_total", tfTotal)
        .filter(col("tf_total") > 0)
        .withColumn("score", score)
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(20)
        .write.format("noop").mode("overwrite").save()
    }
    def newBm25(): Unit =
      graft.operators.Ranking.bm25TopK(docs, "doc_id", "text",
          Seq("dup", "join", "spark"), k = 20)
        .write.format("noop").mode("overwrite").save()
    if (which == "bm25")
      report("bm25", Seq("old" -> (() => oldBm25()),
        "new" -> (() => newBm25())))

    if (which == "tok")
      report("tok", Seq(
        "oldgrams" -> (() => topNgramsWith(hofWords(col("text")))
          .write.format("noop").mode("overwrite").save()),
        "newgrams" -> (() => graft.operators.TextAnalysis.topNgrams(
            docs, "doc_id", "text", n = 3, k = 20)
          .write.format("noop").mode("overwrite").save()),
        "oldsub" -> (() => docs.select(sum(subOld(col("text"))))
          .write.format("noop").mode("overwrite").save()),
        "newsub" -> (() => docs.select(
            sum(graft.functions.F.subwordCount(col("text"))))
          .write.format("noop").mode("overwrite").save())))

    // ---- J (r18): dedupAgainstIndex checkpoint/layout probes ----------
    // inline replica of the live operator (minus lock/param checks),
    // parameterized by (eager checkpoints, band-partitioned delta
    // layout) so each axis A/Bs against the live shape
    def incrVariant(eagerCk: Boolean, bandPart: Boolean): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-j-").toString
      def probe(snap: DataFrame, sid: String): DataFrame = {
        val fpDf = snap.select(col("doc_id").as("id"),
            TextAnalysis.fingerprintMd5(col("text")).as("fp"))
          .localCheckpoint(eagerCk)
        val banded =
          Dedup.minhashSignatures(snap, "doc_id", "text", 3, 32, true)
            .select(col("id"),
              posexplode(Dedup.bandBucketArray(col("sig"), 16, 2)))
            .withColumnRenamed("pos", "band")
            .withColumnRenamed("col", "bucket")
            .localCheckpoint(eagerCk)
        val subSchemas = Map(
          "fp" -> "fp STRING, snapshot STRING",
          "bands" -> "band INT, bucket BIGINT, snapshot STRING")
        def readIndex(sub: String, names: Seq[String],
                      empty: Seq[Column]): DataFrame = {
          val path = s"$dir/$sub"
          if (new java.io.File(path).exists())
            spark.read.schema(subSchemas(sub)).parquet(path)
              .filter(col("snapshot") < lit(sid))
              .select(names.map(col): _*)
          else spark.emptyDataFrame.select(empty: _*).limit(0)
        }
        val idxFp = readIndex("fp", Seq("fp"), Seq(lit("").as("fp")))
        val idxBands = readIndex("bands", Seq("band", "bucket"),
          Seq(lit(0).as("band"), lit(0L).as("bucket")))
        val decisions = Dedup.dedupProbe(fpDf, banded, idxFp, idxBands)
          .localCheckpoint()
        def writeDelta(df: DataFrame, sub: String,
                       parts: Seq[String]): Unit =
          df.withColumn("snapshot", lit(sid))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(parts: _*)
            .parquet(s"$dir/$sub")
        writeDelta(banded, "bands",
          if (bandPart) Seq("snapshot", "band") else Seq("snapshot"))
        writeDelta(fpDf, "fp", Seq("snapshot"))
        decisions
      }
      val a = probe(docs.filter(col("doc_id") % 2 === 0), "snapA")
      val b = probe(docs.filter(col("doc_id") % 2 === 1), "snapB")
      a.unionByName(b).write.format("noop").mode("overwrite").save()
    }
    if (which == "incrlazy")
      report("incrlazy", Seq(
        "eager" -> (() => incrVariant(eagerCk = true, bandPart = false)),
        "lazy" -> (() => incrVariant(eagerCk = false, bandPart = false))))
    if (which == "incrlazy-flip")
      report("incrlazy", Seq(
        "lazy" -> (() => incrVariant(eagerCk = false, bandPart = false)),
        "eager" -> (() => incrVariant(eagerCk = true, bandPart = false))))
    if (which == "bandpart")
      report("bandpart", Seq(
        "snaponly" -> (() => incrVariant(eagerCk = true, bandPart = false)),
        "snapband" -> (() => incrVariant(eagerCk = true, bandPart = true))))

    // ---- H (r18): bm25 index build — two-pass doclens vs one-pass
    // sentinel postings (p81/p83 build side) ---------------------------
    def oldIndexBuild(): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-idxold-").toString
      val tokens = docs.select(col("doc_id"),
        graft.functions.F.wordsArray(col("text")).as("__ws"))
      val withLen = tokens.select(col("doc_id"),
        size(col("__ws")).cast("long").as("dl"), col("__ws"))
      val postings = withLen
        .select(col("doc_id"), col("dl"),
          explode(col("__ws")).as("term"))
        .groupBy("term", "doc_id")
        .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
        .withColumn("snap", lit("base"))
      postings.repartitionByRange(col("term"))
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("snap")
        .parquet(s"$dir/postings")
      withLen.select(col("doc_id"), col("dl"), lit("base").as("snap"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("snap")
        .parquet(s"$dir/doclens")
      val st = spark.read.parquet(s"$dir/doclens")
        .filter(col("snap").isin("base"))
        .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).first()
      if (st.getAs[Long]("n") == -1L) println("")
    }
    def newIndexBuild(): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-idxnew-").toString
      graft.operators.Ranking.buildTextIndex(docs, "doc_id", "text", dir)
    }
    if (which == "index")
      report("index", Seq("old" -> (() => oldIndexBuild()),
        "new" -> (() => newIndexBuild())))
    if (which == "index-flip")
      report("index", Seq("new" -> (() => newIndexBuild()),
        "old" -> (() => oldIndexBuild())))

    // ---- I (r18): saved-LM per-lang scoring — per-broadcast parquet
    // re-reads vs one pinned read (p73/p72/p76 score side) -------------
    lazy val lmDir: String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-ab-lm-").toString
      TextAnalysis.saveLmModel(docs.filter(col("doc_id") % 10 =!= 0),
        "text", dir, order = 3, minCount = 2, portableHash = true,
        langCol = Some("lang"))
      dir
    }
    lazy val lmEval: DataFrame = {
      val ev = docs.filter(col("doc_id") % 10 === 0)
      ev.select((col("doc_id") * 3).as("sid"), col("lang"), col("text"))
        .unionAll(ev.select((col("doc_id") * 3 + 1).as("sid"),
          lit("en").as("lang"), col("text")))
        .unionAll(ev.select((col("doc_id") * 3 + 2).as("sid"),
          lit("zz").as("lang"), col("text")))
    }
    def oldLmScore(): Unit = {
      // r17 shape: per-k views over the raw (pruned) parquet read —
      // every broadcast build re-scans the model
      val kvLines = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(lmDir, "params.lm.txt")), "UTF-8")
        .trim.split("\n")
      val kv = kvLines.head.split(" ").map(_.split("=", 2))
        .map(a => a(0) -> a(1)).toMap
      val langNv = kvLines.tail.map(_.split(" ").map(_.split("=", 2))
        .map(a => a(0) -> a(1)).toMap)
        .map(m => (m("lang"), m("n").toLong, m("v").toLong))
      val order = kv("order").toInt
      import scala.jdk.CollectionConverters._
      val nvDf = spark.createDataFrame(
        langNv.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3))
          .toSeq.asJava,
        org.apache.spark.sql.types.StructType.fromDDL(
          "lang STRING, __n BIGINT, __v BIGINT"))
      val listed = spark.read
        .schema("h BIGINT, c BIGINT, lang STRING, k INT")
        .parquet(s"$lmDir/counts")
        .filter(col("lang").isin(langNv.map(_._1).toSeq: _*))
      val cnts = (1 to order).map { k =>
        listed.filter(col("k") === k)
          .select(col("lang"), col("h").as(s"nk$k"), col("c").as(s"cn$k"))
      }
      TextAnalysis.lmBackoffScore(lmEval, "sid", "text", cnts,
          Right(nvDf), order, 2, 5, portableHash = true,
          langCol = Some("lang"), broadcastModel = true)
        .write.format("noop").mode("overwrite").save()
    }
    def newLmScore(): Unit =
      TextAnalysis.ngramLmScoreWithModel(lmDir, lmEval, "sid", "text",
          langCol = Some("lang"))
        .write.format("noop").mode("overwrite").save()
    if (which == "lmpin")
      report("lmpin", Seq("old" -> (() => oldLmScore()),
        "new" -> (() => newLmScore())))
    if (which == "lmpin-flip")
      report("lmpin", Seq("new" -> (() => newLmScore()),
        "old" -> (() => oldLmScore())))

    // ---- K (r18): curation two-pass rank — separate scans vs one
    // shared exchange for the cumsum window and the totals aggregate
    // (p21/p50 budgetSample shape; p33/p44's seededGroupRank is the
    // same machinery with count instead of sum) ------------------------
    {
      import org.apache.spark.sql.expressions.Window
      def curInput: DataFrame = docs.select(col("doc_id"), col("lang"),
        TextAnalysis.subwordCountEstimate(col("text")).as("n_tok"))
      def finish(local: DataFrame, prefixes: DataFrame,
                 kchunkJoin: Column): Unit =
        local.join(broadcast(prefixes),
            col("lang") === col("_pg") && kchunkJoin)
          .filter((col("_prefix") + col("_local_cum")).cast("long")
            <= 3000)
          .drop("_key", "_kchunk", "_local_cum", "_pg", "_prefix")
          .write.format("noop").mode("overwrite").save()
      def liveCur(): Unit = {
        val df = curInput
        val key = graft.operators.Curation.shuffleKey(col("doc_id"), 42)
        val chunkC = substring(key, 1, 3)
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
        finish(local, prefixes,
          local("_kchunk") === prefixes("_kchunk"))
      }
      def sharedCur(ckpt: Boolean): Unit = {
        val df = curInput
        val key = graft.operators.Curation.shuffleKey(col("doc_id"), 42)
        val chunkC = substring(key, 1, 3)
        val keyed0 = df.withColumn("_key", key)
          .withColumn("_kchunk", chunkC)
          .repartition(col("lang"), col("_kchunk"))
        val keyed = if (ckpt) keyed0.localCheckpoint(false) else keyed0
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
        finish(local, prefixes, col("_kchunk") === col("_pk"))
      }
      if (which == "cur" || which == "cur-flip") {
        val variants = Seq(
          "live" -> (() => liveCur()),
          "shared" -> (() => sharedCur(false)),
          "sharedckpt" -> (() => sharedCur(true)))
        report("cur",
          if (which == "cur") variants else variants.reverse)
      }
    }

    // ---- C: classifier training (p67 shape) --------------------------
    // old replica differs only in the missing repartition(col("id"))
    def oldTrain(): Unit = {
      val F = graft.functions.F
      val buckets = 64; val iters = 3; val fracBits = 20; val lrShift = 26
      val scale = 1L << fracBits; val lrP = 1L << lrShift
      val df = docs.withColumn("y", (col("lang") === "en").cast("long"))
      val feat = df.select(col("doc_id").as("id"), col("y"),
          explode(F.wordHashes(col("text"), true)).as("h"))
        .select(col("id"), col("y"),
          pmod(col("h"), lit(buckets.toLong)).as("b"))
        .groupBy("id", "y", "b").agg(count(lit(1)).as("x"))
        .cache()
      var w = Array.fill(buckets)(0L)
      try {
        for (_ <- 1 to iters) {
          val warr = typedLit(w)
          val resid = feat
            .groupBy("id", "y")
            .agg(sum(col("x") * element_at(warr, col("b").cast("int") + 1))
              .as("z"))
            .select(col("id"),
              (greatest(lit(0L), least(lit(4 * scale),
                lit(2 * scale) + col("z"))) - lit(4 * scale) * col("y"))
                .as("r"))
          val grad = feat.join(resid, Seq("id"))
            .groupBy("b").agg(sum(col("r") * col("x")).as("g"))
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          w = w.zipWithIndex.map { case (wb, b) =>
            val g = grad.getOrElse(b.toLong, 0L)
            wb - (g - Math.floorMod(g, lrP)) / lrP
          }
        }
      } finally feat.unpersist()
      if (w.sum == 42L) println("")
    }
    def newTrain(): Unit =
      TextAnalysis.trainLinearClassifier(
        docs.withColumn("y", col("lang") === "en"),
        "doc_id", "text", "y", buckets = 64, iters = 3,
        fracBits = 20, lrShift = 26, portableHash = true)
        .write.format("noop").mode("overwrite").save()
    if (which == "all" || which == "train")
      report("train", Seq("old" -> (() => oldTrain()),
        "new" -> (() => newTrain())))

    spark.stop()
  }
}
