package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Dev-only: dump the INTERNAL physical plans that the public APIs hide
  * behind localCheckpoint (the p67 training iteration, the p68 dedup
  * probe) — before-shapes replicated inline (value-identical, the
  * r17-reverted formulations), after-shapes from the live operators.
  * Writes plans/r17/<name>.txt. Not driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = args.headOption.getOrElse("/root/repo/plans/r17")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")

    def dump(name: String, df: DataFrame): Unit = {
      val qe = df.queryExecution
      val txt = qe.explainString(
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

    spark.stop()
  }
}
