package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.Dedup.dedupAgainstIndex]]'s core
  * claim: as monthly snapshots accumulate, probing the NEXT snapshot
  * re-reads only the fixed-width index — never history's text — so
  * per-snapshot cost should grow only with the index SCAN term, not
  * with re-shingling the past. Splits the corpus into `n` equal
  * snapshots by id order and probes them sequentially against one
  * growing index, recording per-snapshot wall time, verdict mix, and
  * the index row count it probed against. The disk probe is recorded
  * beside the run per the standing discipline.
  *
  * Snapshot ids are `snap%05d` (zero-padded so they sort
  * lexicographically in processing order — the index contract). This
  * width is INCOMPATIBLE with the pre-r15 `snap%02d` layout
  * ("snap00003" < "snap01" lexicographically, so a resumed run over
  * an old-format dir would read empty history and keep everything);
  * safe here only because every run creates a FRESH temp index dir —
  * never point this probe at a persisted old-format index.
  *
  * Usage: runMain graft.ScaleProbeIncr <sfDir> [nSnapshots] [outJson]
  */
object ScaleProbeIncr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val n = args.lift(1).map(_.toInt).getOrElse(5)
    val outJson = args.lift(2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dd = graft.probe.DiskProbe.writeMBps()
    println(f"[incr] dd $dd%.0f MB/s")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm page cache
    val ids = docs.agg(min("doc_id"), max("doc_id")).collect()(0)
    val (lo, hi) = (ids.getLong(0), ids.getLong(1))
    val span = (hi - lo + 1 + n - 1) / n
    val dir = java.nio.file.Files
      .createTempDirectory("graft-incr-").toString
    // untimed warm pass on a throwaway index: codegen + JIT for the
    // signature kernels and both probe joins (the r13 cluster-probe
    // advice — without it snapshot 0 absorbs the session cold start)
    graft.operators.Dedup.dedupAgainstIndex(
      docs.filter(col("doc_id") < lo + span), "doc_id", "text",
      java.nio.file.Files.createTempDirectory("graft-incr-warm-")
        .toString, "warm")

    val laps = (0 until n).map { i =>
      val snap = docs.filter(col("doc_id") >= lo + i * span &&
        col("doc_id") < lo + (i + 1) * span)
      val idxRows =
        if (i == 0) 0L
        else spark.read.parquet(s"$dir/bands").count() +
          spark.read.parquet(s"$dir/fp").count()
      val t0 = System.nanoTime()
      val dec = graft.operators.Dedup.dedupAgainstIndex(
        snap, "doc_id", "text", dir, f"snap$i%05d")
      val sec = (System.nanoTime() - t0) / 1e9
      val mix = dec.groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      println(f"[incr] snap$i%05d sec=$sec%.1f idx_rows=$idxRows " +
        s"mix=$mix")
      f""""snap$i%05d":{"sec":$sec%.1f,"index_rows_probed":$idxRows,""" +
        s""""keep":${mix.getOrElse("keep", 0L)},""" +
        s""""drop_exact":${mix.getOrElse("drop_exact", 0L)},""" +
        s""""drop_near":${mix.getOrElse("drop_near", 0L)}}"""
    }
    // compaction stage: shrink the index to distinct keys, then prove
    // the replay contract survives by re-probing the LAST snapshot and
    // comparing its verdict mix (must be identical post-compaction)
    val lastSnap = docs.filter(col("doc_id") >= lo + (n - 1) * span &&
      col("doc_id") < lo + n.toLong * span)
    def mixOf(snapId: String) =
      graft.operators.Dedup.dedupAgainstIndex(
          lastSnap, "doc_id", "text", dir, snapId)
        .groupBy("verdict").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val preMix = mixOf(f"snap${n - 1}%05d")
    def idxRows() = spark.read.parquet(s"$dir/bands").count() +
      spark.read.parquet(s"$dir/fp").count()
    val pre = idxRows()
    val t0 = System.nanoTime()
    graft.operators.Dedup.compactDedupIndex(spark, dir)
    val cSec = (System.nanoTime() - t0) / 1e9
    val post = idxRows()
    val postMix = mixOf(f"snap${n - 1}%05d")
    val replayOk = preMix == postMix
    println(f"[incr] compact: $pre -> $post rows " +
      f"(${pre.toDouble / post}%.1fx) in $cSec%.1f s, " +
      s"replay identical: $replayOk")
    val compactJson =
      f""""compaction":{"rows_before":$pre,"rows_after":$post,""" +
        f""""sec":$cSec%.1f,"replay_identical":$replayOk}"""
    val json = s"""{"metric":"incr_dedup","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"n_snapshots":$n,$compactJson,""" +
      laps.mkString("\"snapshots\":{", ",", "}}")
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
