package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamIngest

/** Scale rehearsal for the STREAMING family (the batch pipeline and the
  * SPARQL engine have theirs — ScaleProbe10 / ScaleProbeSparql): drives
  * each Structured Streaming operator over a file-source stream of a
  * Sf1Gen documents corpus (e.g. 500k docs at 100 copies, streamed in
  * multiple micro-batches via maxFilesPerTrigger + AvailableNow) and
  * reports drain time and docs/s. What scale must show here: the map-only scorers
  * (dsirScoreStream, decontaminateStream) run at scan speed with
  * constant executor memory, the watermark dedup's state stays bounded
  * by the horizon, and the MinHash-LSH dedup sustains its banded index
  * maintenance per batch.
  *
  * Usage: runMain graft.ScaleProbeStream <sfDir> [outJson]
  */
object ScaleProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docsPath = s"$sfDir/documents.parquet"
    val schema = spark.read.parquet(docsPath).schema
    val sf01 = "/root/testdata/sf0.1"
    val static = graft.core.Tables.t(spark, sf01, "documents")
    val target = static.filter(col("source") === "src0")
    val raw = static.filter(col("source") =!= "src0")
    val evalDf = static.filter(col("doc_id") % 100 === 0)
      .select("doc_id", "text")

    def tmpDir(p: String): String =
      java.nio.file.Files.createTempDirectory(p).toString

    /** Drain the whole corpus through `mk` in ~8 micro-batches; returns
      * (rows that reached the sink, wall seconds). */
    def runStream(name: String)(mk: DataFrame => DataFrame)
        : (Long, Double) = {
      val in = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4").parquet(docsPath)
      val out = mk(in)
      val n = new java.util.concurrent.atomic.AtomicLong
      val t0 = System.nanoTime()
      val q = out.writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir(s"probe_${name}_ckpt"))
        .foreachBatch { (b: Dataset[Row], _: Long) =>
          n.addAndGet(b.count()); ()
        }
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stream1] $name rows=${n.get} sec=$sec%.1f " +
        f"(${n.get / sec}%.0f docs/s)")
      (n.get, sec)
    }

    // 1. map-only scoring path: DSIR log-weight + bloom decontamination
    //    annotation in one pass — no state store, broadcast-only sides
    val score = runStream("dsir_decontaminate") { in =>
      StreamIngest.decontaminateStream(
        StreamIngest.dsirScoreStream(in, target, raw, "text"),
        evalDf, "doc_id", "text", k = 8)
    }

    // 2. stateful exact dedup within a watermark horizon: state keyed by
    //    the text, bounded by the horizon. Event times are synthesized
    //    INSIDE the horizon (doc_id % 3600 s, 1 h watermark) so file-read
    //    order can never make a row late — the probe must measure dedup
    //    state at 100x keys, not watermark late-drops
    val dedup = runStream("watermark_dedup") { in =>
      StreamIngest.dedupWithinWatermark(
        in.withColumn("ts",
          timestamp_seconds(col("doc_id") % 3600)),
        "ts", "1 hour", Seq("text"))
    }

    val totalDocs = spark.read.parquet(docsPath).count()

    // shared drain watcher for foreachBatch streams that manage their
    // own sinks:
    // cumulative input-row counting via a listener, NOT recentProgress:
    // that is a bounded ring (default 100 entries), so a stream with
    // more micro-batches than the ring silently undercounts forever
    // and the watcher would sys.error on a healthy drain. The `start`
    // thunk runs AFTER the listener registers so no early batch's
    // event is missed; probes here run one query at a time, which is
    // what lets the listener count all progress events unfiltered.
    def drain(start: => org.apache.spark.sql.streaming.StreamingQuery,
              what: String): Double = {
      val seen = new java.util.concurrent.atomic.AtomicLong
      val listener =
        new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(
              e: org.apache.spark.sql.streaming.StreamingQueryListener
                .QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: org.apache.spark.sql.streaming.StreamingQueryListener
                .QueryProgressEvent): Unit = {
            seen.addAndGet(e.progress.numInputRows); ()
          }
          override def onQueryTerminated(
              e: org.apache.spark.sql.streaming.StreamingQueryListener
                .QueryTerminatedEvent): Unit = ()
        }
      spark.streams.addListener(listener)
      try {
        val t1 = System.nanoTime()
        val q2 = start
        val dl = System.nanoTime() + 15L * 60 * 1000 * 1000 * 1000
        while (seen.get < totalDocs) {
          Thread.sleep(500)
          q2.exception.foreach(throw _)
          if (System.nanoTime() > dl)
            sys.error(
              s"$what drain stalled: ${seen.get} of $totalDocs rows")
        }
        // progress for the final batch can surface before its sink job
        // fully commits — stopping here truncates the last batch's
        // output (observed: 375001 of 500000 rows). Wait for the
        // trigger to go idle with no data pending before stop.
        while (q2.status.isTriggerActive || q2.status.isDataAvailable) {
          Thread.sleep(200)
          q2.exception.foreach(throw _)
        }
        q2.stop()
        (System.nanoTime() - t1) / 1e9
      } finally spark.streams.removeListener(listener)
    }

    // 3. MinHash-LSH near-dup dedup with a persistent band index,
    //    maintained across micro-batches (foreachBatch manages its own
    //    sinks, so it runs outside runStream's counter)
    val idxDir = tmpDir("probe_lsh_idx") + "/index"
    val outDir = tmpDir("probe_lsh_out") + "/kept"
    val lshSec = drain(StreamIngest.minhashDedupStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8").parquet(docsPath)
        .select("doc_id", "text"),
      "doc_id", "text", idxDir, outDir, tmpDir("probe_lsh_ckpt")),
      "minhash_lsh")
    val kept = spark.read.parquet(outDir).count()
    println(f"[stream1] minhash_lsh_dedup in=$totalDocs kept=$kept " +
      f"sec=$lshSec%.1f (${totalDocs / lshSec}%.0f docs/s)")

    // 4. saved-model LM scoring in flight (lmScoreStream): train ONCE
    //    on the static corpus, then every arriving doc scores against
    //    the saved per-order count tables — the train-once/score-many
    //    contract under streaming load
    val lmModelDir = tmpDir("probe_lm") + "/model"
    graft.operators.TextAnalysis.saveLmModel(static, "text", lmModelDir,
      order = 3, minCount = 2)
    val lmOut = tmpDir("probe_lm_out") + "/scored"
    val lmSec = drain(StreamIngest.lmScoreStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8").parquet(docsPath)
        .select("doc_id", "text"),
      "doc_id", "text", lmModelDir, lmOut, tmpDir("probe_lm_ckpt")),
      "lm_score")
    val lmRows = spark.read.parquet(lmOut).count()
    println(f"[stream1] lm_score_stream rows=$lmRows sec=$lmSec%.1f " +
      f"(${lmRows / lmSec}%.0f docs/s)")

    // 5. streaming ingest INTO the inverted text index
    //    (textIndexStream): one snapshot per micro-batch, then one
    //    BM25 query against everything ingested
    val sIdx = tmpDir("probe_idx") + "/index"
    val idxSec = drain(StreamIngest.textIndexStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "8").parquet(docsPath)
        .select("doc_id", "text"),
      "doc_id", "text", sIdx, tmpDir("probe_idx_ckpt")),
      "text_index")
    val tq0 = System.nanoTime()
    val idxHits = graft.operators.Ranking.bm25TopKFromIndex(spark,
      sIdx, Seq("dup", "join", "spark"), k = 20).count()
    val idxQuerySec = (System.nanoTime() - tq0) / 1e9
    println(f"[stream1] text_index_stream ingest_sec=$idxSec%.1f " +
      f"(${totalDocs / idxSec}%.0f docs/s) query_sec=$idxQuerySec%.2f " +
      f"hits=$idxHits")

    val json =
      s"""{"metric":"scale_probe_stream","sf":"$sfDir",""" +
      s""""dsir_decontaminate":{"rows":${score._1},"sec":${score._2}},""" +
      s""""watermark_dedup":{"rows":${dedup._1},"sec":${dedup._2}},""" +
      s""""minhash_lsh_dedup":{"in":$totalDocs,"kept":$kept,""" +
      s""""sec":$lshSec},""" +
      s""""lm_score_stream":{"rows":$lmRows,"sec":$lmSec},""" +
      s""""text_index_stream":{"in":$totalDocs,"ingest_sec":$idxSec,""" +
      s""""query_sec":$idxQuerySec,"hits":$idxHits}}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
