package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Viral-line skew probe for [[graft.operators.Dedup.dedupLinesGlobal]]
  * (r12 verdict task 2): plant one line into EVERY document of the
  * sf10 corpus (500k docs) and measure whether the operator's shuffles
  * degenerate — and whether AQE's OptimizeSkewedJoin would need to
  * rescue it.
  *
  * The shape analysis this probe tests: the operator should have NO
  * skewed partition by construction —
  *   - the winner election `groupBy(line).agg(min(struct(id,pos)))`
  *     partial-aggregates map-side, so the viral line reaches the
  *     reducer as one row per map task, not 500k rows;
  *   - the semi-join's equi-keys are BOTH `line` and
  *     `struct(id,pos) = w`, and (id,pos) is unique per exploded row,
  *     so hash partitioning spreads the 500k viral-line rows uniformly
  *     instead of hashing them all to one reducer.
  * The contrast arm runs the naive shape (join keyed on `line` alone —
  * what an implementation without the struct equality would shuffle):
  * there the viral key IS one reducer partition, and the probe records
  * whether AQE OptimizeSkewedJoin splits it (left-semi left-side
  * splits are legal) at default thresholds and at sensitized ones
  * (the 500k-row viral partition is ~tens of MB at sf10 — under the
  * 256MB default threshold; at 100 TB the same key is ~2500× that and
  * the default threshold binds).
  *
  * Artifact: per-arm wall seconds, worst-stage max/median task time
  * (the spread is the skew signal), and whether the final adaptive
  * plan contains a skew=true join, plus the dd disk-health number.
  *
  * Usage: runMain graft.ScaleProbeLineSkew [sfDir] [outJson]
  */
object ScaleProbeLineSkew {

  // per-stage task durations, reset between arms
  private class TaskStats extends SparkListener {
    val byStage = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null && te.taskInfo.successful) {
        byStage.computeIfAbsent(te.stageId,
          _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
          .add(te.taskInfo.duration)
      }
    }
    def reset(): Unit = byStage.clear()
    /** (stageId, maxMs, medianMs, nTasks) of the stage with the
      * largest single task — where skew shows first. */
    def worst(): (Int, Long, Long, Int) = {
      import scala.jdk.CollectionConverters._
      val all = byStage.asScala.toSeq.map { case (sid, q) =>
        val ds = q.asScala.toSeq.sorted
        (sid, ds.last, ds(ds.size / 2), ds.size)
      }
      if (all.isEmpty) (-1, 0L, 0L, 0)
      else all.maxBy(_._2)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf10")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)
    val dd = graft.probe.DiskProbe.jsonFragment()
    println(s"[line-skew] {$dd}")

    val viral = "this exact boilerplate line appears in every single " +
      "document of the corpus"
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit("\n" + viral)).as("text"))

    def lines(df: DataFrame): DataFrame =
      df.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))

    /** run body, return (sec, worst-stage spread, skew-split?). */
    def timed(label: String)(body: => Long)
        : (Double, (Int, Long, Long, Int)) = {
      stats.reset()
      val t0 = System.nanoTime()
      val n = body
      val sec = (System.nanoTime() - t0) / 1e9
      val w = stats.worst()
      println(f"[line-skew] $label%-28s $sec%7.1f s  rows=$n%d  " +
        f"worst stage ${w._1}: max ${w._2}ms median ${w._3}ms " +
        f"over ${w._4} tasks")
      (sec, w)
    }

    // arm 1: the real operator, viral line planted in all 500k docs
    var operatorJoin = ""
    val (sec1, w1) = timed("operator_viral") {
      val out = graft.operators.Dedup
        .dedupLinesGlobal(docs, "doc_id", "text")
      val adf = out.agg(sum("n_kept_lines"))
      val n = adf.collect()(0).getLong(0)
      // proof the semi-join keys include the unique (id,pos) struct —
      // the reason a corpus-viral line hashes uniformly instead of
      // into one reducer partition
      operatorJoin = adf.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("LeftSemi"))
        .take(1).mkString.trim.take(200)
      println(s"[line-skew]   operator join node: $operatorJoin")
      n
    }

    // arm 2: same corpus WITHOUT the viral line (baseline cost)
    val (sec2, w2) = timed("operator_clean") {
      val out = graft.operators.Dedup.dedupLinesGlobal(
        graft.core.Tables.t(spark, sfDir, "documents")
          .select(col("doc_id"), col("text")),
        "doc_id", "text")
      out.agg(sum("n_kept_lines")).collect()(0).getLong(0)
    }

    // arm 3: the NAIVE shape — inner join keyed on `line` alone, the
    // shuffle a struct-less implementation would run; default AQE
    // skew thresholds (256MB: the sf10 viral partition is below it)
    def naive(): Long = {
      val l = lines(docs)
      val winners = l.groupBy("line")
        .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      val joined = l.join(winners, Seq("line"))
      val adf = joined.agg(count(lit(1)))
      val n = adf.collect()(0).getLong(0)
      val plan = adf.queryExecution.executedPlan.toString
      lastSkew = plan.contains("skew=true")
      lastJoin = plan.linesIterator.filter(_.contains("Join"))
        .take(1).mkString.trim.take(120)
      println(s"[line-skew]   naive skew split in final plan: " +
        s"$lastSkew  join node: $lastJoin")
      n
    }
    val (sec3, w3) = timed("naive_line_key_default")(naive())
    val split3 = lastSkew
    val join3 = lastJoin

    // arm 4: naive shape with SENSITIZED skew thresholds — the
    // mechanism AQE applies when the viral partition crosses the
    // threshold. NOTE the first sensitized attempt (4MB threshold)
    // did NOT split: 500k IDENTICAL viral lines LZ4-compress to
    // almost nothing in the shuffle, and AQE's skew detection is
    // byte-based — compressible duplicate-key skew is a detection
    // blind spot (row-count skew without byte skew). 64KB/factor-2
    // probes whether the mechanism engages at all on this shape.
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "64KB")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "64KB")
    val (sec4, w4) = timed("naive_line_key_sensitized")(naive())
    val split4 = lastSkew
    val join4 = lastJoin

    def wj(w: (Int, Long, Long, Int)) =
      s"""{"max_task_ms":${w._2},"median_task_ms":${w._3},""" +
        s""""n_tasks":${w._4}}"""
    val json =
      s"""{"metric":"line_dedup_viral_skew","sf_dir":"$sfDir",$dd,""" +
      f""""operator_viral":{"sec":$sec1%.1f,"worst":${wj(w1)},""" +
      s""""join_node":"${operatorJoin.replace("\"", "'")}"},""" +
      f""""operator_clean":{"sec":$sec2%.1f,"worst":${wj(w2)}},""" +
      f""""naive_default":{"sec":$sec3%.1f,"skew_split":$split3,""" +
      s""""join_node":"${join3.replace("\"", "'")}",""" +
      s""""worst":${wj(w3)}},""" +
      f""""naive_sensitized":{"sec":$sec4%.1f,"skew_split":$split4,""" +
      s""""join_node":"${join4.replace("\"", "'")}",""" +
      s""""worst":${wj(w4)}}}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }

  // final-adaptive-plan skew marker / join node of the latest naive()
  private var lastSkew = false
  private var lastJoin = ""
}
