package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profile of the order-5 backoff-LM scoring super-linearity (r15
  * verdict task 3: order-3 pruned chain 5.9 s vs order-5 22.3 s at
  * sf10 — 1.67× the joins, ~3.8× the time — with no recorded split of
  * WHERE the extra time goes). Isolates the scoring pipeline into its
  * three cost centers and times each at order 3 and order 5 on the
  * same corpus:
  *
  *   - `kernel`: the multi-order positional-hash kernel + generate
  *     alone (tokenize once, emit all per-order hash arrays, explode)
  *     — the map-side floor every order pays;
  *   - `counts`: the fused tagged count pass over the train slice
  *     (one scan, one shuffle for all orders) — the train-side cost;
  *   - `score`: the full scorer (kernel + position projection +
  *     2·order−1 count-table joins + the per-doc aggregate).
  *
  * score − kernel − counts ≈ the join/projection band, so the o5/o3
  * ratio per band says whether the super-linearity lives in the
  * kernel (wider arrays), the count shuffle (more grams), or the join
  * stack (9 joins vs 5, wider codegen). Two extra laps bound the
  * join-stack diagnosis: `score_o5_mc8` prunes the tables 4× harder
  * (minCount=8) — if time barely moves, the cost is join COUNT and
  * plan width, not table VOLUME — and `counts_rows` records each
  * order's table sizes so volume is a number, not a guess.
  * The disk + CPU probes are recorded beside the run per the standing
  * discipline.
  *
  * Usage: runMain graft.ScaleProbeLmProfile <sfDir> [outJson]
  */
object ScaleProbeLmProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf10")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val T = graft.operators.TextAnalysis
    val F = graft.functions.F

    val dd = graft.probe.DiskProbe.writeMBps()
    val cpu = graft.probe.DiskProbe.cpuRefSec()
    println(f"[lmprof] dd $dd%.0f MB/s cpuRef $cpu%.2f s")
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    docs.write.format("noop").mode("overwrite").save() // warm page cache
    val train = docs.filter(col("doc_id") % 10 =!= 0)

    def lap(name: String,
            chain: () => org.apache.spark.sql.DataFrame): String = {
      chain().write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      chain().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[lmprof] $name sec=$sec%.1f")
      f""""$name":$sec%.2f"""
    }
    // the kernel band: what the score side pays before any join —
    // same generate shape as the scorer's position stream
    def kernel(order: Int) = () => docs
      .select(posexplode(
        F.shinglePosHashesUpTo(col("text"), order))
        .as(Seq("k0", "arr")))
      .select(explode(col("arr")).as("h"))
    // the train band: the fused one-pass count aggregate
    def counts(order: Int) = () =>
      T.lmCountTables(train, "text", order, minCount = 2,
        portableHash = false)
    // the whole scorer; `bcast` toggles the r16 broadcastModel knob
    // (the diagnosed super-linearity: the ~2M-row o4/o5 pruned tables
    // cross the 10 MB AQE broadcast default, flipping 4 joins to
    // shuffle joins over the position stream — measured 26.6 s AQE vs
    // 11.6 s broadcast before the knob landed; the default is now the
    // KenLM shape, model broadcast to every node)
    def score(order: Int, mc: Int = 2, bcast: Boolean = true) = () =>
      T.ngramLmScoreBackoff(train, docs, "doc_id", "text",
        order = order, minCount = mc, broadcastModel = bcast)

    val laps = Seq(
      lap("kernel_o3", kernel(3)), lap("kernel_o5", kernel(5)),
      lap("counts_o3", counts(3)), lap("counts_o5", counts(5)),
      lap("score_o3", score(3)), lap("score_o5", score(5)),
      // volume-vs-width discriminator: 4× harder pruning shrinks the
      // high-order tables; if score_o5 barely moves, the join band's
      // cost is the 9-join plan itself, not the rows flowing through
      lap("score_o5_mc8", score(5, mc = 8)),
      // the past-broadcast-budget fallback: AQE picks strategies (a
      // melt reformulation was measured 3× slower than this — see
      // SCALE_BENCH_sf10_r16 notes — so AQE stays the fallback)
      lap("score_o5_aqe", score(5, bcast = false)))

    // table volumes per order at the production pruning — the
    // denominator for any "the tables are too big" hypothesis
    val sizes = T.lmCountTables(train, "text", 5, minCount = 2,
        portableHash = false)
      .groupBy("k").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      .map { case (k, n) => s""""k$k":$n""" }

    val json = s"""{"metric":"lm_profile","sf":"$sfDir",""" +
      f""""dd_mbps":$dd%.0f,"cpu_ref_sec":$cpu%.2f,""" +
      laps.mkString("\"laps\":{", ",", "},") +
      sizes.mkString("\"count_rows_mc2\":{", ",", "}}")
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
