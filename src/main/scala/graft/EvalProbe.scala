package graft

import org.apache.spark.sql.SparkSession

/** One-off instrument calibration (see the r10 caveat in Bench.scala):
  * times every gate under BOTH actions — Bench's `count()` (prunable:
  * map-only projections fold away) and a `noop`-format write (evaluates
  * every output column, plus the gate's determinism orderBy) — so the
  * per-gate pruning gap is a recorded artifact instead of a suspicion.
  * Single execution per action after one warm pass; gates whose two
  * numbers agree are shuffle/agg/join-bound (count() already evaluates
  * them); large ratios mark the map-only family.
  *
  * Usage: runMain graft.EvalProbe <sfDir> [outJson]
  */
object EvalProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outJson = args.lift(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.queries.SparqlQueries.warm(spark, sfDir)
    catch { case _: Throwable => }
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).count() // warm: codegen + JIT + caches
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val cnt = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wrt = (System.nanoTime() - t1) / 1e9
          println(f"[eval] $name count=$cnt%.3f write=$wrt%.3f " +
            f"ratio=${wrt / cnt}%.1f")
          Some(name -> (cnt, wrt))
        } catch { case _: Throwable => None }
    }
    val qJson = rows.map { case (n, (c, w)) =>
      f""""$n":{"count_sec":$c%.4f,"write_sec":$w%.4f}""" }
      .mkString("{", ",", "}")
    val json =
      s"""{"metric":"eval_probe","sf":"$sfDir","queries":$qJson}"""
    println(json)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (json + "\n").getBytes("UTF-8"))
    }
    spark.stop()
  }
}
