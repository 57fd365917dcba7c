package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: runs named queries twice, printing cold vs
  * warm timings, to separate one-time store materialization from steady
  * state. Not part of the driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val stageLog =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks)
          val i = s.stageInfo
          val dur = for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b
          stageLog.add(f"    stage ${i.stageId}%4d ${i.numTasks}%4d tasks " +
            f"${dur.getOrElse(-1L)}%5d ms  ${i.name.takeWhile(_ != '\n')}")
        }
      })
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      def run(): (Double, Int, Int, Int) = {
        val (j0, s0, t0n) = (jobs.get, stages.get, tasks.get)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9,
          jobs.get - j0, stages.get - s0, tasks.get - t0n)
      }
      val cold = run()
      val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
      (1 until reps).foreach { i =>
        val t = run(); println(f"SCRATCH $name rep$i%-2d ${t._1}%6.3f s")
      }
      stageLog.clear()
      val warm = run()
      if (sys.env.contains("SPARK_GRAFT_STAGES")) {
        println(s"SCRATCH $name warm-run stages:")
        stageLog.forEach(println(_))
      }
      // phase split: DataFrame build (parse+analyze) / plan / execute
      val tb0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - tb0) / 1e9
      val tp0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - tp0) / 1e9
      val te0 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - te0) / 1e9
      println(f"SCRATCH $name%-36s cold=${cold._1}%6.2f warm=${warm._1}%6.2f " +
        f"warmJobs=${warm._2}%3d warmStages=${warm._3}%3d warmTasks=${warm._4}%5d " +
        f"build=$tBuild%5.2f plan=$tPlan%5.2f exec=$tExec%5.2f")
    }
    spark.stop()
  }
}
