package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal pure-Spark probe: does a cancelled job's running task die at
  * the next row boundary, or zombie to partition end? Compares a
  * LocalRelation (createDataFrame) source vs an RDD-backed range. */
object KillProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("kill-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    def ts = f"${(System.nanoTime() - t0) / 1e9}%.2f"
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        println(s"[kp] $ts TASKEND stage=${e.stageId} reason=${e.reason.toString.take(40)}")
    })
    import spark.implicits._

    def trial(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val t = new Thread(() => {
        try {
          sc.setJobGroup(name, name)
          val n = df.filter(regexp_like(
            regexp_replace(col("v"), "[0-9]", "a" * 250),
            lit("(a+)\\1+b"))).count()
          println(s"[kp] $ts $name FINISHED n=$n (unexpected)")
        } catch { case e: Exception =>
          println(s"[kp] $ts $name died: ${e.getMessage.take(60)}") }
      })
      t.start()
      Thread.sleep(4000)
      println(s"[kp] $ts cancelling $name")
      sc.cancelJobGroup(name)
      t.join(30000)
      println(s"[kp] $ts $name joined")
    }

    val data = (0 until 5000).map(_.toString)
    trial("rdd-backed", spark.createDataFrame(
      sc.parallelize(data.map(Tuple1(_)), 4)).toDF("v"))
    trial("local-repartitioned", data.toDF("v").repartition(4))
    spark.stop()
  }
}
