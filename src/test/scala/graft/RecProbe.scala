package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Job/stage accounting for the recursion drain loops: runs a named
  * declared query once (warm) and prints how many Spark jobs/stages it
  * schedules and where the wall-clock goes (task time vs scheduling
  * gaps). Usage: Test/runMain graft.RecProbe <query> [sfdir]
  */
object RecProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskTimeMs = 0L
    @volatile var jobWallMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != null) jobWallMs += (System.nanoTime() - t0) / 1000000L
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskTimeMs += s.stageInfo.taskMetrics.executorRunTime
      }
    })

    // warmup pass (codegen, parquet footers)
    SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    Thread.sleep(500)
    jobs = 0; stages = 0; taskTimeMs = 0; jobWallMs = 0
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[recprobe] $name wall=$wall%.2fs jobs=$jobs stages=$stages " +
      f"jobWall=${jobWallMs / 1000.0}%.2fs taskTime=${taskTimeMs / 1000.0}%.2fs")
    spark.stop()
  }
}
