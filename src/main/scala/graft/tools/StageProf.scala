package graft.tools

/** Dev-only r14 profiler: run named queries once warm, then timed, with
  * a StageCompleted listener printing per-stage wall/cpu/task counts so
  * the hot stage is identified instead of guessed. Usage:
  *   runMain graft.tools.StageProf <dir> <q1,q2,...>
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("q_spearman")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var record = false
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1000.0).getOrElse(-1.0)
          val cpu = si.taskMetrics.executorCpuTime / 1e9
          val run = si.taskMetrics.executorRunTime / 1e3
          stages.add(f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%7.2f run=$run%7.2f cpu=$cpu%7.2f  ${si.name.take(90)}")
        }
      }
    })
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      def go(): Unit = fn(spark, dir).write.mode("overwrite").format("noop").save()
      try go() catch { case e: Throwable => println(s"$name warmup ERROR: ${e.getMessage}") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      record = true
      val t0 = System.nanoTime()
      go()
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBusDrain.drain(spark.sparkContext)
      record = false
      println(f"\n===== $name total=$w%.2f s =====")
      stages.forEach(s => println(s))
      stages.clear()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
