package graft.tools

import org.apache.spark.sql.functions._

/** Dev-only r14 microbench: cost anatomy of the per-round join+agg+
  * checkpoint pattern the graph iteratives use, on synthetic tiny
  * frames — isolates fixed per-task cost from real work.
  */
object MicroJoin {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val meter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) meter.addAndGet(te.taskMetrics.executorCpuTime)
    })
    def timed(name: String)(f: => Unit): Unit = {
      org.apache.spark.graftbridge.ListenerBusDrain.drain(spark.sparkContext)
      val c0 = meter.get(); val t0 = System.nanoTime()
      f
      val w = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBusDrain.drain(spark.sparkContext)
      println(f"[micro] $name%-40s wall=$w%6.3f cpu=${(meter.get() - c0) / 1e9}%6.3f")
    }
    val edges = (1 to 100000).map(i => (i % 2100L, (i * 7) % 2100L)).toDF("src", "dst")
      .repartition(col("src")).localCheckpoint(true)
    val ranks0 = (0L until 2100L).map(i => (i, 1.0 / 2100)).toDF("id", "r")
      .localCheckpoint(true)
    def round(hint: String): Unit = {
      val r = if (hint.isEmpty) ranks0 else ranks0.hint(hint)
      val c = edges.join(r, edges("src") === r("id"))
        .groupBy(col("dst")).agg(sum(col("r")).as("m"))
        .localCheckpoint(true)
      c.unpersist(false)
      ()
    }
    for (h <- Seq("shuffle_hash", "shuffle_hash", "merge", "", "broadcast")) {
      timed(s"join hint='$h' + agg + ckpt")(round(h))
    }
    // noop-only: what does an empty 32-partition stage cost?
    val tiny = ranks0
    timed("noop write of 2100-row ckpt frame")(tiny.write.mode("overwrite").format("noop").save())
    timed("count of same")(println(tiny.count()))
    spark.stop()
  }
}
