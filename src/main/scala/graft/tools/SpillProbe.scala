package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Dev probe: run one SparkEntry query and print per-stage shuffle and
  * spill totals from the task-metrics stream — the numbers the Spark
  * UI's SQL tab shows, without a UI. Written for the round-11
  * q_join_big adjudication (its sf3 step ratio regressed while sf1
  * held; the verdict asked for spill bytes before any tuning).
  *
  *   SPARK_GRAFT_SF_DIR=benchdata/sf3 SPARK_GRAFT_CPUS=32 \
  *     java -cp ... graft.tools.SpillProbe q_join_big [runs]
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_join_big")
    val runs = args.drop(1).headOption
      .flatMap(a => scala.util.Try(a.toInt).toOption.filter(_ > 0))
      .getOrElse(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class St(var tasks: Int = 0, var memSpill: Long = 0L, var diskSpill: Long = 0L,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L,
                  var peakMem: Long = 0L, var runMs: Long = 0L, var name: String = "")
    val stages = mutable.LinkedHashMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        val st = stages.getOrElseUpdate(sc.stageInfo.stageId, St())
        st.tasks += sc.stageInfo.numTasks
        st.memSpill += m.memoryBytesSpilled
        st.diskSpill += m.diskBytesSpilled
        st.shufRead += m.shuffleReadMetrics.totalBytesRead
        st.shufWrite += m.shuffleWriteMetrics.bytesWritten
        st.peakMem = math.max(st.peakMem, m.peakExecutionMemory)
        st.runMs += m.executorRunTime
        st.name = sc.stageInfo.name.takeWhile(_ != '\n').take(60)
      }
    })
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (its stages are recorded too; timed runs follow)
    stages.clear()
    val ts = (1 to runs).map(_ => once())
    // The listener bus is async: StageCompleted events for the final
    // stages can still be in flight when the runs return. The public
    // API has no waitUntilEmpty, so drain with a short sleep before
    // reading the table (2 s dwarfs any realistic event backlog).
    Thread.sleep(2000)
    def mb(b: Long): String = f"${b / 1048576.0}%9.1f MB"
    println(f"[spill] $name on $dir, $runs timed runs: ${ts.map(t => f"$t%.2f").mkString(", ")} s")
    println(f"[spill] ${"stage"}%-6s ${"tasks"}%5s ${"shufRead"}%12s ${"shufWrite"}%12s ${"memSpill"}%12s ${"diskSpill"}%12s ${"peakMem"}%12s ${"cpu-s"}%7s  name")
    stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
      println(f"[spill] $id%-6d ${s.tasks}%5d ${mb(s.shufRead)} ${mb(s.shufWrite)} ${mb(s.memSpill)} ${mb(s.diskSpill)} ${mb(s.peakMem)} ${s.runMs / 1000.0}%7.1f  ${s.name}")
    }
    val totalSpill = stages.values.map(s => s.memSpill + s.diskSpill).sum
    println(f"[spill] TOTAL spill ${mb(totalSpill)} across ${stages.size} stages")
    spark.stop()
  }
}
