package graft.tools

/** Dev-only scratch: re-measure + plan-dump named queries on a given
  * data dir (deleted or repurposed between rounds).
  */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("benchdata/sf1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q_cumulative_uniques", "q_chi2_indep", "q_mutual_info")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      println(fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).linesIterator
        .filter(l => l.contains("Scan") || l.contains("Exchange"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
