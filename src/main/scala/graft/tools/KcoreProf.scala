package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.sources.Tables
import graft.GraftSession

/** Dev profiler for q_kcore: per-phase and repeated full-run timings
  * to pin down the bimodal wall times observed in Bench subsets.
  */
object KcoreProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf1")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (n=$n)")
    }

    def edges = t.lineitem.select(
      col("l_suppkey").cast("long").as("src"),
      (pmod(col("l_partkey"), lit(300)) + 1000000000L).as("dst"))

    time("edge scan")(edges.count())
    val e0 = edges.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") =!= col("v"))
    val sym = e0.unionByName(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct()
    time("sym distinct (no ckpt)")(sym.count())

    for (k <- 1 to 5)
      time(s"full kcore #$k") {
        Graph.kCore(edges, "src", "dst", k = 60, rounds = 4).count()
      }
    spark.stop()
  }
}
