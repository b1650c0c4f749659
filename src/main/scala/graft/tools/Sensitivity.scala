package graft.tools

import graft.{GraftSession, SparkEntry}

/** AQE / broadcast-threshold sensitivity sweep over a query subset —
  * the "are the session defaults actually the right ones at scale"
  * check a tuning doc should cite numbers for, not vibes.
  *
  *   for v in default bcast_off bcast_8m aqe_off; do
  *     SPARK_GRAFT_SF_DIR=benchdata/sf3 SPARK_GRAFT_CPUS=32 \
  *       SPARK_GRAFT_QUERIES=q_a,q_b SPARK_GRAFT_VARIANT=$v \
  *       java -cp ... graft.tools.Sensitivity
  *   done
  *
  * ONE VARIANT PER JVM (SPARK_GRAFT_VARIANT, default "default"): a
  * first single-JVM sweep produced incomparable numbers — the leading
  * variant paid the OS-page-cache cold read for everyone (q_ppr 25.3 s
  * cold vs 3.4 s warm at sf3) and later variants drifted under
  * accumulated JIT/GC state (bcast_8m measuring SLOWER than bcast_off
  * on broadcast-free plans). Per-JVM isolation plus the Bench
  * measurement protocol (per-query untimed warm + median of 3, caches
  * cleared between queries) makes variants directly comparable to each
  * other and to Bench's committed numbers.
  *
  * Variants toggle the two runtime-settable levers the session pins:
  * `spark.sql.autoBroadcastJoinThreshold` (32 MiB default / 8 MiB
  * conservative / -1 off — "off" shows what every broadcast in the
  * plan is worth; "8m" what a memory-constrained cluster would see)
  * and `spark.sql.adaptive.enabled` (off prices AQE's runtime
  * coalesce + skew-join re-planning).
  */
object Sensitivity {

  private val variants: Map[String, Map[String, String]] = Map(
    "default" -> Map.empty,
    "bcast_off" -> Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"),
    "bcast_8m" -> Map(
      "spark.sql.autoBroadcastJoinThreshold" -> (8L * 1024 * 1024).toString),
    "aqe_off" -> Map("spark.sql.adaptive.enabled" -> "false"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val vName = sys.env.getOrElse("SPARK_GRAFT_VARIANT", "default")
    val settings = variants.getOrElse(vName,
      throw new IllegalArgumentException(
        s"unknown variant $vName (have ${variants.keys.mkString(", ")})"))
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    settings.foreach { case (k, s) => spark.conf.set(k, s) }

    val subset = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val selected = subset.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))

    def runOn(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def medianOf3(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); runOn(fn); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(1)
    }

    val times = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try { runOn(fn); medianOf3(fn) }
      catch { case _: Throwable => -1.0 }
      clearCaches()
      name -> math.round(t * 100) / 100.0
    }
    val qjson = times.map { case (k, t) => "\"" + k + "\":" + t }.mkString("{", ",", "}")
    println(s"""{"variant":"$vName","sf":"$sfDir","queries":$qjson}""")
    spark.stop()
  }
}
