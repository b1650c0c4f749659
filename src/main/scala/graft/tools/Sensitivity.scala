package graft.tools

import graft.{GraftSession, SparkEntry}

/** AQE / broadcast-threshold sensitivity sweep over a query subset —
  * the "are the session defaults actually the right ones at scale"
  * check a tuning doc should cite numbers for, not vibes.
  *
  *   SPARK_GRAFT_SF_DIR=benchdata/sf3 SPARK_GRAFT_CPUS=32 \
  *     SPARK_GRAFT_QUERIES=q_a,q_b \
  *     java -cp ... graft.tools.Sensitivity
  *
  * Runs each query under each config variant (warm + min-of-2 — ratio
  * precision, same as the Bench sf1 ladder) and prints one JSON line
  * per variant. Variants toggle the two runtime-settable levers the
  * session pins: `spark.sql.autoBroadcastJoinThreshold` (32 MiB
  * default / 8 MiB conservative / -1 off — "off" shows what every
  * broadcast in the plan is worth; "8m" what a memory-constrained
  * cluster would see) and `spark.sql.adaptive.enabled` (on default /
  * off — "off" prices AQE's runtime coalesce + skew-join re-planning).
  * Both are SQL confs, so one JVM sweeps all variants; caches are
  * cleared between queries exactly like Bench so measurements stay
  * self-contained.
  */
object Sensitivity {

  private case class Variant(name: String, settings: Map[String, String])

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf3")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val defaults = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> (32L * 1024 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "true")
    val variants = Seq(
      Variant("default", defaults),
      Variant("bcast_off", defaults + ("spark.sql.autoBroadcastJoinThreshold" -> "-1")),
      Variant("bcast_8m", defaults +
        ("spark.sql.autoBroadcastJoinThreshold" -> (8L * 1024 * 1024).toString)),
      Variant("aqe_off", defaults + ("spark.sql.adaptive.enabled" -> "false")))

    val subset = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val selected = subset.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(kv => s(kv._1)))

    def runOn(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
    def clearCaches(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    def minOf2(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime(); runOn(fn); (System.nanoTime() - t0) / 1e9
      }.min

    for (v <- variants) {
      v.settings.foreach { case (k, s) => spark.conf.set(k, s) }
      val times = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t = try { runOn(fn); minOf2(fn) }
        catch { case _: Throwable => -1.0 }
        clearCaches()
        name -> math.round(t * 100) / 100.0
      }
      val qjson = times.map { case (k, t) => "\"" + k + "\":" + t }.mkString("{", ",", "}")
      println(s"""{"variant":"${v.name}","sf":"$sfDir","queries":$qjson}""")
    }
    // restore defaults for any shared session reuse
    defaults.foreach { case (k, s) => spark.conf.set(k, s) }
    spark.stop()
  }
}
