package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{GlobalRank, Stats}
import graft.sources.Tables
import graft.GraftSession

/** Dev profiler for the q_cusum GlobalRank rebuild: phase timings. */
object CusumProf {
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

    val centsValue = round(col("value") * 100).cast("long")
    if (sys.env.get("CUSUM_NOOP_ONLY").contains("1")) {
      for (k <- 1 to 6)
        time(s"noop-only write #$k") {
          Stats.cusumChangePoint(t.events, "event_type",
            col("ts"), centsValue, col("event_id"))
            .write.mode("overwrite").format("noop").save(); 0L
        }
      spark.stop(); return
    }
    val base = t.events.select(col("event_type"), col("ts").as("ord"),
      col("event_id").as("tie"), centsValue.as("xv"))
    time("base scan")(base.count())
    time("base scan again")(base.count())

    val ranked = GlobalRank.rowNumbers(base, Seq("event_type"),
      Seq(col("ord"), col("tie")), "i", running = Seq(("xv", "prefix"))).df
    time("globalrank (rejected path)")(ranked.count())
    time("globalrank again")(ranked.count())

    val tot = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("xv")).as("s"))
    time("totals")(tot.count())

    val dev = col("prefix") * col("n") - col("i") * col("s")
    val joined = ranked.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("n"),
        abs(dev).as("adev"), (-col("i")).as("negi"), col("i"), col("ord"))
    time("join+dev")(joined.count())

    // the SortAggregate trap kept for reference: max(struct) with a
    // timestamp field cannot hash-aggregate — measured ~7 s vs ~1 s
    // for max_by on the longs-only key over the same 1M rows
    val agg = joined.groupBy(col("event_type"))
      .agg(max(struct(col("adev"), col("negi"), col("i"), col("ord"), col("n"))).as("m"))
    time("argmax max(struct) [trap]")(agg.count())

    val agg3 = joined.groupBy(col("event_type"))
      .agg(max_by(struct(col("i"), col("ord"), col("n")),
        struct(col("adev"), col("negi"))).as("m"))
    time("argmax max_by")(agg3.count())

    time("full cusum")(Stats.cusumChangePoint(t.events, "event_type",
      col("ts"), centsValue, col("event_id")).count())
    time("full cusum again")(Stats.cusumChangePoint(t.events, "event_type",
      col("ts"), centsValue, col("event_id")).count())

    // the Bench protocol: re-construct + noop write, like runOn()
    for (k <- 1 to 4)
      time(s"noop write #$k") {
        Stats.cusumChangePoint(t.events, "event_type",
          col("ts"), centsValue, col("event_id"))
          .write.mode("overwrite").format("noop").save(); 0L
      }
    spark.stop()
  }
}
