package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** Dev profiler for q_ppr's phases: where do the 16 s at sf1 go —
  * edge derivation, the iteration prep (sym/distinct/v/eAug), or the
  * per-round jobs?
  */
object PprProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "benchdata/sf1")
    val spark = GraftSession.local()
    import spark.implicits._
    val t = Tables(spark, dir)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ppr] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val bi = t.lineitem
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i")).distinct()
    val co = bi.as("x").join(bi.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("pa"), col("y.i").as("pb"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("coPurchase edges")(co.count())
    val sym = co.select(col("pa"), col("pb"))
      .unionByName(co.select(col("pb").as("pa"), col("pa").as("pb")))
    val seeds = time("seeds")(co.select(col("pa").as("id")).distinct().orderBy("id").limit(5)
      .localCheckpoint(true))

    val e = time("e: distinct+repart+ckpt") {
      sym.select(col("pa").cast("long").as("src"), col("pb").cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
        .repartition(col("src")).localCheckpoint(true)
    }
    val v = time("v: distinct ids+ckpt") {
      e.select(col("src").as("id")).unionByName(e.select(col("dst").as("id")))
        .distinct().localCheckpoint(true)
    }
    val eAug = time("eAug: deg join+dangling") {
      val eDeg = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      val dangling = v.join(e.select(col("src").as("id")), Seq("id"), "left_anti")
      eDeg.unionByName(
          dangling.select(col("id").as("src"), lit(Long.MinValue).as("dst"), lit(1L).as("deg")))
        .repartition(col("src")).localCheckpoint(true)
    }
    val nSeeds = seeds.count()
    val sVec = time("sVec ckpt") {
      v.join(broadcast(seeds.select(col("id"), lit(1.0 / nSeeds).as("w"))), Seq("id"), "left")
        .select(col("id"), coalesce(col("w"), lit(0.0)).as("w"))
        .localCheckpoint(true)
    }
    var ranks = time("r0 ckpt")(sVec.select(col("id"), col("w").as("r")).localCheckpoint(true))
    for (round <- 1 to 3) {
      val contribs = time(s"round $round contribs") {
        eAug.join(ranks, eAug("src") === ranks("id"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("r") / col("deg")).as("m"))
          .localCheckpoint(true)
      }
      val dm = contribs.filter(col("id") === Long.MinValue)
        .agg(coalesce(sum("m"), lit(0.0)).as("dm"))
      ranks = time(s"round $round next") {
        sVec.join(contribs.filter(col("id") =!= Long.MinValue), Seq("id"), "left")
          .crossJoin(broadcast(dm))
          .select(col("id"), col("w"),
            (lit(1.0 - 0.85) * col("w") +
              lit(0.85) * (coalesce(col("m"), lit(0.0)) + col("dm") * col("w"))).as("r"))
          .localCheckpoint(true).select("id", "r")
      }
    }
    time("final filter+round")(ranks.select(col("id"), round(col("r"), 6).as("ppr"))
      .filter(col("ppr") > 0).write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
