package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalRank, Linkage, Stats}

/** The range-partitioned global rank must be BIT-IDENTICAL to the
  * window formulations it replaces — ranks, running sums, ntile
  * buckets, and every operator swapped onto it. Random-ish data with
  * deliberate ties and a forced multi-partition layout exercise the
  * offset plumbing across partition boundaries.
  */
class GlobalRankSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random longs with plenty of ties (mod 97)
  private def noisy(n: Int) = (1 to n).map { i =>
    val v = math.abs(i * 2654435761L % 97)
    (i.toLong, v, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c")
  }.toDF("id", "v", "g").repartition(7)

  test("rowNumbers equals row_number() over the same total order") {
    val df = noisy(5000)
    val expect = df.select(col("id"),
      row_number().over(Window.orderBy(col("v").desc, col("id"))).cast("long").as("rn"))
    val got = GlobalRank.rowNumbers(df, Nil, Seq(col("v").desc, col("id")), "rn")
    assert(got.total == 5000L)
    val gotDf = got.df.select(col("id"), col("rn"))
    assert(gotDf.exceptAll(expect).isEmpty && expect.exceptAll(gotDf).isEmpty)
  }

  test("running sums equal the unbounded-preceding window sum") {
    val df = noisy(3000).withColumn("p", when(col("v") % 2 === 0, 1L).otherwise(0L))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.select(col("id"), sum("p").over(w).as("cum"))
    val got = GlobalRank.rowNumbers(df, Nil, Seq(col("v"), col("id")), "rn",
      running = Seq(("p", "cum"))).df.select(col("id"), col("cum"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("ntileBucket equals window ntile for awkward n/k splits") {
    for (n <- Seq(1, 7, 10, 97, 1000); k <- Seq(3, 7, 10)) {
      val df = noisy(n)
      val expect = df.select(col("id"),
        ntile(k).over(Window.orderBy(col("v"), col("id"))).as("b"))
      val ranked = GlobalRank.rowNumbers(df, Nil, Seq(col("v"), col("id")), "rn")
      val got = ranked.df.select(col("id"),
        GlobalRank.ntileBucket("rn", ranked.total, k).as("b"))
      assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty, s"n=$n k=$k")
    }
  }

  test("ntilePerGroup equals the partitioned ntile window") {
    val df = noisy(4000)
    val expect = df.select(col("id"), col("g"),
      ntile(4).over(Window.partitionBy("g").orderBy(col("v"), col("id"))).as("q"))
    val got = GlobalRank.ntilePerGroup(df.select("id", "g", "v"), Seq("g"),
      Seq(col("v"), col("id")), 4, "q").select("id", "g", "q")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }

  test("liftTable and averagePrecision plans carry no unpartitioned window") {
    val df = noisy(2000)
    val lt = Stats.liftTable(df, col("v") % 2 === 0, col("v"), col("id"), k = 10)
    val ap = Stats.averagePrecision(df, col("v") % 2 === 0, col("v"), col("id"))
    // averagePrecision: zero window nodes at all
    assert(!ap.queryExecution.executedPlan.toString.contains("Window ["))
    // liftTable: no row-grain ranking window (ntile/row_number); the
    // only window left is the k-row cumulative over the bucket table
    val ltPlan = lt.queryExecution.executedPlan.toString
    assert(!ltPlan.contains("ntile(") && !ltPlan.contains("row_number("), ltPlan)
    // and the lift table is internally consistent: buckets sum to n
    assert(lt.agg(sum("n")).collect().head.getLong(0) == 2000L)
  }

  test("sortedNeighborhood blocked form equals the global-window form") {
    // names with many shared prefixes so real pairs exist
    val recs = (1 to 500).map { i =>
      (i.toLong, "NAME" + (i % 40) + (if (i % 7 == 0) "X" else ""))
    }.toDF("id", "nm").repartition(5)
    val got = Linkage.sortedNeighborhood(recs, "id", "nm", window = 3, minJw = 0.85)
    // reference: the original unpartitioned-window formulation, inline
    val w = Window.orderBy(col("key"), col("id"))
    val base = recs.select(col("id"), col("nm").as("key"))
    val tapped = base.select(Seq(col("id"), col("key")) ++
      (1 until 3).map(k =>
        struct(lag(col("id"), k).over(w).as("id"), lag(col("key"), k).over(w).as("key"))
          .as(s"p$k")): _*)
    val expect = tapped.select(col("id"), col("key"),
      explode(array(col("p1"), col("p2"))).as("p"))
      .filter(col("p.id").isNotNull)
      .select(col("p.id").as("id_a"), col("id").as("id_b"),
        col("p.key").as("name_a"), col("key").as("name_b"),
        round(graft.plans.JaroWinkler(col("p.key"), col("key")), 6).as("jw"))
      .filter(col("jw") >= 0.85)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }

  test("spearman histogram form equals the row-grain rank form") {
    val df = noisy(3000).withColumn("x", col("v"))
      .withColumn("y", (col("v") * col("v") % 89) + col("id") % 5)
    // reference: row-grain half-rank construction (the pre-round-8 form)
    def halfRanks(c: org.apache.spark.sql.Column, as: String) = {
      val w = Window.partitionBy(col("g")).orderBy(c)
      val tieW = Window.partitionBy(col("g"), c)
      (rank().over(w) * 2 + count(lit(1)).over(tieW) - 1).as(as)
    }
    val ranked = df.select(col("g"), halfRanks(col("x"), "rx"), halfRanks(col("y"), "ry"))
    val expect = Stats.pearson(ranked, "g", col("rx"), col("ry"))
      .withColumnRenamed("pearson_r", "spearman_rho")
    val got = Stats.spearman(df, "g", col("x"), col("y"))
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
