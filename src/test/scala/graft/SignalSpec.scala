package graft

import org.apache.spark.sql.functions._

import graft.operators.{Arena, Signal}

/** Library-level invariants for the interval/bar/arena layer: each
  * test pins a closed-form answer on handcrafted data (the DuckDB
  * oracle proves engine parity separately; this proves the MATH).
  */
class SignalSpec extends SparkSpec {

  import spark.implicits._

  test("intervalIslands absorbs a CONTAINED interval (the case gap sessionization misses)") {
    // [0,100) contains [10,20); [150,200) is separate; [90,160) would
    // bridge if present — here it is absent, so exactly 2 islands.
    val df = Seq(("k", 0L, 100L, 1L), ("k", 10L, 20L, 2L), ("k", 150L, 200L, 3L))
      .toDF("key", "s", "e", "t")
    val r = Signal.intervalIslands(df, "key", col("s"), col("e"), Seq(col("t")))
      .collect().head
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("n_intervals") == 3L)
    assert(r.getAs[Long]("covered_s") == 150L) // 100 + 50
    assert(r.getAs[Long]("widest_s") == 100L)
  }

  test("intervalIslands merges a back-extending overlap into one island") {
    val df = Seq(("k", 0L, 50L, 1L), ("k", 40L, 120L, 2L), ("k", 119L, 130L, 3L))
      .toDF("key", "s", "e", "t")
    val r = Signal.intervalIslands(df, "key", col("s"), col("e"), Seq(col("t")))
      .collect().head
    assert(r.getAs[Long]("n_islands") == 1L)
    assert(r.getAs[Long]("covered_s") == 130L)
  }

  test("ohlcBars picks first/last by timestamp with tiebreak, one bar per slot") {
    val df = Seq(
      ("k", 5L, 30L, 1L),  // slot 0: first  -> open 30
      ("k", 7L, 90L, 2L),  //         high 90
      ("k", 9L, 10L, 3L),  //         last   -> close 10, low 10
      ("k", 12L, 55L, 4L)) // slot 1
      .toDF("key", "ts", "c", "tb")
    val r = Signal.ohlcBars(df, "key", col("ts"), col("c"), col("tb"), 10L)
      .orderBy("slot").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("open_c") == 30L && r(0).getAs[Long]("close_c") == 10L)
    assert(r(0).getAs[Long]("high_c") == 90L && r(0).getAs[Long]("low_c") == 10L)
    assert(r(0).getAs[Long]("volume") == 3L && r(0).getAs[Long]("turnover_c") == 130L)
    assert(r(1).getAs[Long]("open_c") == 55L && r(1).getAs[Long]("volume") == 1L)
  }

  test("twap weights each value by its holding time, last observation zero-weight") {
    // v=100 held 10s, v=200 held 30s, v=999 last (no weight):
    // twap = (100*10 + 200*30) / 40 = 175.
    val df = Seq(("s", "u", 0L, 100L, 1L), ("s", "u", 10L, 200L, 2L),
      ("s", "u", 40L, 999L, 3L))
      .toDF("et", "uid", "ts", "c", "tb")
    val r = Signal.twap(df, Seq("et", "uid"), col("ts"), col("c"), col("tb"))
      .collect().head
    assert(r.getAs[Long]("span_s") == 40L)
    assert(r.getAs[Double]("twap_c") == 175.0)
  }

  test("trailingDistinct counts an actor once across the window, expires after k days") {
    val d = 86400L
    // actor A active day 0 and day 1; actor B day 0 only; k=2.
    val df = Seq(("k", "A", 0L), ("k", "A", d), ("k", "B", 10L))
      .toDF("key", "actor", "ts")
    val m = Signal.trailingDistinct(df, "key", col("actor"), col("ts"), days = 2)
      .collect().map(r => r.getAs[Long]("day_slot") -> r.getAs[Long]("active")).toMap
    assert(m(0L) == 2L) // A and B
    assert(m(d) == 2L)  // A (deduped across both days) and B (trailing)
    // day 2 is past max activity day -> not emitted
    assert(!m.contains(2 * d))
  }

  test("resampleInterpolate hits the exact midpoint and flags gaps") {
    // observations at slot 0 (v=1.00) and slot 20 (v=3.00), step 10:
    // slot 10 interpolates to exactly 2.0.
    val df = Seq(("k", 0L, 1.0), ("k", 25L, 3.0)).toDF("key", "ts", "v")
    val rows = Signal.resampleInterpolate(df, "key", "ts", "v", stepSeconds = 10L)
      .orderBy("slot").collect()
    assert(rows.length == 3)
    assert(rows(1).getAs[Double]("v_interp") == 2.0)
    assert(rows(1).getAs[Boolean]("is_gap"))
    assert(!rows(0).getAs[Boolean]("is_gap") && rows(0).getAs[Double]("v_interp") == 1.0)
    assert(rows(2).getAs[Double]("v_interp") == 3.0)
  }

  test("winMatrix counts wins/ties on shared trials only") {
    val scores = Seq(("a", 1L, 10L), ("b", 1L, 5L), ("a", 2L, 3L), ("b", 2L, 3L),
      ("b", 3L, 99L)) // trial 3 has no opponent
      .toDF("m", "trial", "s")
    val r = Arena.winMatrix(scores).collect().head
    assert(r.getAs[String]("a") == "a" && r.getAs[String]("b") == "b")
    assert(r.getAs[Long]("n") == 2L && r.getAs[Long]("wins_a") == 1L)
    assert(r.getAs[Long]("ties") == 1L)
    assert(r.getAs[Double]("win_rate_a") == 1.0)
  }

  test("bradleyTerry ranks the dominant contender first and normalizes to mean 1") {
    // a beats b 9-1, b beats c 9-1, a beats c 9-1: strength a > b > c.
    val m = Seq(("a", "b", 9L, 1L, 0L), ("b", "c", 9L, 1L, 0L), ("a", "c", 9L, 1L, 0L))
      .toDF("a", "b", "wins_a", "wins_b", "ties")
    val rows = Arena.bradleyTerry(m, iters = 5).collect()
      .map(r => r.getAs[String]("m") -> r.getAs[Double]("strength")).toMap
    assert(rows("a") > rows("b") && rows("b") > rows("c"))
    assert(math.abs(rows.values.sum / 3.0 - 1.0) < 0.01)
  }
}
