package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Range-partitioned global ranking — the scale-safe replacement for
  * `row_number()/ntile() OVER (ORDER BY …)`, whose unpartitioned
  * window pins a FULL-TABLE sort on a single task (measured 5.8× at
  * 10× data on the lift-table family before this operator existed).
  *
  * Two passes over one range shuffle:
  *   1. `repartitionByRange` on the ordering key (Spark samples the
  *      boundaries; the sampling is seeded deterministically, and a
  *      total-order key means boundary placement cannot change the
  *      rank), each partition sorted locally — the global order is
  *      partition-ascending.
  *   2. One lightweight job counts rows (and any requested running
  *      sums) per partition per group; the driver prefix-sums those
  *      P·G-bounded subtotals into per-partition starting offsets and
  *      broadcasts them. A second pass assigns `offset + local index`
  *      — every task writes ranks independently, nothing re-sorts
  *      globally.
  *
  * The second job re-reads the materialized shuffle files (the map
  * stage is not re-executed), so the extra cost over a single-pass
  * window is one partition-local re-sort — against which the
  * single-task global sort it replaces does not survive 100 TB at
  * all.
  *
  * Intended regime: GLOBAL rankings (`groupCols` empty) or a handful
  * of massive groups (the "few huge window partitions" pathology —
  * q_ntile's five market segments). High-cardinality per-key ranking
  * should keep using ordinary partitioned windows, which already
  * scale; the driver-side offset table here is `partitions + groups`
  * entries and assumes small G.
  *
  * Exactness contract: ranks equal `row_number()` over the same total
  * order, so every derived statistic (ntile buckets, AP terms) is
  * bit-identical to the window formulation — proven in StatsSpec by
  * direct comparison against the built-in window functions.
  */
object GlobalRank {

  /** Result of [[rowNumbers]]: the ranked frame plus the per-group row
    * totals the driver learned for free in the counting pass (key =
    * the group column values in `groupCols` order; `List()` for the
    * ungrouped global ranking).
    */
  final case class Ranked(df: DataFrame, groupTotals: Map[Seq[Any], Long]) {
    def total: Long = groupTotals.values.sum
  }

  /** Append a 1-based row number `rnName` over `orderKeys` (restarting
    * per `groupCols` combination, if any), plus inclusive running sums
    * over the named non-null LONG input columns (`(input, output)`
    * pairs) — the running-sum machinery average-precision needs its
    * cumulative-positives counter for.
    *
    * `orderKeys` must be a total order within each group (include a
    * tiebreaker), or ranks are not well-defined to begin with.
    */
  def rowNumbers(df: DataFrame, groupCols: Seq[String], orderKeys: Seq[Column],
                 rnName: String, running: Seq[(String, String)] = Nil,
                 numPartitions: Int = 0): Ranked = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val sortCols = groupCols.map(col) ++ orderKeys
    val sorted = df.repartitionByRange(p, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val runIdx = running.map { case (in, _) => schema.fieldIndex(in) }.toArray
    val nRun = runIdx.length
    val rdd = sorted.rdd

    def keyOf(row: Row): Seq[Any] = gIdx.map(row.get(_): Any).toList

    // Pass 1: ordered per-(partition, group) subtotals. Groups are
    // contiguous within a sorted partition, so this is a single
    // streaming fold — the collected result is P + G segments, not
    // data-sized.
    val stats: Array[(Int, Array[(Seq[Any], Long, Array[Long])])] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val segs = mutable.ArrayBuffer.empty[(Seq[Any], Long, Array[Long])]
        var curKey: Seq[Any] = null
        var cnt = 0L
        var sums: Array[Long] = null
        it.foreach { row =>
          val k = keyOf(row)
          if (curKey == null || k != curKey) {
            if (curKey != null) segs += ((curKey, cnt, sums))
            curKey = k; cnt = 0L; sums = Array.fill(nRun)(0L)
          }
          cnt += 1
          var i = 0
          while (i < nRun) { sums(i) += row.getLong(runIdx(i)); i += 1 }
        }
        if (curKey != null) segs += ((curKey, cnt, sums))
        Iterator((pid, segs.toArray))
      }.collect()

    // Driver prefix-sum in partition order -> starting offsets.
    val cum = mutable.LinkedHashMap.empty[Seq[Any], (Long, Array[Long])]
    val offsets: Map[Int, Map[Seq[Any], (Long, Array[Long])]] =
      stats.sortBy(_._1).map { case (pid, segs) =>
        pid -> segs.map { case (k, cnt, sums) =>
          val (c0, s0) = cum.getOrElse(k, (0L, Array.fill(nRun)(0L)))
          cum.put(k, (c0 + cnt, Array.tabulate(nRun)(i => s0(i) + sums(i))))
          k -> ((c0, s0))
        }.toMap
      }.toMap
    val totals = cum.map { case (k, (c, _)) => k -> c }.toMap

    // Pass 2: partition-local rank + offset (shuffle files reused; the
    // map stage does not re-execute).
    val bOffsets = spark.sparkContext.broadcast(offsets)
    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      val off = bOffsets.value.getOrElse(pid, Map.empty[Seq[Any], (Long, Array[Long])])
      var curKey: Seq[Any] = null
      var rn = 0L
      var runs: Array[Long] = null
      it.map { row =>
        val k = keyOf(row)
        if (curKey == null || k != curKey) {
          curKey = k
          val (c0, s0) = off(k)
          rn = c0; runs = s0.clone()
        }
        rn += 1
        var i = 0
        while (i < nRun) { runs(i) += row.getLong(runIdx(i)); i += 1 }
        Row.fromSeq(row.toSeq ++ (rn +: runs.toSeq))
      }
    }
    val outSchema = StructType(schema.fields ++
      (StructField(rnName, LongType, nullable = false) +:
        running.map { case (_, out) => StructField(out, LongType, nullable = false) }))
    Ranked(spark.createDataFrame(outRdd, outSchema), totals)
  }

  /** Per-group `ntile(k)` over a few massive groups (the q_ntile
    * shape: 5 market segments × corpus/5 rows each — a partitioned
    * window still sorts corpus/5 rows on one task). Ranks come from
    * [[rowNumbers]]; per-group totals ride back as a broadcast join of
    * the G-row totals table; the bucket is the same SQL-standard
    * closed form in integer `div` arithmetic. Appends `bucketName`
    * (int) to the input columns.
    */
  def ntilePerGroup(df: DataFrame, groupCols: Seq[String], orderKeys: Seq[Column],
                    k: Int, bucketName: String): DataFrame = {
    val ranked = rowNumbers(df, groupCols, orderKeys, "__rn")
    val spark = df.sparkSession
    val schema = ranked.df.schema
    val gFields = groupCols.map(n => schema(schema.fieldIndex(n)))
    val totRows = ranked.groupTotals.toSeq.map { case (kv, n) => Row.fromSeq(kv :+ n) }
    val totDf = spark.createDataFrame(
      spark.sparkContext.parallelize(totRows, 1),
      StructType(gFields.toArray :+ StructField("__n", LongType, nullable = false)))
    ranked.df.join(broadcast(totDf), groupCols)
      .withColumn("__q", expr(s"__n div $k"))
      .withColumn("__r", expr(s"__n % $k"))
      .withColumn(bucketName, expr(
        "cast(case when __q = 0 then __rn " +
          "when __rn <= __r * (__q + 1) then (__rn - 1) div (__q + 1) + 1 " +
          "else __r + (__rn - __r * (__q + 1) - 1) div __q + 1 end as int)"))
      .drop("__rn", "__n", "__q", "__r")
  }

  /** SQL-standard `ntile(k)` bucket derived from a 1-based global row
    * number column and the driver-known total row count: the first
    * `n mod k` buckets take `n div k + 1` rows, the rest `n div k` —
    * bit-identical to the built-in window ntile (spec-proven), with
    * integer `div` arithmetic throughout.
    */
  def ntileBucket(rnName: String, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    if (q == 0L) col(rnName).cast("int")
    else {
      val big = q + 1
      expr(s"cast(case when $rnName <= ${r * big} then ($rnName - 1) div $big + 1 " +
        s"else $r + ($rnName - ${r * big} - 1) div $q + 1 end as int)")
    }
  }
}
