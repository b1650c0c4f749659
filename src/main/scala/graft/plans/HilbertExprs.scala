package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Hilbert-curve index of two non-negative integer keys — the
  * space-filling clustering key with strictly better locality than the
  * Z-order interleave ([[ZOrder2]]): consecutive Hilbert positions are
  * always ADJACENT grid cells (the curve never jumps), so a contiguous
  * run of rows covers a tighter bounding box in both dimensions and
  * min-max file pruning discards more files for the same selective
  * filter. This is why Databricks' liquid clustering and recent
  * Iceberg/Delta OPTIMIZE work moved from Morton to Hilbert ordering.
  *
  * Same write-side posture as Z-order at 100 TB: one
  * repartitionByRange on the index (sampled bounds) + a partition-local
  * sort before the parquet write; the curve computation itself is a
  * native codegen expression — a fixed `bits`-round bit loop per row,
  * no allocation, map-only.
  *
  * Algorithm: the classical d = xy2d(n, x, y) state loop (Hilbert
  * 1891; iterative form per Warren, Hacker's Delight §16-1 / the
  * public-domain convert-and-rotate formulation): walk levels s =
  * n/2 … 1, accumulate s²·((3·rx) XOR ry), and rotate/reflect the
  * remaining quadrant. Callers pre-scale keys into [0, 2^bits) (see
  * Layout.withH — equal-width normalization by the key's max keeps the
  * math integer-exact and SQL-reproducible).
  */
case class Hilbert2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType,
            LongType | IntegerType | ShortType | ByteType) =>
        if (bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"Hilbert2 bits must be in [1,31], got $bits")
      case other =>
        TypeCheckResult.TypeCheckFailure(s"Hilbert2 requires integral inputs, got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert2.index(toLong(x), toLong(y), bits)

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.Hilbert2.index((long) $x, (long) $y, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Hilbert2 =
    copy(left = newLeft, right = newRight)
}

object Hilbert2 {
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftExpr.column(Hilbert2(GraftExpr.expression(x), GraftExpr.expression(y), bits))

  /** d = xy2d(2^bits, x, y). Keys wider than `bits` contribute only
    * their low bits — callers normalize first. Branch table per level
    * (rx = x-bit, ry = y-bit): quadrant digit (3·rx) XOR ry, then for
    * ry = 0 reflect (rx = 1 only) against n−1 and swap the axes.
    */
  def index(x: Long, y: Long, bits: Int): Long = {
    val n = 1L << bits
    var xx = x & (n - 1L)
    var yy = y & (n - 1L)
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((xx & s) > 0L) 1L else 0L
      val ry = if ((yy & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          xx = n - 1L - xx
          yy = n - 1L - yy
        }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }

  /** The identical xy2d walk as a DuckDB CTE chain. `from` must expose
    * columns `hx0`, `hy0` (longs in [0, 2^bits)) plus `carry` columns;
    * the returned fragment appends CTEs `h1 … h<bits>` (each level's
    * rotate/reflect state under fresh column names — no lateral-alias
    * ambiguity) and the final CTE exposes the carry columns plus the
    * index as `hd`. Splice as:
    * `WITH <from-def>, <ctes> SELECT …, hd FROM <lastName>`.
    */
  def sqlDuckCtes(from: String, bits: Int, carry: Seq[String]): (String, String) = {
    val n = 1L << bits
    val cols = carry.mkString(", ")
    val levels = (1 to bits).map { j =>
      val s = 1L << (bits - j)
      val prev = if (j == 1) from else s"h${j - 1}"
      val px = if (j == 1) "hx0" else s"hx${j - 1}"
      val py = if (j == 1) "hy0" else s"hy${j - 1}"
      val pd = if (j == 1) "CAST(0 AS BIGINT)" else s"hd${j - 1}"
      s"""h$j AS (SELECT $cols,
         |  CASE WHEN ($py & $s) > 0 THEN $px
         |       WHEN ($px & $s) > 0 THEN ${n - 1L} - $py ELSE $py END AS hx$j,
         |  CASE WHEN ($py & $s) > 0 THEN $py
         |       WHEN ($px & $s) > 0 THEN ${n - 1L} - $px ELSE $px END AS hy$j,
         |  $pd + ${s * s} * CASE WHEN ($px & $s) > 0 AND ($py & $s) > 0 THEN 2
         |                        WHEN ($px & $s) > 0 THEN 3
         |                        WHEN ($py & $s) > 0 THEN 1 ELSE 0 END AS hd$j
         |FROM $prev)""".stripMargin
    }
    val fin = s"hh AS (SELECT $cols, hd$bits AS hd FROM h$bits)"
    ((levels :+ fin).mkString(",\n"), "hh")
  }
}
