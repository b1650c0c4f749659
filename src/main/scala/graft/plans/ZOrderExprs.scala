package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Z-order (Morton) interleave of two non-negative integer keys — the
  * multi-dimensional clustering key behind data-skipping layouts
  * (Delta/Iceberg OPTIMIZE ZORDER BY, Bayer's UB-tree). Sorting a
  * table by z(x, y) gives every contiguous run of rows a BOUNDED range
  * in BOTH dimensions, so parquet row-group/file min-max stats prune
  * scans filtered on either key — where a single-column sort clusters
  * one dimension and shreds the other.
  *
  * At 100 TB this is a WRITE-side operator: one repartitionByRange on
  * the z value (range exchange, sampled bounds) + sortWithinPartitions
  * before the parquet write; every later selective scan on either key
  * pays for it. The interleave itself is a native codegen expression —
  * a per-row bit loop, no allocation, map-only.
  *
  * `bits` is the per-dimension width: callers pre-scale keys into
  * [0, 2^bits) (see Layout.zorderLayout — equal-width normalization by
  * the key's max keeps the math integer-exact and SQL-reproducible).
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType,
            LongType | IntegerType | ShortType | ByteType) =>
        if (bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(s"ZOrder2 bits must be in [1,31], got $bits")
      case other =>
        TypeCheckResult.TypeCheckFailure(s"ZOrder2 requires integral inputs, got $other")
    }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    ZOrder2.interleave(toLong(x), toLong(y), bits)

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.plans.ZOrder2.interleave((long) $x, (long) $y, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrder2 {
  def apply(x: Column, y: Column, bits: Int): Column =
    GraftExpr.column(ZOrder2(GraftExpr.expression(x), GraftExpr.expression(y), bits))

  /** z = Σ_i ((x>>i)&1)<<2i | ((y>>i)&1)<<(2i+1). Keys wider than
    * `bits` contribute only their low bits — callers normalize first.
    */
  def interleave(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** The identical interleave as DuckDB SQL over column expressions
    * `x`/`y` — an OR-fold of the same shift terms, so the oracle
    * reproduces the Spark value bit-for-bit.
    */
  def sqlDuck(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
