package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sparse dot product of two KEY-SORTED weighted term vectors — the
  * verification step of a prefix/posting-filtered similarity join
  * (reference: rialto's TF-IDF pair scoring; the Bayardo et al. 2007
  * candidate-verify split). Inputs are `array<struct<w: string,
  * t: double>>` sorted ascending by `w` (sort_array order: unsigned
  * byte-wise UTF8 comparison, which [[UTF8String.compareTo]]
  * reproduces); output is Σ a.t·b.t over shared keys, accumulated in
  * ascending-key order via a two-pointer merge — the SAME IEEE fold
  * order as the posting-join formulation
  * `aggregate(sort_array(collect_list(struct(w, p))), 0d, +)`, so
  * replacing that aggregation with this expression is hash-identical.
  *
  * O(|a|+|b|) per pair where the map-lookup HOF form is O(|a|·|b|),
  * and codegen'd where the HOF chain is interpreted. Self-application
  * `SortedKeyDot(arr, arr)` yields the squared norm with the identical
  * fold order. Null entries/keys contribute nothing.
  */
case class SortedKeyDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(StructType(Array(k, v)), _) =>
      k.dataType == StringType && v.dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"SortedKeyDot requires array<struct<string,double>> inputs, got ${left.dataType}, ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var acc = 0.0
    while (i < nx && j < ny) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val xs = x.getStruct(i, 2)
        val ys = y.getStruct(j, 2)
        if (xs.isNullAt(0)) i += 1
        else if (ys.isNullAt(0)) j += 1
        else {
          val c = xs.getUTF8String(0).compareTo(ys.getUTF8String(0))
          if (c < 0) i += 1
          else if (c > 0) j += 1
          else {
            if (!xs.isNullAt(1) && !ys.isNullAt(1)) acc += xs.getDouble(1) * ys.getDouble(1)
            i += 1; j += 1
          }
        }
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val c = ctx.freshName("cmp")
      s"""
         |int $nx = $x.numElements();
         |int $ny = $y.numElements();
         |int $i = 0; int $j = 0;
         |double $acc = 0.0;
         |while ($i < $nx && $j < $ny) {
         |  if ($x.isNullAt($i)) { $i++; continue; }
         |  if ($y.isNullAt($j)) { $j++; continue; }
         |  org.apache.spark.sql.catalyst.InternalRow $xs = $x.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $ys = $y.getStruct($j, 2);
         |  if ($xs.isNullAt(0)) { $i++; continue; }
         |  if ($ys.isNullAt(0)) { $j++; continue; }
         |  int $c = $xs.getUTF8String(0).compareTo($ys.getUTF8String(0));
         |  if ($c < 0) { $i++; }
         |  else if ($c > 0) { $j++; }
         |  else {
         |    if (!$xs.isNullAt(1) && !$ys.isNullAt(1)) {
         |      $acc += $xs.getDouble(1) * $ys.getDouble(1);
         |    }
         |    $i++; $j++;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedKeyDot =
    copy(left = newLeft, right = newRight)
}

object SortedKeyDot {
  def apply(a: Column, b: Column): Column =
    GraftExpr.column(SortedKeyDot(GraftExpr.expression(a), GraftExpr.expression(b)))
}
