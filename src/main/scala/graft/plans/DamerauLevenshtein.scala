package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native TRUE Damerau-Levenshtein distance (Lowrance & Wagner 1975)
  * — the transposition-aware edit distance Spark's levenshtein lacks;
  * the single most common human typo class (adjacent swap) costs 1
  * here and 2 there. TRUE Damerau, not the cheaper OSA restriction:
  * a substring may be edited after a transposition ('ca' → 'abc' is
  * 2, where OSA says 3) — pinned by probe to DuckDB's independent
  * `damerau_levenshtein`, which the oracle cross-validates against
  * (UTF-8 bytes, not codepoints: 'üx' vs 'xü' is 2).
  *
  * Cost is O(|a|·|b|) time and space per pair (the full H matrix plus
  * a 256-entry last-seen table) — fine for name-length strings under
  * a blocked join, wrong for documents; codegen calls the static
  * scorer like levenshtein does, staying inside whole-stage codegen.
  */
case class DamerauLevenshtein(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"DamerauLevenshtein requires strings, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DamerauLevenshtein.distance(
      a.asInstanceOf[UTF8String].getBytes, b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.plans.DamerauLevenshtein.distance($x.getBytes(), $y.getBytes())")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def apply(a: Column, b: Column): Column =
    GraftExpr.column(DamerauLevenshtein(GraftExpr.expression(a), GraftExpr.expression(b)))

  /** Lowrance-Wagner DP with the (la+2)×(lb+2) H matrix and a
    * last-occurrence table over the byte alphabet.
    */
  def distance(a: Array[Byte], b: Array[Byte]): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    val h = Array.ofDim[Int](la + 2, lb + 2)
    h(0)(0) = inf
    var i = 0
    while (i <= la) { h(i + 1)(0) = inf; h(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { h(0)(j + 1) = inf; h(1)(j + 1) = j; j += 1 }
    val da = new Array[Int](256)
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val i1 = da(b(j - 1) & 0xff)
        val j1 = db
        var cost = 1
        if (a(i - 1) == b(j - 1)) { cost = 0; db = j }
        val sub = h(i)(j) + cost
        val ins = h(i + 1)(j) + 1
        val del = h(i)(j + 1) + 1
        val trans = h(i1)(j1) + (i - i1 - 1) + 1 + (j - j1 - 1)
        h(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      da(a(i - 1) & 0xff) = i
      i += 1
    }
    h(la + 1)(lb + 1)
  }
}
