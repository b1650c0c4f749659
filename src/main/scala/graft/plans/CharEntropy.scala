package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits/char) of a document's character distribution
  * — the curation signal that separates natural prose (~4 bits for
  * English) from base64/hex/random junk (≥5.5) and from degenerate
  * repetition (→0), orthogonal to both the bigram repetition ratio
  * (word-level) and the deflate ratio (long-range structure).
  *
  * Native codegen expression: one pass over the string per row,
  * map-only — the 100 TB corpus pays a scan, no shuffle. Counts are
  * per Unicode code point (ASCII fast path in a flat array); the
  * value is computed as (n·log2(n) − Σ c·log2(c)) / n, the same
  * association an oracle uses, so engines agree to the rounding.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"CharEntropy requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.CharEntropy.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

object CharEntropy {
  def apply(text: Column): Column =
    GraftExpr.column(CharEntropy(GraftExpr.expression(text)))

  private val LOG2 = math.log(2.0)

  def entropy(s: UTF8String): Double = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return 0.0
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        other.computeIfAbsent(cp, _ => new Array[Int](1))(0) += 1
      }
      i += Character.charCount(cp)
    }
    var sum = 0.0
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 0) sum += c * (math.log(c) / LOG2)
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { val c = it.next()(0); sum += c * (math.log(c) / LOG2) }
    }
    (n * (math.log(n) / LOG2) - sum) / n
  }
}
