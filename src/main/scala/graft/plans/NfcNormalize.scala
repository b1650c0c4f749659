package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpr
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression.
  *
  * Spark has no built-in normalizer; an LLM corpus-cleaning pipeline
  * needs one early (decomposed accents, compatibility forms, and
  * mixed-form duplicates defeat exact dedup and token counting).
  * Realized as a UnaryExpression whose codegen calls a static helper
  * — stays inside WholeStageCodegen (no UDF/serde boundary), with a
  * fast pure-ASCII skip: Normalizer.isNormalized is O(n) with no
  * allocation for the overwhelmingly-ASCII common case, so the 100 TB
  * cost is one scan per value, not one rewrite per value.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"NfcNormalize requires string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalizeU8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalizeU8($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftExpr.column(NfcNormalize(GraftExpr.expression(text)))

  /** Static entry point shared by eval and codegen. */
  def normalizeU8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
