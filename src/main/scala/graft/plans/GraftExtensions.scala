package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted HOF dot-product shape
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0.0,
  *             (acc, v) -> acc + v)
  *
  * into the native codegen'd [[VecDot]]. Users (and SQL authors) can
  * write the declarative form; plans that contain it get the fast
  * expression automatically. Bit-identical: both accumulate
  * left-to-right in double precision.
  *
  * Registered through SparkSessionExtensions:
  *   SparkSession.builder.withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteDotProduct)
    ext.injectPlannerStrategy(_ => TopKStrategy)
  }
}

/** Plans the TopKPerKey logical node as partial → (exchange inserted
  * by EnsureRequirements) → final bounded-heap passes.
  */
object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.SparkPlan
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      FinalTopKExec(k, keys, order, PartialTopKExec(k, keys, order, planLater(child))) :: Nil
    case _ => Nil
  }
}

object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** x*y, cast(x)*y, x*cast(y), cast(x)*cast(y) over the two lambda vars. */
  private def isElementwiseProduct(body: Expression, x: NamedLambdaVariable, y: NamedLambdaVariable): Boolean = {
    def strip(e: Expression): Expression = e match {
      case Cast(c, DoubleType, _, _) => strip(c)
      case other => other
    }
    body match {
      case Multiply(l, r, _) =>
        (strip(l), strip(r)) match {
          case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
            (lv.exprId == x.exprId && rv.exprId == y.exprId) ||
              (lv.exprId == y.exprId && rv.exprId == x.exprId)
          case _ => false
        }
      case _ => false
    }
  }

  private def isAccPlusV(body: Expression, acc: NamedLambdaVariable, v: NamedLambdaVariable): Boolean =
    body match {
      case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
        (l.exprId == acc.exprId && r.exprId == v.exprId) ||
          (l.exprId == v.exprId && r.exprId == acc.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case agg @ ArrayAggregate(
          ZipWith(a, b, LambdaFunction(mulBody, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(addBody, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          finish
        )
        if isFloatOrDoubleArray(a) && isFloatOrDoubleArray(b) &&
          isElementwiseProduct(mulBody, x, y) && isAccPlusV(addBody, acc, v) &&
          isIdentityFinish(finish) =>
      VecDot(a, b)
  }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }
}
