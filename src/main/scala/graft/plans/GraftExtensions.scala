package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSim, DotProduct}

/** Optimizer rule: rewrite the composable dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused native [[DotProduct]] — one codegen'd loop instead
  * of an intermediate products array plus two higher-order-function
  * frames. Semantics identical: both accumulate ascending-index
  * doubles (null element → product null → add null... the composed
  * form propagates null sums, so the rewrite only fires when both
  * array element types are non-nullable).
  */
object DotProductRewrite extends Rule[LogicalPlan] {
  private def isDoubleArray(e: Expression, allowNullable: Boolean): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => allowNullable || !containsNull
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _), _, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v: NamedLambdaVariable, _), _, _),
          LambdaFunction(finishVar: NamedLambdaVariable, _, _))
        if isDoubleArray(a, allowNullable = false) && isDoubleArray(b, allowNullable = false) =>
      DotProduct(a, b)
  }
}

/** Session extensions entry point:
  *
  * {{{ spark.sql.extensions=graft.plans.GraftExtensions }}}
  *
  * injects the graft_dot / graft_cosine SQL functions and the
  * dot-product rewrite rule into every session — the
  * SparkSessionExtensions integration path for clusters where
  * code can't call ArrayFns.register explicitly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
