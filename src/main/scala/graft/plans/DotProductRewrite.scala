package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.DotProductF

/** Optimizer rule (SURVEY §4.2 stretch): rewrites the declarative HOF
  * dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *             0.0, (acc, v) -> acc + v)
  *
  * into the native codegen'd `DotProductF(a, b)`. Semantics are
  * identical (both are a strict left fold of the products in array
  * order), so user code written against plain `functions._` silently
  * gets the tight primitive loop. Registered via
  * `graft.GraftExtensions` (`injectOptimizerRule`) or
  * `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case x: NamedLambdaVariable => x.exprId == v.exprId
      case Cast(x: NamedLambdaVariable, DoubleType, _, _) => x.exprId == v.exprId
      case _ => false
    }

  /** (x, y) -> double(x) * double(y) over the two zip lambda args. */
  private def isPairProduct(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(l, x) && isVar(r, y)) || (isVar(l, y) && isVar(r, x))
    case _ => false
  }

  /** (acc, v) -> acc + v */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(l, a) && isVar(r, v)) || (isVar(l, v) && isVar(r, a))
    case _ => false
  }

  /** acc -> acc (the default finish lambda of `aggregate`). */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      body.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(ZipWith(a, b, pair), Literal(0.0, DoubleType), merge, finish)
          if isPairProduct(pair) && isSumMerge(merge) && isIdentityFinish(finish) =>
        DotProductF(a, b)
    }
}
