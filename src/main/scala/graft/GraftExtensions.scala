package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimF, DotProductF}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available to SQL. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (cluster-wide, no code
  * changes for users), or imperatively via
  * `org.apache.spark.sql.graft.GraftFunctions.register(spark)` for an
  * already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // arity checked here: a bad call must fail resolution with a clear
    // message, not an IndexOutOfBoundsException from exprs(1)
    def binary(name: String, make: (Expression, Expression) => Expression)
        : Seq[Expression] => Expression = {
      case Seq(a, b) => make(a, b)
      case other => throw new IllegalArgumentException(
        s"$name requires exactly 2 arguments, got ${other.length}")
    }
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      binary("dot_product_f", DotProductF(_, _))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_f"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim_f"),
      binary("cosine_sim_f", CosineSimF(_, _))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
