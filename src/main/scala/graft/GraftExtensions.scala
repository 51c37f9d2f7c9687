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
    ext.injectFunction((
      FunctionIdentifier("dot_product_f"),
      new ExpressionInfo(classOf[DotProductF].getName, "dot_product_f"),
      (exprs: Seq[Expression]) => DotProductF(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim_f"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim_f"),
      (exprs: Seq[Expression]) => CosineSimF(exprs(0), exprs(1))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}
