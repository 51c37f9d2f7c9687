package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimF, DotProductF, ShingleGen,
  SortedIntersectCountF}

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
    ext.injectFunction((
      FunctionIdentifier("shingle_gen"),
      new ExpressionInfo(classOf[ShingleGen].getName, "shingle_gen"),
      GraftExtensions.shingleGenBuilder))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count_f"),
      new ExpressionInfo(classOf[SortedIntersectCountF].getName,
        "sorted_intersect_count_f"),
      binary("sorted_intersect_count_f", SortedIntersectCountF(_, _))))
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.SessionizeStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.BandJoinStrategy)
  }
}

object GraftExtensions {
  /** Shared by the extensions path and GraftFunctions.register: the
    * shingle size must be a foldable integer (it is part of the plan,
    * not a per-row value). */
  val shingleGenBuilder: Seq[Expression] => Expression = {
    case Seq(a, kExpr) if kExpr.foldable && kExpr.eval() != null =>
      ShingleGen(a, kExpr.eval().asInstanceOf[Number].intValue())
    case _ => throw new IllegalArgumentException(
      "shingle_gen requires (array<string>, integer literal k)")
  }
}
