package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.classic
import graft.functions.{CosineSimF, DotProductF}
import graft.plans.{AsOfJoinPlan, AsOfJoinStrategy}

/** Imperative twin of `graft.GraftExtensions` for sessions that are
  * already built (the extensions config is only read at build time).
  * Lives in the sql package for `sessionState` access.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product_f",
      { case Seq(a, b) => DotProductF(a, b)
        case other => throw new IllegalArgumentException(
          s"dot_product_f requires exactly 2 arguments, got ${other.length}") },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim_f",
      { case Seq(a, b) => CosineSimF(a, b)
        case other => throw new IllegalArgumentException(
          s"cosine_sim_f requires exactly 2 arguments, got ${other.length}") },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_gen", graft.GraftExtensions.shingleGenBuilder, "scala_udf")
  }

  /** Backward as-of join through the native operator
    * ([[graft.plans.AsOfJoinExec]]): every `left` row gains `right`'s
    * columns from the latest same-key right row strictly before its
    * timestamp (nulls when none). `key`/`ts` columns must be BIGINT on
    * both sides (see the operator scaladoc). Lives in the sql package
    * for `Dataset.ofRows` + analyzed-plan access; registers the
    * planner strategy idempotently so it works on sessions built
    * without `spark.sql.extensions`. */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // self-join hygiene: when both inputs descend from the same base
    // relation their attributes share exprIds, and a binary node with
    // duplicate ids across children is ambiguous (the analyzer's
    // DeduplicateRelations never sees this custom node) — re-alias the
    // right side into fresh ids unconditionally
    val rp: LogicalPlan =
      Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"asofJoin: no column '$n' on the $side side " +
          s"(have ${p.output.map(_.name).mkString(", ")})"))
    classic.Dataset.ofRows(spark, AsOfJoinPlan(lp, rp,
      attr(lp, leftKey, "left"), attr(lp, leftTs, "left"),
      attr(rp, rightKey, "right"), attr(rp, rightTs, "right")))
  }
}
