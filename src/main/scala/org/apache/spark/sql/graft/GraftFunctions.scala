package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import graft.functions.{CosineSimF, DotProductF}

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
}
