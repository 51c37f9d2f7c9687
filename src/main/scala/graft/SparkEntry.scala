package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates every OpModule's query registry + oracle SQL.
  */
object SparkEntry {
  private val modules: Seq[OpModule] = Seq(
    Scans, Scalars, Joins, Subqueries, Aggregates, Windows, SetOps, Udfs,
    Dedup, TextOps, Multimodal, Streaming, MlOps, C360, Sketches,
    PipelineOps, Embeddings
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Aggregates.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap
}
