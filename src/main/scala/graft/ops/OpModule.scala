package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module per SURVEY.md §2 category. Each op is a pure
  * `(SparkSession, sfDir) => DataFrame`; its DuckDB oracle SQL (when
  * SQL-expressible) lives alongside in `oracle` under the same key so a
  * single diff reviews both halves of the contract.
  */
trait OpModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
