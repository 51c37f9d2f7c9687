package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.D — aggregation + Customer-360 feature ops.
  *
  * All group-bys compile to partial+final `HashAggregateExec`, so the
  * shuffle carries one accumulator per (group, partition) — the map-side
  * combine is what makes these survive a 100-TB lineitem.
  */
object Aggregates extends OpModule {
  import Det._

  /** Flagship — TPC-H Q1 shape: per-(returnflag, linestatus) pricing
    * summary. The reference's "aggregate activity per segment" analogue. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val l = Tables.t(s, dir, "lineitem")
    // rate factors kept at DECIMAL(6,4) and pre-multiplied so the
    // price×factors product stays far below the 38-digit decimal cap
    // (where Spark would round but DuckDB wouldn't — see Det).
    val one = lit(1).cast(D6)
    val price = d12($"l_extendedprice")
    val discF = one - d6($"l_discount")          // (7,4)
    val taxF = one + d6($"l_tax")                // (7,4)
    l.groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumMoney($"l_quantity").as("sum_qty"),
        sumMoney($"l_extendedprice").as("sum_base_price"),
        dbl4(sum(price * discF)).as("sum_disc_price"),
        dbl4(sum(price * (discF * taxF))).as("sum_charge"),
        avg4($"l_quantity").as("avg_qty"),
        avg4($"l_extendedprice").as("avg_price"),
        avg4($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, Q] = Map(
    "q_agg_pricing_summary" -> (pricingSummary _)
  )

  val oracle: Map[String, String] = Map(
    "q_agg_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS sum_disc_price,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * ((CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))))), 4) AS DOUBLE) AS sum_charge,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
        |  ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
