package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Subquery surface (SURVEY §4.1: `RewritePredicateSubquery` /
  * `DecorrelateInnerQuery`). The SQL text is dialect-shared verbatim —
  * Catalyst decorrelates the scalar subquery into an aggregate + join,
  * so at scale this is one extra shuffle on the correlation key, not a
  * per-row probe.
  */
object Subqueries extends OpModule {

  private def viewsFor(s: SparkSession, dir: String): Unit = {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_sq")
    Tables.t(s, dir, "customer").createOrReplaceTempView("customer_sq")
  }

  /** Orders priced above 1.5× their customer's average order value —
    * correlated scalar subquery. */
  def subqueryScalar(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir)
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders_sq o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders_sq i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Customers with at least one 450k+ order — IN-subquery form of the
    * semi join. */
  def subqueryIn(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir)
    s.sql(
      """SELECT c_custkey, c_name
        |FROM customer_sq
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders_sq WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated EXISTS / NOT EXISTS in one result: customers split by
    * whether they have a large recent order — Catalyst rewrites both
    * branches into semi/anti joins on the correlation key. */
  def subqueryExists(s: SparkSession, dir: String): DataFrame = {
    viewsFor(s, dir)
    s.sql(
      """SELECT c_custkey, c_name,
        |  EXISTS (SELECT 1 FROM orders_sq o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_totalprice > 400000) AS has_big_order
        |FROM customer_sq c
        |WHERE EXISTS (SELECT 1 FROM orders_sq o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders_sq o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice > 500000)
        |ORDER BY c_custkey""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q_subquery_scalar" -> (subqueryScalar _),
    "q_subquery_in" -> (subqueryIn _),
    "q_subquery_exists" -> (subqueryExists _)
  )

  val oracle: Map[String, String] = Map(
    "q_subquery_scalar" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*)
        |  FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "q_subquery_in" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "q_subquery_exists" ->
      """SELECT c_custkey, c_name,
        |  EXISTS (SELECT 1 FROM orders o
        |          WHERE o.o_custkey = c.c_custkey
        |            AND o.o_totalprice > 400000) AS has_big_order
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F'
        |                    AND o.o_totalprice > 500000)
        |ORDER BY c_custkey""".stripMargin
  )
}
