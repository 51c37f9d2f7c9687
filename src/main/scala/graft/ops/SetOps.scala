package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.G — set operations over two customer cohorts:
  * A = high account balance (c_acctbal > 7000),
  * B = high spend (lifetime order total > 2,000,000).
  * INTERSECT/EXCEPT are distinct-set semantics in both engines.
  */
object SetOps extends OpModule {
  import Det._

  private def cohortA(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .filter($"c_acctbal" > 7000)
      .select($"c_custkey")
  }

  private def cohortB(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sumMoney($"o_totalprice").as("spend"))
      .filter($"spend" > 2000000d)
      .select($"o_custkey".as("c_custkey"))
  }

  def unionAll(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cohortA(s, dir).union(cohortB(s, dir)).orderBy($"c_custkey")
  }

  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cohortA(s, dir).union(cohortB(s, dir)).distinct().orderBy($"c_custkey")
  }

  def intersectCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cohortA(s, dir).intersect(cohortB(s, dir)).orderBy($"c_custkey")
  }

  def exceptCohorts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cohortA(s, dir).except(cohortB(s, dir)).orderBy($"c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_set_union_all" -> (unionAll _),
    "q_set_union_distinct" -> (unionDistinct _),
    "q_set_intersect" -> (intersectCohorts _),
    "q_set_except" -> (exceptCohorts _)
  )

  private val cohortsCte =
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7000),
      |b AS (SELECT o_custkey AS c_custkey FROM orders GROUP BY o_custkey
      |  HAVING CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) > 2000000)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_set_union_all" ->
      (cohortsCte +
        "SELECT c_custkey FROM ((SELECT * FROM a) UNION ALL (SELECT * FROM b)) u ORDER BY c_custkey"),
    "q_set_union_distinct" ->
      (cohortsCte +
        "SELECT c_custkey FROM ((SELECT * FROM a) UNION (SELECT * FROM b)) u ORDER BY c_custkey"),
    "q_set_intersect" ->
      (cohortsCte +
        "SELECT c_custkey FROM ((SELECT * FROM a) INTERSECT (SELECT * FROM b)) u ORDER BY c_custkey"),
    "q_set_except" ->
      (cohortsCte +
        "SELECT c_custkey FROM ((SELECT * FROM a) EXCEPT (SELECT * FROM b)) u ORDER BY c_custkey")
  )
}
