package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.Tables
import graft.functions.GeoMean

/** SURVEY.md §2.L — UDF / UDAF / UDTF surface.
  *
  * These are the one place where opaque user code is the point; everywhere
  * else the engine prefers built-in (codegen'd) expressions. The UDAF is a
  * typed `Aggregator` (partial-aggregable — scales like any built-in agg);
  * the generator op uses `posexplode`, Spark's built-in UDTF mechanism.
  */
object Udfs extends OpModule {

  /** Scalar Scala UDF — same banding logic as q_project_case's CASE, so
    * the oracle is the CASE expression. */
  def udfScalar(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val priceBand = udf((p: Double) =>
      if (p < 100000) "low" else if (p < 300000) "mid" else "high")
    Tables.t(s, dir, "orders")
      .select($"o_orderkey", priceBand($"o_totalprice").as("band"))
      .orderBy($"o_orderkey")
  }

  /** Geometric mean of retail price per brand via typed Aggregator.
    * exp(avg(ln(x))) — double log-sum; rounded at 4 dp (libm ulp noise is
    * ~1e-12 relative, far inside the rounding). */
  def udafGeomean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val geomean = udaf(GeoMean)
    Tables.t(s, dir, "part")
      .groupBy($"p_brand")
      .agg(round(geomean($"p_retailprice"), 4).as("geo_price"),
        count(lit(1)).as("n"))
      .orderBy($"p_brand")
  }

  /** Generator: words with position for the first 50 docs. DuckDB zips
    * parallel UNNESTs positionally for the ordinal. */
  def udtfExplode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "documents")
      .filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", $"pos".cast(IntegerType).as("pos"), $"col".as("word"))
      .orderBy($"doc_id", $"pos")
  }

  /** Spark 4 SQL-defined scalar function (`CREATE FUNCTION … RETURN
    * expr`) — the governed-UDF surface: the banding logic lives in the
    * catalog as a SQL expression, so unlike the opaque Scala UDF above
    * it stays CODEGEN-VISIBLE (Catalyst inlines the body — filter
    * pushdown and constant folding still work through it). The oracle
    * inlines the same expression, proving the function is pure
    * sugar. */
  def udfSql(s: SparkSession, dir: String): DataFrame = {
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION price_band_sql(x DOUBLE)
            |RETURNS BIGINT
            |RETURN CAST(ROUND(x * 100) AS BIGINT) div 3000000""".stripMargin)
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_sqludf")
    s.sql(
      """SELECT price_band_sql(o_totalprice) AS band, COUNT(*) AS n
        |FROM orders_sqludf GROUP BY 1 ORDER BY band""".stripMargin)
  }

  /** Recursive CTE (Spark 4) — the calendar-spine generator: a
    * WITH RECURSIVE day series spanning the events month LEFT-joined
    * to daily counts, so silent zero-activity days appear as explicit
    * rows (the recursion-surface twin of `q_events_gapfill`'s
    * sequence-explode).
    *
    * DEPTH BOUND (round-8 pin, batched in r15): recursion depth =
    * ⌈calendar days / 8⌉ (the anchor seeds 8 day-chains and each level
    * advances all of them — ≈4 levels here), and each level is one
    * sequential micro-job — the cost scales with the DATE RANGE, never
    * the data volume (the `daily` side collapses to O(days) first).
    * Spark's `spark.sql.cteRecursionLevelLimit` (default 100) is the
    * hard guard: a corpus spanning more days fails FAST and LOUD
    * instead of launching thousands of sequential jobs. This op is the
    * declared Spark-4 recursion-surface demo; for long or unbounded
    * ranges use `q_events_gapfill`'s `sequence`/explode spine — one
    * job, any range. ScalaTest pins depth < limit at test scale. */
  def sqlRecursive(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "events").createOrReplaceTempView("events_rec")
    // BATCHED recursion (r15 optimization): each UnionLoop iteration
    // costs several sequential driver micro-jobs (measured ~7 jobs/
    // level — the dominant cost of this op at any data size, since the
    // `daily` side collapses to O(days) first). The anchor therefore
    // seeds the first 8 calendar days and each level advances every
    // chain by 8, so a D-day corpus runs ⌈D/8⌉−1 levels instead of
    // D−1 while producing the IDENTICAL day set (day mn+i is reached
    // exactly once, via chain i mod 8 at depth i div 8) — the oracle
    // hash is unchanged. Still a genuine multi-level recursion at the
    // graded corpus (30 days → 3 recursive levels + the empty closer).
    s.sql(
      """WITH RECURSIVE spine(d) AS (
        |  SELECT explode(sequence(mn, least(date_add(mn, 7), mx)))
        |  FROM (SELECT CAST(MIN(ts) AS DATE) AS mn,
        |               CAST(MAX(ts) AS DATE) AS mx FROM events_rec)
        |  UNION ALL
        |  SELECT date_add(d, 8) FROM spine
        |  WHERE date_add(d, 8) <= (SELECT CAST(MAX(ts) AS DATE)
        |                           FROM events_rec)),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events_rec GROUP BY 1)
        |SELECT spine.d AS day, COALESCE(daily.n, 0) AS n_events
        |FROM spine LEFT JOIN daily ON spine.d = daily.d
        |ORDER BY day""".stripMargin)
  }

  /** Spark 4 SQL PIPE syntax (`|>`) — the linear query-composition
    * surface added in Spark 4.0: EXTEND → WHERE → AGGREGATE … GROUP BY
    * → ORDER BY as a left-to-right pipeline. Catalyst parses pipes into
    * the SAME logical plan the SELECT form produces (the oracle grades
    * exactly that equivalence: DuckDB answers the classic form, the
    * pipe form must hash-match it), so every pushdown/pruning property
    * of the classic plan carries over verbatim at 100 TB. */
  def sqlPipe(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_pipe")
    s.sql(
      """FROM orders_pipe
        ||> EXTEND CAST(year(o_orderdate) AS INT) AS o_year
        ||> WHERE o_year BETWEEN 1996 AND 1997
        ||> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
        |     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4)
        |       AS DOUBLE) AS revenue
        |   GROUP BY o_orderstatus, o_year
        ||> ORDER BY o_orderstatus, o_year""".stripMargin)
  }

  /** Spark 4 parameterized SQL — named parameter markers bound
    * server-side (`spark.sql(text, args)`): the injection-safe
    * templating surface a production query service uses instead of
    * string interpolation. The markers are typed literals in the plan,
    * so constant folding / filter pushdown see the bound values
    * exactly as if they were inlined — parameterization costs nothing
    * at 100 TB. Oracled against the same query with values inline. */
  def sqlParams(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "lineitem").createOrReplaceTempView("lineitem_params")
    s.sql(
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))),
        |    4) AS DOUBLE) AS revenue
        |FROM lineitem_params
        |WHERE l_quantity >= :min_qty AND l_discount <= :max_disc
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
      Map("min_qty" -> 10, "max_disc" -> 0.05))
  }

  /** Spark 4 SQL SCRIPTING (BEGIN … END, DECLARE, WHILE): an iterative
    * threshold calibration — double a cents threshold until at most
    * 10% of orders exceed it — as a procedural script the driver runs
    * statement-by-statement (each SET's subquery is an ordinary
    * distributed job; the LOOP is control flow, the WORK is Spark).
    * O(log maxPrice) probe jobs — each one is a full aggregate scan,
    * which is the honest cost of the DEMO shape; the production form
    * folds all probes into one histogram pass (`q_agg_histogram` is
    * that op) and loops over the O(bins) result. The DuckDB oracle
    * replays the same fixpoint as a recursive CTE, so the procedural
    * surface is graded against the declarative one. */
  def sqlScript(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_script")
    s.sql(
      """BEGIN
        |  DECLARE t BIGINT DEFAULT 1;
        |  DECLARE frac BIGINT DEFAULT 1000000;
        |  WHILE frac > 100000 DO
        |    SET t = t * 2;
        |    SET frac = (SELECT COUNT(IF(o_totalprice > t, 1, NULL))
        |      * 1000000 div COUNT(*) FROM orders_script);
        |  END WHILE;
        |  SELECT t AS threshold, frac AS tail_ppm;
        |END""".stripMargin)
  }

  /** SQL TABLE function (`CREATE FUNCTION … RETURNS TABLE`) — the
    * declarative TVF surface beside the Generator-expression UDTF
    * (`q_udtf_explode`): a parameterized price-band segmentation that
    * callers FROM-select like a table. The body inlines into the
    * caller's plan (it is a named parameterized view, not a per-row
    * closure), so pushdown/pruning see straight through it — zero
    * cost at 100 TB. */
  def tvfSql(s: SparkSession, dir: String): DataFrame = {
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_tvf")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION order_bands(
            |    lo DOUBLE, hi DOUBLE)
            |RETURNS TABLE (band STRING, n BIGINT, avg_price DOUBLE)
            |RETURN SELECT
            |  CASE WHEN o_totalprice < lo THEN 'small'
            |       WHEN o_totalprice < hi THEN 'mid'
            |       ELSE 'large' END AS band,
            |  CAST(COUNT(*) AS BIGINT) AS n,
            |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
            |    / COUNT(*), 4) AS DOUBLE) AS avg_price
            |FROM orders_tvf GROUP BY 1""".stripMargin)
    s.sql("SELECT band, n, avg_price FROM order_bands(50000.0D, 200000.0D) " +
      "ORDER BY band")
  }

  val queries: Map[String, Q] = Map(
    "q_tvf_sql" -> (tvfSql _),
    "q_udf_sql" -> (udfSql _),
    "q_sql_recursive" -> (sqlRecursive _),
    "q_sql_pipe" -> (sqlPipe _),
    "q_sql_params" -> (sqlParams _),
    "q_sql_script" -> (sqlScript _),
    "q_udf_scalar" -> (udfScalar _),
    "q_udaf_geomean" -> (udafGeomean _),
    "q_udtf_explode" -> (udtfExplode _)
  )

  val oracle: Map[String, String] = Map(
    "q_tvf_sql" ->
      """SELECT CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |    WHEN o_totalprice < 200000.0 THEN 'mid'
        |    ELSE 'large' END AS band,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
        |    / COUNT(*), 4) AS DOUBLE) AS avg_price
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "q_sql_script" ->
      """WITH RECURSIVE steps(t, frac) AS (
        |  SELECT CAST(2 AS BIGINT),
        |    (SELECT COUNT(CASE WHEN o_totalprice > 2 THEN 1 END)
        |       * 1000000 // COUNT(*) FROM orders)
        |  UNION ALL
        |  SELECT t * 2,
        |    (SELECT COUNT(CASE WHEN o_totalprice > s.t * 2 THEN 1 END)
        |       * 1000000 // COUNT(*) FROM orders)
        |  FROM steps s WHERE s.frac > 100000)
        |SELECT t AS threshold, frac AS tail_ppm
        |FROM steps WHERE frac <= 100000 LIMIT 1""".stripMargin,
    "q_sql_params" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_items,
        |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))
        |    * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))),
        |    4) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_quantity >= 10 AND l_discount <= 0.05
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_sql_pipe" ->
      """SELECT o_orderstatus,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 4)
        |    AS DOUBLE) AS revenue
        |FROM orders
        |WHERE year(o_orderdate) BETWEEN 1996 AND 1997
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_udf_sql" ->
      """SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) // 3000000 AS band,
        |  COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY band""".stripMargin,
    "q_sql_recursive" ->
      """WITH RECURSIVE spine(d) AS (
        |  SELECT CAST(MIN(CAST(ts AS TIMESTAMP)) AS DATE) FROM events
        |  UNION ALL
        |  SELECT d + 1 FROM spine
        |  WHERE d < (SELECT CAST(MAX(CAST(ts AS TIMESTAMP)) AS DATE)
        |             FROM events)),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
        |  FROM events GROUP BY 1)
        |SELECT spine.d AS day, CAST(COALESCE(daily.n, 0) AS BIGINT)
        |  AS n_events
        |FROM spine LEFT JOIN daily ON spine.d = daily.d
        |ORDER BY day""".stripMargin,
    "q_udf_scalar" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 300000 THEN 'mid'
        |       ELSE 'high' END AS band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_udaf_geomean" ->
      """SELECT p_brand,
        |  ROUND(exp(avg(ln(p_retailprice))), 4) AS geo_price,
        |  COUNT(*) AS n
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q_udtf_explode" ->
      """SELECT doc_id,
        |  CAST(UNNEST(range(len(string_split(text, ' ')))) AS INTEGER) AS pos,
        |  UNNEST(string_split(text, ' ')) AS word
        |FROM documents WHERE doc_id < 50
        |ORDER BY doc_id, pos""".stripMargin
  )
}
