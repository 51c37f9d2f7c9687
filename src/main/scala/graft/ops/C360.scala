package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** The reference's end product (SURVEY §0.5): the enriched Customer-360
  * profile — demographics ⋈ geography ⋈ RFM ⋈ trailing-window spend ⋈
  * per-category activity pivot — as ONE wide row per customer, plus a
  * scored variant with the MLlib segment.
  *
  * Shape at scale: one shuffle per fact aggregation (orders by custkey,
  * events by user), then left joins onto the customer spine with the
  * dimension side broadcast. No data is scanned twice.
  */
object C360 extends OpModule {
  import Det._

  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  def profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
    val n = Tables.t(s, dir, "nation")
    val r = Tables.t(s, dir, "region")
    val o = Tables.t(s, dir, "orders")
    val e = Tables.t(s, dir, "events")

    val maxd = o.agg(max($"o_orderdate").cast("date").as("maxd"))
    def win(days: Int): Column =
      datediff($"maxd", $"o_orderdate".cast("date")) < days
    val orderFeats = o.crossJoin(broadcast(maxd))
      .groupBy($"o_custkey")
      .agg(
        datediff(max($"maxd"), max($"o_orderdate".cast("date"))).as("recency_days"),
        count(lit(1)).as("frequency"),
        sumMoney($"o_totalprice").as("monetary"),
        count(when(win(30), lit(1))).as("n_30d"),
        coalesce(sum(when(win(90), d12($"o_totalprice"))).cast("double"), lit(0.0))
          .as("spend_90d"))

    val activity = e.groupBy($"user_id")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)).as("cnt"))

    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .join(orderFeats, $"c_custkey" === $"o_custkey", "left")
      .join(activity, $"c_custkey" === $"user_id", "left")
      .select(
        ($"c_custkey" +: $"c_name" +: $"c_mktsegment" +: $"n_name" +: $"r_name" +:
          coalesce($"recency_days", lit(-1)).as("recency_days") +:
          coalesce($"frequency", lit(0L)).as("frequency") +:
          coalesce($"monetary", lit(0.0)).as("monetary") +:
          coalesce($"n_30d", lit(0L)).as("n_30d") +:
          coalesce($"spend_90d", lit(0.0)).as("spend_90d") +:
          // single-agg pivot names columns by the pivot value alone
          eventTypes.map(t =>
            coalesce(col(t), lit(0L)).as(s"${t}_cnt"))): _*)
      .orderBy($"c_custkey")
  }

  /** Profile + KMeans RFM segment (fixed seed) — the AML-scored profile
    * analogue. Trained model ⇒ non-oracled; golden-tested. */
  def scoredProfile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    import org.apache.spark.ml.Pipeline
    import s.implicits._
    // registry persist (released via OpCache.clear) — a bare .persist
    // here leaked across the rest of a bench session
    val base = OpCache.cached(s, dir, "c360_base")(profile(s, dir))
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(Array("recency_days", "frequency", "monetary"))
        .setOutputCol("raw"),
      new StandardScaler().setInputCol("raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new KMeans().setK(5).setSeed(42L).setMaxIter(20).setInitMode("random")
        .setPredictionCol("segment")))
    pipe.fit(base).transform(base)
      .select($"c_custkey", $"c_mktsegment", $"recency_days", $"frequency",
        $"monetary", $"segment")
      .orderBy($"c_custkey")
  }

  val queries: Map[String, Q] = Map(
    "q_c360_profile" -> (profile _),
    "q_c360_scored" -> (scoredProfile _)
  )

  private val pivotCols = eventTypes.map(t =>
    s"  COALESCE(${t}_cnt, 0) AS ${t}_cnt").mkString(",\n")
  private val pivotAggs = eventTypes.map(t =>
    s"    COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS ${t}_cnt")
    .mkString(",\n")

  val oracle: Map[String, String] = Map(
    "q_c360_profile" ->
      s"""WITH md AS (SELECT CAST(max(o_orderdate) AS DATE) AS maxd FROM orders),
         |of AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), max(maxd)) AS INTEGER) AS recency_days,
         |    COUNT(*) AS frequency,
         |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS monetary,
         |    COUNT(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), maxd) < 30 THEN 1 END) AS n_30d,
         |    COALESCE(CAST(SUM(CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), maxd) < 90 THEN CAST(o_totalprice AS DECIMAL(12,4)) END) AS DOUBLE), 0.0) AS spend_90d
         |  FROM orders CROSS JOIN md GROUP BY o_custkey),
         |act AS (
         |  SELECT user_id,
         |$pivotAggs
         |  FROM events GROUP BY user_id)
         |SELECT c_custkey, c_name, c_mktsegment, n_name, r_name,
         |  COALESCE(recency_days, -1) AS recency_days,
         |  COALESCE(frequency, 0) AS frequency,
         |  COALESCE(monetary, 0.0) AS monetary,
         |  COALESCE(n_30d, 0) AS n_30d,
         |  COALESCE(spend_90d, 0.0) AS spend_90d,
         |$pivotCols
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |LEFT JOIN of ON c_custkey = o_custkey
         |LEFT JOIN act ON c_custkey = user_id
         |ORDER BY c_custkey""".stripMargin
  )
}
