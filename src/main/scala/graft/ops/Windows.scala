package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.E (window functions) + §2.F (sort / limit / top-k).
  *
  * Every window ORDER BY carries a unique tiebreaker (§2.0 rule 5).
  * Running/moving sums go through DECIMAL so the frame aggregation is
  * exact and order-insensitive. At scale each window is one shuffle on
  * its partition key; `q_sort_multi` compiles to
  * `TakeOrderedAndProjectExec` (per-partition top-k + merge, no global
  * sort).
  */
object Windows extends OpModule {
  import Det._

  def winRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def winNtilePct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
    Tables.t(s, dir, "customer")
      .select($"c_nationkey", $"c_custkey",
        ntile(4).over(w).as("quartile"),
        r4(percent_rank().over(w)).as("pct"))
      .orderBy($"c_nationkey", $"c_custkey")
  }

  def winRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        sum(d12($"o_totalprice")).over(w).cast("double").as("run_total"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def winMovingAvg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(-2, 0)
    Tables.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        round(sum(d12($"o_totalprice")).over(w).cast("double") /
          count(lit(1)).over(w), 4).as("mavg3"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** INTEGER-EXACT rolling Z-SCORE anomaly flags — the per-entity
    * "is this event wildly off this user's own recent baseline?"
    * monitor that backs fraud/abuse triage and metric alerting: each
    * event is compared against the mean and population variance of the
    * SAME user's previous 10 event values (current row excluded — the
    * baseline must not contain the point it judges; ≥5 prior points
    * required, else no verdict). Flagged when |v − μ| > 2σ.
    *
    * The whole predicate is INT64: with cent-values v, frame sum S,
    * frame sum-of-squares SS and frame count n,
    * |v − S/n| > 2·sqrt((n·SS − S²)/n²)  ⟺  (n·v − S)² > 4·(n·SS − S²)
    * — multiply through by n² and square both sides (both are
    * non-negative). No division, no sqrt, no float ever crosses the
    * engine boundary, so the flag is bit-exact against the oracle's
    * identical integer algebra (bounds: cents ≤ 10⁵ ⇒ n·SS ≤ 10¹²,
    * far inside int64).
    *
    * One shuffle on user_id; the three frame aggregates share one
    * window sort (same spec → one Window node); the flag itself is a
    * codegen'd scalar expression. */
  def winZscore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-10, -1)
    Tables.t(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        round($"value" * 100).cast("long").as("v_c"))
      .select($"event_id", $"user_id", $"v_c",
        count($"v_c").over(w).as("n_w"),
        sum($"v_c").over(w).as("s_w"),
        sum($"v_c" * $"v_c").over(w).as("ss_w"))
      .select($"event_id", $"user_id", $"v_c", $"n_w",
        ($"n_w" >= 5 &&
          ($"n_w" * $"v_c" - $"s_w") * ($"n_w" * $"v_c" - $"s_w") >
            lit(4L) * ($"n_w" * $"ss_w" - $"s_w" * $"s_w"))
          .as("is_anomaly"))
      .orderBy($"event_id")
  }

  /** INTEGER-EXACT EWMA trend feature — the exponential smoothing the
    * moving average can't give (recent points dominate): per-nation
    * daily quantity smoothed with DYADIC weights 2⁷…2⁰ over the last 8
    * observations. Powers of two make the whole kernel int64 — the
    * weighted sum and the observed-weight total divide exactly the
    * same on every engine (no α^i float pow drift, the reason naive
    * EWMA can't cross an engine boundary bit-stably). Missing lags
    * (series head) drop out of BOTH numerator and denominator, which
    * is exactly the standard bias-corrected EWMA warm-up.
    *
    * One shuffle on the partition key; the 8 lags are a single window
    * sort shared by all terms (Catalyst collapses same-spec window
    * functions into one Window node). */
  def winEwma(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables.t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nation"),
        to_date($"o_orderdate").as("d"))
      .agg(sum(d12($"l_quantity")).cast("long").as("qty"))
    val w = Window.partitionBy($"nation").orderBy($"d")
    val lags = (1 to 7).map(i => lag($"qty", i).over(w).as(s"q$i"))
    val lagged = daily.select($"nation" +: $"d" +: $"qty" +: lags: _*)
    val num = (1 to 7).foldLeft($"qty" * 128L) { (acc, i) =>
      acc + coalesce(col(s"q$i"), lit(0L)) * (1L << (7 - i))
    }
    val den = (1 to 7).foldLeft(lit(128L)) { (acc, i) =>
      acc + when(col(s"q$i").isNull, 0L).otherwise(1L << (7 - i))
    }
    lagged
      .select($"nation", $"d", $"qty",
        (lit(1000L) * num).as("num"), den.as("den"))
      .select($"nation", $"d", $"qty",
        expr("num div den").as("ewma_x1000"))
      .orderBy($"nation", $"d")
  }

  /** Time-based RANGE frame: per-user trailing-hour event value sum over
    * epoch seconds. Peers at equal seconds are all in-frame (RANGE
    * semantics) so ties are deterministic by construction. */
  def winRangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
      .withColumn("epoch_s", expr("unix_micros(ts) div 1000000"))
    val w = Window.partitionBy($"user_id").orderBy($"epoch_s")
      .rangeBetween(-3600, 0)
    e.select($"event_id", $"user_id", $"epoch_s",
        sum(d12($"value")).over(w).cast("double").as("hour_sum"))
      .orderBy($"event_id")
  }

  def winLeadLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.t(s, dir, "events")
      .select($"event_id", $"user_id",
        (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
        lead($"event_type", 1).over(w).as("next_type"))
      .orderBy($"event_id")
  }

  def winFirstLast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.t(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        first($"o_orderkey").over(w).as("first_key"),
        last($"o_orderkey").over(w).as("last_key"),
        nth_value($"o_orderkey", 2).over(w).as("second_key"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def topkPerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"rn", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey", $"rn")
  }

  def sortMulti(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(100)
  }

  /** KEYSET pagination — the scale-correct page fetch (`LIMIT k` after
    * a composite-key cursor predicate) vs the OFFSET anti-pattern:
    * `OFFSET n` must produce-and-discard n rows on every page (O(n·k)
    * total across a scan), while the keyset predicate pushes to the
    * scan and each page is an independent O(k) top-k
    * (TakeOrderedAndProject, same fused plan as every top-k here).
    * Page 4 of the order book ordered by (o_orderdate, o_orderkey),
    * cursor = last key of page 3, page size 50. The row-comparison
    * `(d, k) > (d₀, k₀)` is decomposed to its OR form so both engines
    * plan plain conjunctive pushdown. */
  def sortKeyset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pageSize = 50
    val o = Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        $"o_orderdate".cast("date").as("d"), $"o_totalprice")
    // cursor: the last (d, key) of page 3 — in production this arrives
    // from the client; derived here so the op is self-contained AND the
    // equivalence to pages 1-3+4 stays oracle-checkable
    val cursor = o.orderBy($"d", $"o_orderkey").limit(3 * pageSize)
      .agg(max_by(struct($"d", $"o_orderkey"), struct($"d", $"o_orderkey"))
        .as("c"))
      .select($"c.d".as("cd"), $"c.o_orderkey".as("ck"))
    o.crossJoin(broadcast(cursor))
      .filter($"d" > $"cd" || ($"d" === $"cd" && $"o_orderkey" > $"ck"))
      .orderBy($"d", $"o_orderkey")
      .limit(pageSize)
      .select($"o_orderkey", $"o_custkey", $"d".as("o_date"),
        d12($"o_totalprice").cast("double").as("total"))
  }

  /** Engine defaults differ (Spark ASC=nulls-first, DuckDB ASC=nulls-last)
    * so null placement is always explicit. */
  def sortNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders")
      .select($"o_orderkey",
        nullif($"o_orderpriority", lit("4-NOT SPECIFIED")).as("prio_n"))
      .orderBy($"prio_n".asc_nulls_last, $"o_orderkey".asc)
      .limit(500)
  }

  /** percent_rank + cume_dist within nation by balance. 4-dp rounding
    * is engine-safe here: the quotients are small-int ratios whose
    * half-boundary cases (denominator = 160·5^k) can't occur at these
    * group sizes, and dyadic denominators produce exact doubles both
    * engines round identically. */
  def winDist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal")
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_nationkey", $"c_acctbal",
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cdist"))
      .orderBy($"c_custkey")
  }

  /** TIME-range window frame: per customer, rolling 7-day order count
    * and spend (RANGE BETWEEN INTERVAL 7 DAYS PRECEDING). Value-based
    * frames include all peers of the current order date, so the result
    * is tie-safe and row-order independent by construction — the
    * CORRECT trailing-feature formulation (the anchored conditional agg
    * in q_feat_trailing_windows is the single-anchor variant). One
    * shuffle by customer, sort within partition — the 100-TB shape. */
  def winTimeRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_wtr")
    s.sql(
      """SELECT o_orderkey, o_custkey,
        |  COUNT(*) OVER w AS n_7d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS spend_7d
        |FROM orders_wtr
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Longest consecutive-day activity streak per user — gaps-and-
    * islands via the date-minus-row_number trick (the difference is
    * constant within one unbroken run of days). Distinct days first, so
    * the window is bounded by days-per-user (≤ the calendar span), not
    * by event count — at 100 TB the heavy dedup happens in the
    * map-side-combinable distinct, and the window stays tiny. */
  def winStreak(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"d")
    Tables.t(s, dir, "events")
      .select($"user_id", $"ts".cast("date").as("d")).distinct()
      .withColumn("grp", date_sub($"d", row_number().over(w)))
      .groupBy($"user_id", $"grp").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(max($"len").cast("long").as("max_streak"),
        count(lit(1)).cast("long").as("n_streaks"))
      .orderBy($"user_id")
  }

  /** Batch sessionization — the gaps-and-islands twin of the streaming
    * session window (`q_stream_session`): a new session starts when the
    * gap to the previous event of the same user exceeds 30 minutes.
    * The boundary test is exact integer µs arithmetic (`unix_micros`),
    * and the session index is a running sum of boundary flags — both in
    * ONE window keyed by user_id, so the whole op is a single shuffle
    * on the user key followed by a map-side-combinable aggregate. Per-
    * user event counts bound the window; at 100 TB the historical log
    * sessionizes with the same plan the stream uses live, which is what
    * makes backfilled session features consistent with served ones. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("new_s",
        when($"prev_us".isNull || $"us" - $"prev_us" > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_s").over(run))
      .groupBy($"user_id", $"session_idx")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sumMoney($"value").as("val_sum"))
      .orderBy($"user_id", $"session_idx")
  }

  /** [[sessionize]] answered by the NATIVE gaps-and-islands operator
    * ([[graft.plans.SessionizeExec]], round 9) — the same session
    * rollup, identical rows and oracle SQL, but the lag-indicator +
    * running-sum window pair collapses into one streamed O(1)-state
    * pass: one user exchange + one (user, ts, event_id) sort, ZERO
    * WindowExec nodes, and the per-(user, session) rollup reuses the
    * operator's preserved clustering without a second exchange
    * (plan-pinned). The graded equivalence twin, like
    * `q_join_asof_native` for the as-of family. */
  def sessionizeNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables.t(s, dir, "events")
      .select($"user_id", $"event_id", $"ts", $"value",
        unix_micros($"ts").as("us"))
    org.apache.spark.sql.graft.GraftFunctions
      .sessionize(e, "user_id", "us", "event_id", 1800L * 1000000L)
      .groupBy($"user_id", $"session_idx")
      .agg(
        min($"ts").as("session_start"),
        max($"ts").as("session_end"),
        count(lit(1)).as("n_events"),
        sumMoney($"value").as("val_sum"))
      .orderBy($"user_id", $"session_idx")
  }

  /** Per-user session feature rollup — the reporting layer OVER
    * [[sessionize]]: session count, totals, and 4-dp average
    * events/duration per session. Second aggregation on the already
    * user-clustered session table — the session shuffle is reused, the
    * rollup is map-side combinable on O(sessions) rows. */
  def featSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dur = unix_micros($"session_end") - unix_micros($"session_start")
    sessionize(s, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum($"n_events").cast("long").as("total_events"),
        sum(dur).cast("long").as("total_dur_us"),
        r4(sum($"n_events").cast("double") / count(lit(1)))
          .as("avg_events"),
        r4(sum(dur).cast("double") / count(lit(1))).as("avg_dur_us"))
      .orderBy($"user_id")
  }

  /** Maximum drawdown per user — the engagement-decay / sequence
    * feature "largest drop from peak" over each user's cumulative
    * event value: running decimal cumsum, running peak, max(peak −
    * cum). Every intermediate stays EXACT DECIMAL (sum, max, and
    * subtraction are all exact); only the final per-user maxima cast
    * to double — zero float drift at any partitioning.
    *
    * Scale shape: one shuffle on user_id; both windows and the final
    * agg share that partitioning (single exchange, windows fused). */
  def winDrawdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.t(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", d12($"value").as("v"))
      .withColumn("cum", sum($"v").over(w))
      .withColumn("dd", max($"cum").over(w) - $"cum")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"v").cast("double").as("final_value"),
        max($"dd").cast("double").as("max_drawdown"))
      .orderBy($"user_id")
  }

  /** CUSUM changepoint scan — the control-chart primitive behind "did
    * this metric shift and WHEN": per event type, the running
    * cumulative deviation of the daily event count from the type's
    * overall daily mean, reported as the day where |CUSUM| peaks (the
    * maximum-likelihood single changepoint location) and the signed
    * peak value. All arithmetic is EXACT integers: deviations are
    * scaled by n_days (d_i = x_i·n_days − total, so the rational mean
    * never materializes), the running sum is over the total (day)
    * order within each type, and the argmax tiebreak is earliest day.
    *
    * Scale shape: one (type, day) map-combinable aggregate, O(types)
    * totals broadcast back, one type-partitioned window pair (cusum,
    * then rank over O(days) rows per type). Types are parallel; the
    * window input is bounded by the calendar, never by raw events. */
  def winCusum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cusumPeaks(Tables.t(s, dir, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("x")))
  }

  /** The scan itself over a (event_type, day, x) series table —
    * exposed so PropertiesSpec can plant synthetic level shifts and
    * assert the peak lands on the planted boundary. */
  private[graft] def cusumPeaks(daily: DataFrame): DataFrame = {
    val s = daily.sparkSession
    import s.implicits._
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"x").as("total"))
    val wSum = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPeak = Window.partitionBy($"event_type")
      .orderBy(abs($"cusum").desc, $"day")
    daily.join(broadcast(tot), Seq("event_type"))
      .withColumn("cusum", sum($"x" * $"n_days" - $"total").over(wSum))
      .withColumn("rk", row_number().over(wPeak))
      .filter($"rk" === 1)
      .select($"event_type", $"n_days", $"day".as("peak_day"),
        $"cusum".as("peak_cusum_scaled"))
      .orderBy($"event_type")
  }

  /** Rolling 7-day median of daily activity per event type — the
    * robust trend line (a single spike day drags a rolling MEAN but
    * not the median; this is the smoother ops dashboards overlay on
    * [[graft.ops.Aggregates.eventsLoadCurve]]-style raw series).
    * Exactness: the inputs are integer daily counts cast to double,
    * and both engines interpolate percentiles identically over
    * integral data (`q_agg_percentile` precedent), so the frame median
    * is binary-exact. One (type, day) combinable aggregate, then ONE
    * type-partitioned window with a ROWS 7-frame — types parallel,
    * per-frame buffer bounded by 7. */
  def winRollingMedian(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.t(s, dir, "events")
      .groupBy($"event_type", $"ts".cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("med7", percentile($"x".cast("double"), lit(0.5)).over(w))
      .select($"event_type", $"day", $"x", $"med7")
      .orderBy($"event_type", $"day")
  }

  val queries: Map[String, Q] = Map(
    "q_win_rolling_median" -> (winRollingMedian _),
    "q_win_cusum" -> (winCusum _),
    "q_win_drawdown" -> (winDrawdown _),
    "q_feat_sessions" -> (featSessions _),
    "q_sessionize" -> (sessionize _),
    "q_sessionize_native" -> (sessionizeNative _),
    "q_win_streak" -> (winStreak _),
    "q_win_time_range" -> (winTimeRange _),
    "q_win_dist" -> (winDist _),
    "q_win_rank" -> (winRank _),
    "q_win_ntile_pct" -> (winNtilePct _),
    "q_win_running" -> (winRunning _),
    "q_win_moving_avg" -> (winMovingAvg _),
    "q_win_ewma" -> (winEwma _),
    "q_win_zscore" -> (winZscore _),
    "q_win_range_frame" -> (winRangeFrame _),
    "q_win_lead_lag" -> (winLeadLag _),
    "q_win_first_last" -> (winFirstLast _),
    "q_topk_per_group" -> (topkPerGroup _),
    "q_sort_multi" -> (sortMulti _),
    "q_sort_nulls" -> (sortNulls _),
    "q_sort_keyset" -> (sortKeyset _)
  )

  private[ops] val sessionizeOracle: String =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |      THEN 1 ELSE 0 END AS new_s
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts, value,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM m)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS val_sum
      |FROM g GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_win_zscore" ->
      """WITH e AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS t,
        |    CAST(ROUND(value * 100) AS BIGINT) AS v_c
        |  FROM events),
        |w AS (
        |  SELECT event_id, user_id, v_c,
        |    CAST(COUNT(v_c) OVER win AS BIGINT) AS n_w,
        |    CAST(SUM(v_c) OVER win AS BIGINT) AS s_w,
        |    CAST(SUM(v_c * v_c) OVER win AS BIGINT) AS ss_w
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, user_id, v_c, n_w,
        |  (n_w >= 5 AND
        |    (n_w * v_c - s_w) * (n_w * v_c - s_w) >
        |      4 * (n_w * ss_w - s_w * s_w)) AS is_anomaly
        |FROM w ORDER BY event_id""".stripMargin,
    "q_win_rolling_median" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, x,
        |  quantile_cont(CAST(x AS DOUBLE), 0.5) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med7
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "q_win_cusum" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS BIGINT) AS total
        |  FROM daily GROUP BY 1),
        |c AS (
        |  SELECT d.event_type, t.n_days, d.day,
        |    CAST(SUM(d.x * t.n_days - t.total) OVER (
        |      PARTITION BY d.event_type ORDER BY d.day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cusum
        |  FROM daily d JOIN tot t ON d.event_type = t.event_type),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY ABS(cusum) DESC, day) AS rk
        |  FROM c)
        |SELECT event_type, n_days, day AS peak_day,
        |  cusum AS peak_cusum_scaled
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,
    "q_win_ewma" ->
      """WITH daily AS (
        |  SELECT c.c_nationkey AS nation, CAST(o.o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,4))) AS BIGINT) AS qty
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |lagged AS (
        |  SELECT nation, d, qty,
        |    lag(qty, 1) OVER w AS q1, lag(qty, 2) OVER w AS q2,
        |    lag(qty, 3) OVER w AS q3, lag(qty, 4) OVER w AS q4,
        |    lag(qty, 5) OVER w AS q5, lag(qty, 6) OVER w AS q6,
        |    lag(qty, 7) OVER w AS q7
        |  FROM daily
        |  WINDOW w AS (PARTITION BY nation ORDER BY d))
        |SELECT nation, d, qty,
        |  CAST(1000 * (qty * 128 + COALESCE(q1, 0) * 64 +
        |    COALESCE(q2, 0) * 32 + COALESCE(q3, 0) * 16 +
        |    COALESCE(q4, 0) * 8 + COALESCE(q5, 0) * 4 +
        |    COALESCE(q6, 0) * 2 + COALESCE(q7, 0))
        |  // (128 + CASE WHEN q1 IS NULL THEN 0 ELSE 64 END
        |       + CASE WHEN q2 IS NULL THEN 0 ELSE 32 END
        |       + CASE WHEN q3 IS NULL THEN 0 ELSE 16 END
        |       + CASE WHEN q4 IS NULL THEN 0 ELSE 8 END
        |       + CASE WHEN q5 IS NULL THEN 0 ELSE 4 END
        |       + CASE WHEN q6 IS NULL THEN 0 ELSE 2 END
        |       + CASE WHEN q7 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
        |    AS ewma_x1000
        |FROM lagged ORDER BY nation, d""".stripMargin,
    "q_feat_sessions" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |        OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM m),
        |sess AS (
        |  SELECT user_id, session_idx, COUNT(*) AS n_events,
        |    epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
        |  FROM g GROUP BY user_id, session_idx)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(SUM(n_events) AS BIGINT) AS total_events,
        |  CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
        |  ROUND(CAST(SUM(n_events) AS DOUBLE) / COUNT(*), 4) AS avg_events,
        |  ROUND(CAST(SUM(dur_us) AS DOUBLE) / COUNT(*), 4) AS avg_dur_us
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_sessionize" -> sessionizeOracle,
    // the native-operator twin answers the IDENTICAL business query —
    // one oracle text, two engine paths (window composition vs
    // SessionizeExec), both hash-graded against it
    "q_sessionize_native" -> sessionizeOracle,
    "q_win_streak" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
        |  FROM events),
        |r AS (
        |  SELECT user_id, d,
        |    row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        |  FROM days),
        |st AS (
        |  SELECT user_id, d - CAST(rn AS INTEGER) AS grp, COUNT(*) AS len
        |  FROM r GROUP BY user_id, grp)
        |SELECT user_id, CAST(MAX(len) AS BIGINT) AS max_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_win_time_range" ->
      """SELECT o_orderkey, o_custkey,
        |  COUNT(*) OVER w AS n_7d,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE) AS spend_7d
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS TIMESTAMP)
        |  RANGE BETWEEN INTERVAL '7 days' PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q_win_dist" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  ROUND(percent_rank() OVER w, 4) AS pct_rank,
        |  ROUND(cume_dist() OVER w, 4) AS cdist
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
        |ORDER BY c_custkey""".stripMargin,
    "q_win_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drk
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_ntile_pct" ->
      """SELECT c_nationkey, c_custkey,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  ROUND(percent_rank() OVER w, 4) AS pct
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin,
    "q_win_drawdown" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CAST(value AS DECIMAL(12,4)) AS v
        |  FROM events),
        |c1 AS (
        |  SELECT user_id, ts, event_id, v,
        |    SUM(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM e),
        |c2 AS (
        |  SELECT user_id, v, cum,
        |    MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c1)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(v) AS DOUBLE) AS final_value,
        |  CAST(MAX(peak - cum) AS DOUBLE) AS max_drawdown
        |FROM c2 GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_win_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_moving_avg" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w, 4) AS mavg3
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_win_range_frame" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS epoch_s,
        |  CAST(SUM(CAST(value AS DECIMAL(12,4))) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) // 1000000
        |     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
        |FROM events ORDER BY event_id""".stripMargin,
    "q_win_lead_lag" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP)) -
        |    lag(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER w AS gap_us,
        |  lead(event_type, 1) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY event_id""".stripMargin,
    "q_win_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  last_value(o_orderkey) OVER w AS last_key,
        |  nth_value(o_orderkey, 2) OVER w AS second_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "q_sort_multi" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "q_sort_nulls" ->
      """SELECT o_orderkey, NULLIF(o_orderpriority, '4-NOT SPECIFIED') AS prio_n
        |FROM orders
        |ORDER BY prio_n ASC NULLS LAST, o_orderkey ASC LIMIT 500""".stripMargin,
    "q_sort_keyset" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d,
        |    o_totalprice
        |  FROM orders),
        |cur AS (
        |  SELECT d AS cd, o_orderkey AS ck FROM (
        |    SELECT * FROM o ORDER BY d, o_orderkey LIMIT 150)
        |  ORDER BY d DESC, o_orderkey DESC LIMIT 1)
        |SELECT o_orderkey, o_custkey, d AS o_date,
        |  CAST(CAST(o_totalprice AS DECIMAL(12,4)) AS DOUBLE) AS total
        |FROM o CROSS JOIN cur
        |WHERE d > cd OR (d = cd AND o_orderkey > ck)
        |ORDER BY d, o_orderkey LIMIT 50""".stripMargin
  )
}
