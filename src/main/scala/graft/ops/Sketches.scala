package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.J — sketch aggregates built from first principles as
  * DataFrame ops, DETERMINISTIC and therefore exact-oracle-able (unlike
  * `approx_count_distinct`, whose HLL++ implementation is
  * engine-internal and only ScalaTest-gated).
  *
  * The HLL register build IS the distributed-merge story: registers are
  * `groupBy(bucket).agg(max(rank))` — map-side partial max per
  * partition, one tiny shuffle of (bucket, rank) pairs, associative and
  * commutative merge. At 100 TB the sketch of any column costs one scan
  * plus a 64-row shuffle. The float ESTIMATE is intentionally left out
  * of the graded output (computed-double rounding is the one
  * cross-engine hazard) — accuracy is bounds-checked in ScalaTest; the
  * graded artifact is the exact register table.
  */
object Sketches extends OpModule {

  /** Portable 60-bit hash — single definition in [[graft.Det.md5int60]]. */
  private def md5int(c: Column): Column = graft.Det.md5int60(c)

  private val M = 64 // registers

  /** HLL register table for distinct `user_id` over events: bucket =
    * low 6 hash bits; rank = leading-zero count (+1) of the remaining
    * 54-bit field, computed EXACTLY in both engines via the length of
    * the base-2 string (no float log2 — its floor is off-by-one-prone
    * near powers of two). */
  def sketchHllRegisters(s: SparkSession, dir: String): DataFrame =
    hllOf(Tables.t(s, dir, "events"))

  /** HLL register build over any (user_id) frame — exposed so the
    * merge-law test can sketch disjoint slices and prove
    * registers(A ∪ B) = max(registers(A), registers(B)). */
  private[graft] def hllOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(md5int($"user_id".cast("string")).as("hv"))
      .select(
        ($"hv" % M).as("bucket"),
        // `div`, not `/`: Column `/` on longs is DOUBLE division, which
        // loses bits at 2^60 magnitudes. rest has ≤54 significant bits;
        // bin-length(0) is 1, so an all-zero field gets rank 54 — one
        // BELOW the conventional saturated 55. Self-consistent: the
        // oracle computes the identical 54 and hllEstimate weights
        // registers exactly as built (the 2^-54 vs 2^-55 difference is
        // far below the estimator's error at this width).
        (lit(55) - length(conv(expr("hv div 64").cast("string"), 10, 2)))
          .as("rank"))
      .groupBy($"bucket")
      .agg(max($"rank").cast("int").as("register"))
      .orderBy($"bucket")
  }

  /** Driver-side estimate from the register table: standard HLL
    * harmonic mean with the linear-counting small-range correction
    * (raw HLL is heavily biased when n ≪ m) — used by the accuracy
    * ScalaTest, not by the graded output. */
  def hllEstimate(registers: Seq[Int]): Double = {
    val m = registers.size.toDouble
    val alpha = 0.709 // alpha_64
    val z = registers.map(r => math.pow(2.0, -r)).sum
    val raw = alpha * m * m / z
    val zeros = registers.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }

  /** Universal-hash family shared by the CMS and Bloom sketches:
    * h_k(x) = ((A_k·(md5int(x) mod 2^30) + B_k) mod P) mod width —
    * exact int64 in both engines (A·b ≤ ~1.2e18 < 2^63). */
  private val P = 2147483647L // 2^31 - 1 (prime)
  private val HA = Seq(1103515245L, 1299709L, 104729L, 15485863L)
  private val HB = Seq(12345L, 54321L, 98765L, 424242L)

  private def hbase(c: Column): Column = md5int(c) % 1073741824L // 2^30

  /** hash row/bucket for family member k (a 0-based int column). */
  private def hk(b: Column, k: Column, width: Int): Column =
    ((element_at(array(HA.map(lit): _*), k + 1) * b +
      element_at(array(HB.map(lit): _*), k + 1)) % P) % width

  /** Count-Min sketch of per-user event frequencies: a d=4 × w=64
    * register table of exact counts. The build is the distributed-merge
    * story: one 4×-amplified shuffle of (row, col) pairs with map-side
    * partial counts; registers merge by + (associative, commutative),
    * so sketching 100 TB costs one scan + a 256-row shuffle. Point
    * estimates (min over rows — never an underestimate) are bounds-
    * checked in ScalaTest; the graded artifact is the exact register
    * table, which DuckDB reproduces bit-for-bit. */
  def sketchCms(s: SparkSession, dir: String): DataFrame =
    cmsOf(Tables.t(s, dir, "events"))

  /** CMS register build over any (user_id) frame — exposed so the
    * merge-law test can sketch disjoint slices and prove
    * registers(A ∪ B) = registers(A) + registers(B). */
  private[graft] def cmsOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select(hbase($"user_id".cast("string")).as("b"))
      .select(explode(sequence(lit(0), lit(3))).as("r"), $"b")
      .select($"r".cast("int").as("r"), hk($"b", $"r", 64).as("col"))
      .groupBy($"r", $"col")
      .agg(count(lit(1)).as("n"))
      .orderBy($"r", $"col")
  }

  /** Bloom-filter membership from first principles: k=3 bit positions
    * in an m=8192-bit filter for every distinct high-value order
    * customer (the build side), then every customer probed — flagged
    * `maybe_present` iff all 3 of its positions are set. The bit table
    * (≤8192 rows regardless of corpus size) is broadcast, so probes
    * never shuffle — exactly how a pre-computed Bloom filter prunes a
    * 100-TB scan. Deterministic md5-affine hashing ⇒ exact-oracled;
    * the no-false-negative invariant is asserted in ScalaTest. */
  def sketchBloom(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ks = explode(sequence(lit(0), lit(2)))
    val bits = Tables.t(s, dir, "orders")
      .filter($"o_totalprice" > 480000)
      .select($"o_custkey").distinct()
      .select(hbase($"o_custkey".cast("string")).as("h"))
      .select(ks.as("k"), $"h")
      .select(hk($"h", $"k", 8192).as("pos")).distinct()
    val probes = Tables.t(s, dir, "customer")
      .select($"c_custkey", hbase($"c_custkey".cast("string")).as("h"))
      .select($"c_custkey", ks.as("k"), $"h")
      .select($"c_custkey", hk($"h", $"k", 8192).as("pos"))
    probes.join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
      .groupBy($"c_custkey")
      .agg((sum(coalesce($"hit", lit(0))) === 3).as("maybe_present"))
      .select($"c_custkey".as("custkey"), $"maybe_present")
      .orderBy($"custkey")
  }

  /** Quantile sketch from equi-width histogram registers — the
    * deterministic, exactly-oracle-able stand-in for t-digest:
    * per-bin counts (mergeable by +, like CMS) plus quartile estimates
    * read off the cumulative register table (min bin whose cumulative
    * count reaches k·N/4, in pure integer arithmetic). Error is
    * bounded by the bin width by construction. One scan + a ~100-row
    * register shuffle at any corpus size; the cumulative window runs
    * over the registers, never the rows. */
  def sketchQuantile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val bins = Tables.t(s, dir, "lineitem")
      .select(floor($"l_extendedprice" / 1000).cast("long").as("bin"))
      .groupBy($"bin").agg(count(lit(1)).as("n"))
    // global window over ~100 register rows — trivially single-task
    val cum = bins
      .withColumn("cum", sum($"n").over(Window.orderBy($"bin")))
      .crossJoin(broadcast(bins.agg(sum($"n").as("total"))))
    cum.crossJoin(broadcast(
        s.range(1, 4).select($"id".cast("int").as("k"))))
      .filter($"cum" * 4 >= $"k" * $"total")
      .groupBy($"k")
      .agg((min($"bin") * 1000).cast("long").as("est_lo"))
      .select(
        when($"k" === 1, "p25").when($"k" === 2, "p50").otherwise("p75")
          .as("quartile"),
        $"est_lo")
      .orderBy($"quartile")
  }

  /** KMV (k-minimum-values / theta) sketch registers: per set the K=32
    * smallest distinct 60-bit user hashes. This is the sketch family
    * that answers what HLL cannot — SET-EXPRESSION cardinalities
    * (intersection, difference) via the theta trick: clip both sketches
    * to θ = min(θ_A, θ_B) and count surviving common hashes. The
    * register build is scale-honest: distinct() shuffles (set, hash)
    * once, and the rank-≤-K filter compiles to WindowGroupLimit
    * (pinned), so each map partition forwards at most K candidate rows
    * into the per-set window — a 100-TB corpus shuffles O(K ×
    * partitions), never the full distinct set, into the final sort.
    * Registers merge by union-then-smallest-K (associative,
    * commutative — law in ScalaTest); intersection accuracy is
    * bounds-checked in ScalaTest, and the graded artifact is the exact
    * integer register table. */
  def sketchKmv(s: SparkSession, dir: String): DataFrame =
    kmvOf(Tables.t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "error")))

  /** KMV register build over any (event_type, user_id) frame — exposed
    * so the merge-law test can sketch disjoint slices and prove
    * registers(A ∪ B) = smallestK(registers(A) ∪ registers(B)). */
  private[graft] val KmvK = 32
  private[graft] def kmvOf(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val hashed = events
      .select($"event_type".as("set_id"),
        md5int($"user_id".cast("string")).as("hv"))
      .distinct()
    val w = Window.partitionBy($"set_id").orderBy($"hv")
    hashed.withColumn("rnk", row_number().over(w))
      .filter($"rnk" <= KmvK)
      .select($"set_id", $"rnk", $"hv")
      .orderBy($"set_id", $"rnk")
  }

  /** Driver-side KMV estimators (ScalaTest-only, like [[hllEstimate]]):
    * distinct count from the K-th minimum of a 60-bit-uniform hash,
    * and the theta-sketch intersection estimate. `hvs` must be a full
    * register set (K values) for the (K-1)/x_K estimator to apply;
    * fewer registers means the set was exhausted and the count is
    * exact. */
  def kmvEstimate(hvs: Seq[Long]): Double =
    if (hvs.size < KmvK) hvs.size.toDouble
    else (KmvK - 1).toDouble * math.pow(2.0, 60) / hvs.max.toDouble

  /** θ-intersection: clip both register sets at θ = min of the two
    * K-th minima (each sketch is a uniform sample of its set below its
    * own θ), count common survivors, scale by the inclusion
    * probability θ/2^60. */
  def kmvIntersect(a: Seq[Long], b: Seq[Long]): Double = {
    val theta = math.min(a.max, b.max).toDouble
    val common = a.toSet.intersect(b.toSet).count(_ <= theta)
    common / (theta / math.pow(2.0, 60))
  }

  /** KMV set ALGEBRA over the purchase/error audience registers — the
    * sketch merge a 100-TB overlap pipeline actually runs: the union
    * register is the smallest-K of the two registers' hash union (the
    * mergeability law, here as a graded artifact instead of only a
    * ScalaTest witness), and each merged hash carries membership flags
    * against both source registers — the θ-intersection witness set
    * that [[kmvIntersect]] scales into an overlap estimate.
    *
    * Exact integers end-to-end, so fully oracled; the float
    * estimators stay driver-side ([[kmvEstimate]]/[[kmvIntersect]],
    * bounds-checked in ScalaTest) per the module policy above.
    *
    * Scale shape: both inputs are O(K)-row artifacts, the merge is a
    * K-row sort + two broadcast membership probes — audience overlap
    * over any number of segments costs O(K · segments), independent
    * of corpus size. That independence is the whole point of carrying
    * sketch registers instead of raw audiences. */
  def sketchKmvSetops(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val reg = kmvOf(Tables.t(s, dir, "events")
      .filter(col("event_type").isin("purchase", "error")))
    val pa = reg.filter($"set_id" === "purchase").select($"hv".as("ph"))
    val eb = reg.filter($"set_id" === "error").select($"hv".as("eh"))
    val merged = reg.select($"hv").distinct().orderBy($"hv").limit(KmvK)
    merged
      .join(broadcast(pa), $"hv" === $"ph", "left")
      .join(broadcast(eb), $"hv" === $"eh", "left")
      .select($"hv",
        when($"ph".isNotNull, 1).otherwise(0).as("in_purchase"),
        when($"eh".isNotNull, 1).otherwise(0).as("in_error"))
      .orderBy($"hv")
  }

  val queries: Map[String, Q] = Map(
    "q_sketch_hll" -> (sketchHllRegisters _),
    "q_sketch_cms" -> (sketchCms _),
    "q_sketch_bloom" -> (sketchBloom _),
    "q_sketch_quantile" -> (sketchQuantile _),
    "q_sketch_kmv" -> (sketchKmv _),
    "q_sketch_kmv_setops" -> (sketchKmvSetops _)
  )

  val oracle: Map[String, String] = Map(
    "q_sketch_kmv" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type AS set_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |r AS (
        |  SELECT set_id, hv,
        |    row_number() OVER (PARTITION BY set_id ORDER BY hv) AS rnk
        |  FROM h)
        |SELECT set_id, CAST(rnk AS INTEGER) AS rnk, hv
        |FROM r WHERE rnk <= 32 ORDER BY set_id, rnk""".stripMargin,
    "q_sketch_kmv_setops" ->
      """WITH h AS (
        |  SELECT DISTINCT event_type AS set_id,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events WHERE event_type IN ('purchase', 'error')),
        |r AS (
        |  SELECT set_id, hv,
        |    row_number() OVER (PARTITION BY set_id ORDER BY hv) AS rnk
        |  FROM h),
        |reg AS (SELECT set_id, hv FROM r WHERE rnk <= 32),
        |m AS (SELECT DISTINCT hv FROM reg ORDER BY hv LIMIT 32)
        |SELECT m.hv,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM reg
        |      WHERE set_id = 'purchase' AND reg.hv = m.hv)
        |    THEN 1 ELSE 0 END AS INTEGER) AS in_purchase,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM reg
        |      WHERE set_id = 'error' AND reg.hv = m.hv)
        |    THEN 1 ELSE 0 END AS INTEGER) AS in_error
        |FROM m ORDER BY hv""".stripMargin,
    "q_sketch_hll" ->
      """WITH h AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events)
        |SELECT hv % 64 AS bucket,
        |  CAST(MAX(55 - length(bin(hv // 64))) AS INTEGER) AS register
        |FROM h GROUP BY hv % 64 ORDER BY bucket""".stripMargin,
    "q_sketch_quantile" ->
      """WITH b AS (
        |  SELECT CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin,
        |    COUNT(*) AS n
        |  FROM lineitem GROUP BY bin),
        |c AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum FROM b),
        |t AS (SELECT SUM(n) AS total FROM b),
        |ks AS (SELECT UNNEST([1, 2, 3]) AS k)
        |SELECT CASE k WHEN 1 THEN 'p25' WHEN 2 THEN 'p50' ELSE 'p75' END
        |    AS quartile,
        |  CAST(MIN(bin) * 1000 AS BIGINT) AS est_lo
        |FROM c CROSS JOIN t CROSS JOIN ks
        |WHERE cum * 4 >= k * total
        |GROUP BY k ORDER BY quartile""".stripMargin,
    "q_sketch_cms" ->
      """WITH h AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |    % 1073741824 AS b
        |  FROM events),
        |amp AS (
        |  SELECT CAST(k AS INTEGER) AS r,
        |    (([1103515245, 1299709, 104729, 15485863][k + 1] * b +
        |      [12345, 54321, 98765, 424242][k + 1]) % 2147483647) % 64 AS col
        |  FROM h CROSS JOIN (SELECT UNNEST(range(4)) AS k) ks)
        |SELECT r, col, CAST(COUNT(*) AS BIGINT) AS n
        |FROM amp GROUP BY r, col ORDER BY r, col""".stripMargin,
    "q_sketch_bloom" ->
      """WITH members AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 480000),
        |mh AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
        |    % 1073741824 AS h
        |  FROM members),
        |bits AS (
        |  SELECT DISTINCT
        |    (([1103515245, 1299709, 104729][k + 1] * h +
        |      [12345, 54321, 98765][k + 1]) % 2147483647) % 8192 AS pos
        |  FROM mh CROSS JOIN (SELECT UNNEST(range(3)) AS k) ks),
        |probes AS (
        |  SELECT c_custkey,
        |    (([1103515245, 1299709, 104729][k + 1] *
        |      (CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15)) AS BIGINT)
        |        % 1073741824) +
        |      [12345, 54321, 98765][k + 1]) % 2147483647) % 8192 AS pos
        |  FROM customer CROSS JOIN (SELECT UNNEST(range(3)) AS k) ks)
        |SELECT p.c_custkey AS custkey, COUNT(b.pos) = 3 AS maybe_present
        |FROM probes p LEFT JOIN bits b ON p.pos = b.pos
        |GROUP BY p.c_custkey ORDER BY custkey""".stripMargin
  )
}
