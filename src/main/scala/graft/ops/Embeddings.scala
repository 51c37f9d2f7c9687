package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY.md §2.J — label-centroid operators over the embedding corpus,
  * built on the exact int8 grid from q_emb_quantize (`⌊127x+0.5⌋` on a
  * float is exact dyadic double arithmetic — zero cross-engine rounding
  * ambiguity), so both the centroid build and the nearest-centroid
  * classifier are pure int64 arithmetic and fully DuckDB-oracled.
  *
  * Scale shape: posexplode → groupBy(label, dim) is one shuffle of
  * (label, dim, code) triples with map-side partial sums — the same
  * linear plan at 100 TB. Classification joins the probe dims against
  * the 640-row centroid table (broadcast), so probes never shuffle.
  */
object Embeddings extends OpModule {

  /** Exploded quantized codes: (vec_id, label, dim, q). */
  private def codes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.t(s, dir, "embeddings")
      .select($"vec_id", $"label",
        posexplode(transform($"embedding",
          x => floor(x.cast("double") * 127d + 0.5d).cast("long")))
          .as(Seq("dim", "q")))
  }

  /** Per-label class centroids in the quantized domain: for every
    * (label, dimension), the exact integer code sum and member count.
    * `code_sum / n` IS the centroid coordinate; the division is left to
    * the consumer so the graded artifact stays integer-exact. */
  def embCentroids(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    codes(s, dir)
      .groupBy($"label", $"dim")
      .agg(sum($"q").cast("long").as("code_sum"),
        count(lit(1)).as("n"))
      .orderBy($"label", $"dim")
  }

  /** Nearest-centroid classification of 10 probe vectors: per probe,
    * the label whose MEAN centroid maximizes the dot product with the
    * probe's quantized codes. score_scaled = (Σ_dim q_p·code_sum) ·
    * 10^6 div n — the integer-scaled image of dot(probe, centroid_mean)
    * (div by the label's member count n deferred and scaled to stay in
    * exact int64; ≤ ~5·10^15, well under 2^63). Ties break on label. */
  def simCentroidAssign(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = embCentroids(s, dir)
      .select($"label", $"dim", $"code_sum", $"n")
    val probes = codes(s, dir)
      .filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"dim", $"q".as("pq"))
    val scored = probes.join(broadcast(cents), Seq("dim"))
      .groupBy($"probe_id", $"label")
      // n is constant per label on THIS corpus (fixed-length vectors);
      // min(), not first(), keeps the divisor deterministic even if a
      // variable-length vector ever makes n vary across dims
      .agg((sum($"pq" * $"code_sum") * 1000000L).as("dotsum"),
        min($"n").as("n"))
      .select($"probe_id", $"label",
        expr("dotsum div n").as("score_scaled"))
    val w = Window.partitionBy($"probe_id")
      .orderBy($"score_scaled".desc, $"label".asc)
    scored.withColumn("rk", row_number().over(w))
      .filter($"rk" === 1)
      .select($"probe_id", $"label".as("best_label"), $"score_scaled")
      .orderBy($"probe_id")
  }

  val queries: Map[String, Q] = Map(
    "q_emb_centroids" -> (embCentroids _),
    "q_sim_centroid_assign" -> (simCentroidAssign _)
  )

  val oracle: Map[String, String] = Map(
    "q_emb_centroids" ->
      """WITH codes AS (
        |  SELECT label,
        |    CAST(UNNEST(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 127 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings)
        |SELECT label, dim, CAST(SUM(q) AS BIGINT) AS code_sum,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM codes GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "q_sim_centroid_assign" ->
      """WITH codes AS (
        |  SELECT vec_id, label,
        |    CAST(UNNEST(range(len(embedding))) AS INTEGER) AS dim,
        |    CAST(floor(CAST(UNNEST(embedding) AS DOUBLE) * 127 + 0.5)
        |      AS BIGINT) AS q
        |  FROM embeddings),
        |cents AS (
        |  SELECT label, dim, SUM(q) AS code_sum, COUNT(*) AS n
        |  FROM codes GROUP BY label, dim),
        |scored AS (
        |  SELECT p.vec_id AS probe_id, c.label,
        |    CAST((SUM(p.q * c.code_sum) * 1000000) // MIN(c.n) AS BIGINT)
        |      AS score_scaled
        |  FROM codes p JOIN cents c USING (dim)
        |  WHERE p.vec_id < 10
        |  GROUP BY p.vec_id, c.label),
        |ranked AS (
        |  SELECT probe_id, label, score_scaled,
        |    row_number() OVER (PARTITION BY probe_id
        |      ORDER BY score_scaled DESC, label ASC) AS rk
        |  FROM scored)
        |SELECT probe_id, CAST(label AS INTEGER) AS best_label, score_scaled
        |FROM ranked WHERE rk = 1 ORDER BY probe_id""".stripMargin
  )
}
