package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: geometric mean via sum-of-logs, exp(Σln(x)/n).
  * Buffer is (Σln, n) — associative + commutative, so Spark can combine
  * partial aggregates map-side; the shuffle carries 16 bytes per group.
  *
  * Known exposure (shared with every double aggregate incl. built-in
  * `corr`/window `stddev_samp`): double addition is non-associative, so
  * partial-merge order can move the sum by ~1 ulp; a group landing
  * within 1 ulp of a 0.00005 rounding boundary could then flip its 4-dp
  * output between runs. Mitigations in place: outputs are 4-dp rounded
  * (ulp noise ≪ boundary width for these magnitudes) and full-run
  * determinism is re-verified every round (BASELINE.md: two Verify runs
  * value-identical). The exact-decimal path (Det) is used wherever the
  * summed domain allows it; logs are inherently irrational, so this
  * aggregate accepts the documented residual risk instead of silently
  * pretending exactness.
  */
object GeoMean extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(b: (Double, Long)): Double =
    if (b._2 == 0L) Double.NaN else math.exp(b._1 / b._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
