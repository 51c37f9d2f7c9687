package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine determinism helpers (SURVEY.md §2.0 rules).
  *
  * The t2 gate hash-matches our parquet output against DuckDB byte-for-byte,
  * so every floating aggregate must be order-insensitive and produce the
  * identical IEEE double on both engines. Strategy:
  *
  *   - Sum money/quantity through DECIMAL (exact, commutative addition),
  *     then cast the final exact decimal to DOUBLE (correctly-rounded on
  *     both engines, hence bit-identical).
  *   - Keep decimal precisions SMALL so products never hit the 38-digit cap
  *     (Spark reduces scale with rounding at the cap; DuckDB keeps exact —
  *     a silent divergence). d12,4 × d7,4-ish products stay exact.
  *   - Averages = exact decimal sum cast to double, divided by count in
  *     double (single correctly-rounded IEEE op), ROUND(.,4).
  *
  * These helpers are also the 100-TB answer: decimal partial aggregation is
  * map-side combinable, so the shuffle carries one 16-byte accumulator per
  * group per partition, not raw rows.
  */
object Det {
  /** money / quantity magnitudes: |x| < 10^8, 4 dp. */
  val D12: DecimalType = DecimalType(12, 4)
  /** rates (discount, tax): |x| < 100, 4 dp. */
  val D6: DecimalType = DecimalType(6, 4)

  def d12(c: Column): Column = c.cast(D12)
  def d6(c: Column): Column = c.cast(D6)

  /** Exact decimal sum, surfaced as double. Mirror in DuckDB:
    * `CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE)` */
  def sumMoney(c: Column): Column = sum(d12(c)).cast("double")

  /** Decimal→double is only bit-identical across engines while the
    * UNSCALED value fits in 2^53 (DuckDB computes `(double)unscaled /
    * 10^scale` — two roundings — where Spark rounds once). High-scale
    * product sums must therefore be re-scaled to 4 dp before the double
    * cast. ROUND, not CAST: DuckDB's decimal scale-down cast TRUNCATES,
    * while ROUND(dec, 4) is HALF_UP on both engines (verified locally).
    * Mirror in DuckDB: `CAST(ROUND(SUM(...), 4) AS DOUBLE)` */
  def dbl4(sumExpr: Column): Column =
    round(sumExpr, 4).cast("double")

  /** Order-insensitive 4-dp average. Mirror in DuckDB:
    * `ROUND(CAST(SUM(CAST(x AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 4)` */
  def avg4(c: Column): Column =
    round(sumMoney(c) / count(lit(1)), 4)

  /** 4-dp rounding for stat outputs (both dialects: ROUND(x, 4)). */
  def r4(c: Column): Column = round(c, 4)

  /** THE cross-engine hash primitive (splits, witnesses, sketches,
    * minhash): a portable 60-bit integer from the first 15 hex chars of
    * md5. DuckDB mirror: `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)`.
    * One definition — the op modules delegate here so the contract
    * can't drift per module.
    *
    * Implementation: the fused native [[graft.functions.Md5Int60F]]
    * (one digest over the raw bytes, no intermediate hex string) —
    * bit-identical to the composed `conv(substring(md5(x),1,15),16,10)`
    * chain, proven by [[md5int60Chain]]-vs-native randomized spec and
    * by the full oracle gate. */
  def md5int60(c: Column): Column =
    graft.functions.Md5Int60F.md5int60(c)

  /** The original composed form — retained as the equivalence-test
    * reference for the native expression (and as the executable
    * documentation of the DuckDB mirror). */
  def md5int60Chain(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}
