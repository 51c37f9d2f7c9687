package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY §7.4.9 / the 100-TB stance).
  *
  * AQE's skew-join split handles post-shuffle partition skew, but a
  * single pathological key still lands in one task. Salting fixes that
  * by key-space surgery: the big (skewed) side gets a random salt in
  * [0, S), the small side is exploded S× with every salt value, and the
  * join key becomes (key, salt) — spreading one hot key over S tasks.
  * Result set is provably identical to the plain join (spec-verified).
  */
object SkewJoin {

  /** Inner-join `big ⋈ small` on big(bigKey) == small(smallKey),
    * spreading each big-side key over `salts` partitions. `small` is
    * replicated `salts`× — keep it the dimension side. */
  def salted(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    // fail fast on a column-name collision: withColumn would silently
    // REPLACE a caller's __salt column and drop("__salt") would then
    // strip their data from the result
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "salted(): inputs must not already have a __salt column")
    // deterministic salt: hash of the whole big row modulo S (a random
    // salt would also be correct, but determinism keeps t2-style
    // comparisons possible)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
        saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
