package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark for the native codegen expressions vs their
  * composed-builtin equivalents, on synthetic data big enough that
  * per-row CPU dominates plan overhead. Each variant is timed as a
  * full count over the same cached input (MIN of reps — same
  * contention-only-adds-time argument as [[Bench]]); prints one JSON
  * line. This is evidence, not a gate: the composed forms are already
  * codegen'd, so the win is loop fusion / no intermediate array, not
  * interpretation overhead — recorded in BASELINE.md.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timeMin(reps: Int)(f: => Unit): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    // ---- cosine: 2M rows × 64-dim float vectors -------------------
    val vecs = spark.range(0, 2000000L, 1L, cpus.toInt)
      .select($"id",
        transform(sequence(lit(0), lit(63)),
          i => (pmod(hash($"id" * 64 + i), lit(1000)).cast("double")
            / 1000.0d).cast("float")).as("a"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(hash($"id" * 64 + i + 7), lit(1000)).cast("double")
            / 1000.0d).cast("float")).as("b"))
      .persist()
    vecs.count()
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y,
        (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0d), (acc, v) => acc + v)
    val composedCos = timeMin(3)(vecs.select(
      (dot($"a", $"b") / (sqrt(dot($"a", $"a")) * sqrt(dot($"b", $"b"))))
        .as("c")).agg(sum($"c")).collect())
    val nativeCos = timeMin(3)(vecs.select(
      graft.functions.CosineSimF.cosine($"a", $"b").as("c"))
      .agg(sum($"c")).collect())
    vecs.unpersist()

    // ---- sorted intersect count: 1M rows × ~64-element arrays -----
    val arrs = spark.range(0, 1000000L, 1L, cpus.toInt)
      .select($"id",
        sort_array(array_distinct(transform(sequence(lit(0), lit(63)),
          i => pmod(hash($"id" * 64 + i), lit(4096)).cast("long"))))
          .as("a"),
        sort_array(array_distinct(transform(sequence(lit(0), lit(63)),
          i => pmod(hash($"id" * 64 + i + 13), lit(4096)).cast("long"))))
          .as("b"))
      .persist()
    arrs.count()
    val composedIx = timeMin(3)(arrs.select(
      size(array_intersect($"a", $"b")).as("c"))
      .agg(sum($"c")).collect())
    val nativeIx = timeMin(3)(arrs.select(
      graft.functions.SortedIntersectCountF.count($"a", $"b").as("c"))
      .agg(sum($"c")).collect())
    arrs.unpersist()

    def d3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"micro","cosine_composed":${d3(composedCos)},""" +
      s""""cosine_native":${d3(nativeCos)},""" +
      s""""intersect_composed":${d3(composedIx)},""" +
      s""""intersect_native":${d3(nativeIx)}}""")
    spark.stop()
  }
}
