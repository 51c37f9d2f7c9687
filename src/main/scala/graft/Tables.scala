package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test corpus
  * (`TESTDATA.md`): one parquet file per table under `$sfDir/`.
  *
  * Scale stance: `spark.read.parquet` is the DataSource V2 vectorized
  * reader — predicate pushdown + column pruning reach the scan, so every
  * query that filters/projects only pays for what it touches. At 100 TB
  * the same call reads a partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as a long (legacy flag) and convert to a
      // µs timestamp — lossless: the generator's ns values are µs-aligned
      // (verified: 0 rows with sub-µs precision), and DuckDB's
      // TIMESTAMP_NS→TIMESTAMP cast truncates identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      // integral `div`, NOT `/`: double division loses precision above
      // 2^53 and epoch-ns values are ~1.7e18.
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Per-JVM /tmp sink root for the source/sink round-trip ops. The pid
    * segment isolates concurrently running JVMs (the driver's Verify and
    * Bench overlap in practice): on a shared path two writers can
    * interleave as A.overwrite, B.overwrite, A.append, B.append, leaving
    * one sink with a doubled batch and the other missing one — silently
    * wrong aggregates. Within one JVM the path is stable, so
    * mode("overwrite") still cleans up earlier runs of the same query. */
  def sinkPath(kind: String, sfDir: String, leaf: String): String =
    s"/tmp/graft_${kind}_sink/p${ProcessHandle.current().pid()}/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_") + s"/$leaf"
}
