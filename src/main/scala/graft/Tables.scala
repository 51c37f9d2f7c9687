package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
