package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink formats beyond the test corpus's parquet (SURVEY §0.C1/C9:
  * the reference ingested CSV from blob and served into a warehouse).
  * Schema-preserving round-trips for csv / json / orc / parquet; the t2
  * corpus stays parquet, these are exercised in ScalaTest.
  */
object Formats {

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val r2 = schema.map(r.schema).getOrElse(
      if (format == "csv" || format == "json") r.option("inferSchema", "true")
      else r)
    (if (format == "csv") r2.option("header", "true") else r2).load(path)
  }

  /** Round-trip a DataFrame through a format, reading back with the
    * original schema (csv/json are schema-lossy without it). */
  def roundTrip(df: DataFrame, format: String, path: String): DataFrame = {
    write(df, format, path)
    read(df.sparkSession, format, path, Some(df.schema))
  }
}
