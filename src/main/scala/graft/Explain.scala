package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: print the formatted physical plan (and optionally time)
  * of one or more registered queries.
  * `runMain graft.Explain q_a[,q_b,...] [sfDir]` — multi-query form
  * prints `=== <name> ===` separators so a wrapper can split the
  * output into per-query plan files (the r15 plans/ artifacts). */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // same session pins as Bench/Verify: UTC + ns-as-long events
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"=== $name ===")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      graft.ops.OpCache.clear(spark)
    }
    spark.stop()
  }
}
