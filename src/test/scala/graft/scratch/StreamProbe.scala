package graft.scratch

import org.apache.spark.sql.SparkSession

/** Where do the stream-stream join's ~2.3 s go? Time the graded query
  * under (a) defaults, (b) tmpfs checkpoint dir, (c) fewer shuffle
  * partitions on the cloned session — all on one warmed JVM. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val q = graft.SparkEntry.queries
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm
    q("q_stream_join")(s, dir).count(); graft.ops.OpCache.clear(s)
    time("q_stream_join warm A") {
      q("q_stream_join")(s, dir).count()
    }
    graft.ops.OpCache.clear(s)
    time("q_stream_join warm B") {
      q("q_stream_join")(s, dir).count()
    }
    graft.ops.OpCache.clear(s)
    time("q_stream_tumbling warm") {
      q("q_stream_tumbling")(s, dir).count()
    }
    graft.ops.OpCache.clear(s)
    time("q_stream_dedup warm") {
      q("q_stream_dedup")(s, dir).count()
    }
    s.stop()
  }
}
