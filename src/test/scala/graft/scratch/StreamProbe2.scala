package graft.scratch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stream-stream join cost anatomy: batch count, per-variant timing —
  * default /tmp checkpoint vs tmpfs checkpoint vs fewer partitions. */
object StreamProbe2 {
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
    def events(ss: SparkSession): DataFrame = {
      val raw = ss.read.parquet(s"$dir/events.parquet")
      val stage = "/tmp/graft_stream_src/_root_testdata_sf0.1"
      val st = ss.readStream.schema(raw.schema).parquet(stage)
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          st.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          st.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => st
      }
    }
    var n = 0
    def joinOnce(parts: String, ckpt: Option[String]): Unit = {
      n += 1
      val ss = s.newSession()
      ss.conf.set("spark.sql.shuffle.partitions", parts)
      val purchases = events(ss).filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val clicks = events(ss).filter(col("event_type") === "click")
        .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val j = purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
      val w0 = j.writeStream.format("memory").queryName(s"probe_$n")
        .outputMode("append").trigger(Trigger.AvailableNow())
      val w = ckpt.fold(w0)(c => w0.option("checkpointLocation",
        s"$c/probe_$n"))
      val t0 = System.nanoTime()
      val q = w.start()
      q.awaitTermination()
      val batches = q.recentProgress.length
      println(f"SPROBE2 parts=$parts ckpt=${ckpt.getOrElse("tmpdefault")} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s batches=$batches " +
        f"rows=${ss.sql(s"select count(*) from probe_$n").first.getLong(0)}")
      ss.catalog.dropTempView(s"probe_$n")
    }
    joinOnce("8", None) // warm codegen
    joinOnce("8", None)
    joinOnce("8", None)
    joinOnce("8", Some("/dev/shm/graft_ckpt"))
    joinOnce("8", Some("/dev/shm/graft_ckpt"))
    joinOnce("2", None)
    joinOnce("2", None)
    joinOnce("32", None)
    s.stop()
  }
}
