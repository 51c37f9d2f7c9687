package graft.scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Anatomy of a VersionedTable.commit at bench scale: where do the
  * ~0.4 s per commit go — the data write, the stats read-back pass, or
  * manifest/OCC bookkeeping? */
object CommitProbe {
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
    import s.implicits._
    val dir = "/root/testdata/sf0.1"
    val o = graft.Tables.t(s, dir, "orders")
      .select($"o_orderkey", $"o_totalprice", year($"o_orderdate").as("o_year"))
    o.count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"CPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val mx = o.agg(max($"o_orderkey")).head.getLong(0)
    val q1 = mx / 4
    // warm the write path once
    val w0 = "/tmp/graft_probe_vt/warm"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(w0))
    graft.sources.VersionedTable.commit(o.filter($"o_orderkey" <= q1), w0,
      statsCol = Some("o_orderkey"))
    (1 to 3).foreach { i =>
      val root = s"/tmp/graft_probe_vt/t$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      time(s"commit q1 slice (stats) #$i") {
        graft.sources.VersionedTable.commit(o.filter($"o_orderkey" <= q1),
          root, statsCol = Some("o_orderkey"))
      }
      time(s"commit q1 slice (no stats) #$i") {
        graft.sources.VersionedTable.commit(
          o.filter($"o_orderkey" > q1 && $"o_orderkey" <= 2 * q1), root)
      }
      time(s"plain parquet write #$i") {
        o.filter($"o_orderkey" <= q1).write.mode("overwrite")
          .parquet(s"/tmp/graft_probe_vt/plain$i")
      }
    }
    s.stop()
  }
}
