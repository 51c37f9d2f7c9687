package graft.ops

import org.apache.spark.sql.SparkSession

/** Dev probe (r16): phase anatomy of the NSW family — IVF fit/assign,
  * seed graph, each NN-descent round, walk rounds — with per-phase job
  * counts. Package graft.ops so it can reach the private builders'
  * building blocks via the public query entry points + OpCache keys. */
object NswProbe {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobEnd(
            j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          nJobs.incrementAndGet()
      })
    def time(tag: String)(f: => Unit): Unit = {
      org.apache.spark.graft.ListenerFlush.drain(s.sparkContext)
      val j0 = nJobs.get()
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerFlush.drain(s.sparkContext)
      println(f"NSWP $tag%-28s ${dt}%6.2f s  ${nJobs.get() - j0}%4d jobs")
    }
    println("NSWP n_embeddings=" +
      graft.Tables.t(s, dir, "embeddings").count())
    val q = graft.SparkEntry.queries
    // warm codegen end-to-end
    q("q_sim_hnsw_topk")(s, dir).count()
    OpCache.clear(s)
    time("ivf fit+assign") {
      // count() on the cell-assigned corpus forces fit + assignment
      q("q_sim_ivf_topk")(s, dir).count()
    }
    time("nsw build (ivf cached)") {
      // hnsw_topk = build + walk; subtract the walk-only run below
      q("q_sim_hnsw_topk")(s, dir).count()
    }
    time("walk only (all cached)") {
      q("q_sim_hnsw_topk")(s, dir).count()
    }
    OpCache.clear(s)
    time("cold full") { q("q_sim_hnsw_topk")(s, dir).count() }
    s.stop()
  }
}
