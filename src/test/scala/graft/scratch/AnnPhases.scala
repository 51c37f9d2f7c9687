package graft.scratch

import org.apache.spark.sql.SparkSession

/** Phase split for the HNSW search cost: run ivf-topk (fit+assign),
  * then hnsw-topk warm (adds the NSW build + search), then hnsw-topk
  * again WITHOUT clearing OpCache (search only — index cached). */
object AnnPhases {
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
    graft.Tables.t(s, dir, "embeddings").count()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val q = graft.SparkEntry.queries
    // warm codegen once end-to-end, then clear
    q("q_sim_hnsw_topk")(s, dir).count()
    graft.ops.OpCache.clear(s)
    time("ivf_topk (kmeans fit + assign + search)") {
      q("q_sim_ivf_topk")(s, dir).count()
    }
    time("hnsw_topk warm-ivf (NSW build + beam search)") {
      q("q_sim_hnsw_topk")(s, dir).count()
    }
    time("hnsw_topk cached-graph (beam search only)") {
      q("q_sim_hnsw_topk")(s, dir).count()
    }
    graft.ops.OpCache.clear(s)
    time("hnsw_topk cold (full)") {
      q("q_sim_hnsw_topk")(s, dir).count()
    }
    s.stop()
  }
}
