package graft.scratch

import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Per-job wall/desc trace for one query — which driver actions inside
  * a multi-action operator actually cost time. */
object JobTrace {
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
    val name = if (args.isEmpty) "q_sim_hnsw_topk" else args(0)
    graft.Tables.t(s, dir, "embeddings").count()
    val q = graft.SparkEntry.queries
    // warm
    q(name)(s, dir).count(); graft.ops.OpCache.clear(s)
    val jobs = ArrayBuffer[(Int, Long, Long, String)]()
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    val stageTime = scala.collection.concurrent.TrieMap[Int, ArrayBuffer[String]]()
    val stageToJob = scala.collection.concurrent.TrieMap[Int, Int]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val names = j.stageInfos.map(_.name).mkString(" | ")
        starts(j.jobId) = (j.time, names)
        j.stageInfos.foreach(si => stageToJob(si.stageId) = j.jobId)
        stageTime(j.jobId) = ArrayBuffer()
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        stageToJob.get(si.stageId).foreach { jid =>
          stageTime.getOrElseUpdate(jid, ArrayBuffer()) +=
            f"[${si.numTasks}t $dur%.2fs ${si.name.take(60)}]"
        }
      }
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized {
          val (t0j, names) = starts.getOrElse(j.jobId, (j.time, "?"))
          jobs += ((j.jobId, t0j, j.time, names))
        }
    }
    s.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    q(name)(s, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerFlush.drain(s.sparkContext)
    val sorted = jobs.sortBy(_._2)
    println(f"JT total $wall%.2f s, ${sorted.length} jobs")
    val minMs = sys.env.get("SPARK_GRAFT_JT_MIN_MS")
      .flatMap(_.toLongOption).getOrElse(300L)
    sorted.filter(j => j._3 - j._2 >= minMs).foreach { case (id, st, en, nm) =>
      println(f"JT job=$id%4d dur=${(en - st) / 1e3}%8.3fs " +
        stageTime.getOrElse(id, ArrayBuffer()).mkString(" "))
    }
    s.stop()
  }
}
