package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe incremental consumer of a [[VersionedTable]] row-level
  * change feed — the driver-side pump a production deployment runs
  * when the source of truth is the table, not a stream: each
  * [[poll]] serves the feed for the range `(lastServed, head]` to the
  * handler and then ATOMICALLY advances a checkpointed offset file,
  * so across crashes and restarts every commit is delivered to a
  * SUCCESSFUL handler call at least once and never skipped. The
  * end-to-end guarantee is the foreachBatch contract: the handler
  * must be idempotent per `(from, to]` range (it receives both
  * bounds), and then delivery is exactly-once.
  *
  * Scale shape: a poll is O(commits-in-range) manifest reads plus a
  * scan of ONLY the range's delta/sidecar files
  * ([[VersionedTable.readChangeFeed]]'s O(change) property); the
  * offset is one integer in one file, written temp-then-atomic-move,
  * so a crash between handler success and offset advance re-delivers
  * (never loses) — the standard write-ahead-offset recipe.
  */
object ChangeFeedConsumer {

  private def offsetPath(ckpt: String) = Paths.get(ckpt, "offset")

  /** The highest version already served from this checkpoint (0 when
    * the consumer has never completed a poll). */
  def lastServed(ckpt: String): Int = {
    val p = offsetPath(ckpt)
    if (Files.exists(p)) Files.readString(p).trim.toInt else 0
  }

  private def advance(ckpt: String, to: Int): Unit = {
    Files.createDirectories(Paths.get(ckpt))
    val tmp = Paths.get(ckpt,
      s".offset-${ProcessHandle.current().pid()}-${System.nanoTime()}.tmp")
    Files.writeString(tmp, to.toString)
    Files.move(tmp, offsetPath(ckpt),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Serve one poll: if the table head is past the checkpoint, hand
    * the handler the feed frame for `(lastServed, head]` plus both
    * bounds, and advance the offset ONLY after the handler returns.
    * Returns the served range, or None when already caught up. A
    * handler that throws leaves the offset untouched — the next poll
    * re-delivers the same range. */
  def poll(spark: SparkSession, root: String, ckpt: String)(
      f: (DataFrame, Int, Int) => Unit): Option[(Int, Int)] = {
    val from = lastServed(ckpt)
    val to = VersionedTable.currentVersion(root)
    if (to <= from) None
    else {
      f(VersionedTable.readChangeFeed(spark, root, from, to), from, to)
      advance(ckpt, to)
      Some((from, to))
    }
  }

  /** Poll until caught up with the head as of each iteration's start;
    * returns the served ranges (empty when already caught up). */
  def drain(spark: SparkSession, root: String, ckpt: String)(
      f: (DataFrame, Int, Int) => Unit): Seq[(Int, Int)] = {
    val served = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var more = true
    while (more) poll(spark, root, ckpt)(f) match {
      case Some(r) => served += r
      case None => more = false
    }
    served.toSeq
  }
}
