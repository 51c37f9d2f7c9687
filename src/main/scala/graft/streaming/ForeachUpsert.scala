package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent delta-merge `foreachBatch` sink — the production serving
  * sink that composes [[graft.ops.PipelineOps.snapshotMerge]]'s
  * algebra (counts merge by sum under a full-outer join) with
  * checkpoint restart: exactly-once END TO END, at the external table,
  * not just inside the engine's state store.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once per
  * (batchId, data): after a crash between "sink applied batch k" and
  * "checkpoint committed batch k", restart RE-DELIVERS batch k with the
  * same id and the same rows. The sink must therefore be idempotent in
  * batchId, which this one achieves with a versioned-snapshot layout:
  *
  *   targetDir/v<batchId>/   — the merged table AFTER applying batch k
  *   targetDir/_current      — marker file naming the committed version
  *
  * `apply(k)` with k ≤ marker is a no-op (replay after a fully-committed
  * batch). Otherwise the new snapshot is written to `v<k>` (an
  * overwrite — a crash AFTER the vdir write but BEFORE the marker move
  * leaves the marker on k−1, and the replay simply rewrites `v<k>` from
  * the same base+delta, deterministically identical), then the marker
  * is moved atomically (write-temp + ATOMIC_MOVE on one filesystem).
  * Readers never see a torn state: they resolve the marker, then read
  * the immutable versioned dir it names.
  *
  * At 100 TB the same protocol holds with the marker in a transactional
  * store and the merge as a partitioned-overwrite of only changed
  * partitions — the idempotence argument (versioned snapshot + atomic
  * pointer, replay rewrites the same version) is unchanged; it is the
  * ACID-table commit protocol in miniature.
  */
object ForeachUpsert {
  private def currentVersion(targetDir: String): Option[Long] = {
    val m = Paths.get(targetDir, "_current")
    if (Files.exists(m)) Files.readString(m).trim.toLongOption else None
  }

  /** Committed serving table: (key: string, n: long) — empty before the
    * first commit. */
  def read(s: SparkSession, targetDir: String): DataFrame =
    currentVersion(targetDir) match {
      case Some(v) => s.read.parquet(s"$targetDir/v$v")
      case None =>
        import s.implicits._
        Seq.empty[(String, Long)].toDF("key", "n")
    }

  /** Apply one micro-batch of raw rows: count per key, merge into the
    * committed snapshot, commit the next version. Safe to call again
    * with the same (batchId, rows) — replays are no-ops or exact
    * rewrites (see object doc). `keyCol` names the column of `rows` to
    * count by. */
  def applyBatch(s: SparkSession, targetDir: String, batchId: Long,
      rows: DataFrame, keyCol: String): Unit = {
    if (currentVersion(targetDir).exists(batchId <= _)) return
    import s.implicits._
    val delta = rows.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("d_n"))
    val merged = read(s, targetDir).select($"key", $"n".as("b_n"))
      .join(delta, Seq("key"), "full")
      .select($"key",
        (coalesce($"b_n", lit(0L)) + coalesce($"d_n", lit(0L))).as("n"))
    Files.createDirectories(Paths.get(targetDir))
    merged.write.mode("overwrite").parquet(s"$targetDir/v$batchId")
    val tmp = Paths.get(targetDir, s"_current.tmp$batchId")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, Paths.get(targetDir, "_current"),
      StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
