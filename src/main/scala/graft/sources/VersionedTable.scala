package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal manifest-based versioned table (the lakehouse snapshot
  * mechanism, from first principles): every commit writes its data to
  * an immutable per-version directory and then publishes a JSON
  * manifest listing the COMPLETE file set of the new version (parent
  * files + new files), each entry optionally carrying per-file min/max
  * stats of a declared column. Readers resolve a manifest and read
  * exactly its files — so reads are snapshot-isolated against
  * concurrent commits, time travel is "pick an older manifest",
  * rollback is "commit the old file list again", and a range-predicate
  * read FILE-SKIPS on the manifest stats before Spark ever lists a
  * path. Publication is atomic-rename, the same trick every table
  * format and Spark's own checkpointing rely on: a manifest is either
  * fully visible or absent, never torn.
  *
  * Scale shape: the manifest holds file PATHS + two numbers each
  * (O(files), not O(rows)); a read plans one parquet scan over the
  * resolved (possibly stats-pruned) list, so all row-group
  * pushdown/pruning applies unchanged on top. Commit cost is the data
  * write, one O(new files) stats pass, and one tiny driver-side JSON
  * rename — no table-wide rewrite, no lock. Deliberately omitted vs
  * the real formats: compaction rewrites (`q_sink_compact` covers the
  * mechanism separately) and multi-writer conflict detection
  * (single-writer per table path here).
  */
object VersionedTable {

  /** One manifest entry: an immutable data file + optional min/max of
    * the table's declared stats column (absent when the commit didn't
    * compute stats — a pruned read must then keep the file). */
  case class FileEntry(path: String, lo: Option[Double], hi: Option[Double])

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")

  private def manifestPath(root: String, v: Int): Path =
    manifestDir(root).resolve(f"v$v%05d.json")

  /** Largest published version, 0 when the table doesn't exist yet. */
  def currentVersion(root: String): Int = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) 0
    else {
      val st = Files.list(d)
      try st.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d{5}\\.json") =>
          s.substring(1, 6).toInt }
        .foldLeft(0)(math.max)
      finally st.close()
    }
  }

  private def readManifest(root: String, v: Int): Seq[FileEntry] = {
    val p = manifestPath(root, v)
    require(Files.exists(p), s"version $v not found under $root")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Files.readString(p))
    node.get("files").elements().asScala.map { f =>
      def num(k: String): Option[Double] =
        Option(f.get(k)).filterNot(_.isNull).map(_.asDouble())
      FileEntry(f.get("path").asText(), num("lo"), num("hi"))
    }.toSeq
  }

  private def publish(root: String, v: Int, parent: Int,
      files: Seq[FileEntry], rollbackOf: Option[Int],
      batchId: Option[Long] = None): Unit = {
    Files.createDirectories(manifestDir(root))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = om.createObjectNode()
    body.put("version", v)
    body.put("parent", parent)
    rollbackOf.foreach(body.put("rollbackOf", _))
    batchId.foreach(body.put("batchId", _))
    val arr = body.putArray("files")
    files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path)
      f.lo.foreach(o.put("lo", _))
      f.hi.foreach(o.put("hi", _))
    }
    // atomic publish: write a temp file in the same directory, then
    // rename — a manifest can never be observed half-written
    val tmp = manifestDir(root).resolve(f".v$v%05d.json.tmp")
    Files.writeString(tmp, om.writeValueAsString(body))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
  }

  /** Idempotent streaming-batch commit (the foreachBatch → table-sink
    * contract): `batchId` is recorded in the manifest, and a commit
    * whose batchId is ALREADY the latest manifest's is a no-op — so a
    * micro-batch retried after a sink-side failure cannot double-
    * append, which is exactly the exactly-once recipe every streaming
    * table sink documents. Returns the (possibly pre-existing)
    * version id. */
  def commitBatch(df: DataFrame, root: String, batchId: Long,
      statsCol: Option[String] = None): Int = {
    val cur = currentVersion(root)
    if (cur > 0) {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readTree(Files.readString(manifestPath(root, cur)))
      if (Option(node.get("batchId")).exists(_.asLong() == batchId))
        return cur // retry of an already-committed batch
    }
    commit(df, root, statsCol, Some(batchId))
  }

  /** Append `df` as a new version; returns the published version id.
    * With `statsCol` set, one O(new files) read-back pass records each
    * new file's min/max of that column in the manifest (numeric or
    * date/timestamp — stored as doubles), enabling [[readPruned]]. */
  def commit(df: DataFrame, root: String,
      statsCol: Option[String] = None,
      batchId: Option[Long] = None): Int =
    commitImpl(df, root, statsCol, batchId, replace = false)

  private def commitImpl(df: DataFrame, root: String,
      statsCol: Option[String], batchId: Option[Long],
      replace: Boolean): Int = {
    val parent = currentVersion(root)
    val v = parent + 1
    val dataDir = Paths.get(root, "data", f"v$v%05d")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newPaths = {
      val st = Files.list(dataDir)
      try st.iterator().asScala
        .map(_.toString)
        .filter(f => f.endsWith(".parquet") &&
          Paths.get(f).getFileName.toString.startsWith("part-"))
        .toSeq.sorted
      finally st.close()
    }
    val spark = df.sparkSession
    val newFiles = statsCol match {
      case Some(c) =>
        import org.apache.spark.sql.functions._
        val stats = spark.read.parquet(newPaths: _*)
          .groupBy(col("_metadata.file_path").as("__f"))
          .agg(min(col(c).cast("double")).as("__lo"),
            max(col(c).cast("double")).as("__hi"))
          .collect()
          .map { r =>
            // _metadata.file_path renders with a scheme (file:/… or
            // file:///…) — normalize to the plain filesystem path the
            // directory listing produced
            val raw = r.getString(0)
            val p = if (raw.startsWith("file:"))
              new java.net.URI(raw).getPath else raw
            p -> (Option(r.get(1)).map(_.asInstanceOf[Double]),
              Option(r.get(2)).map(_.asInstanceOf[Double]))
          }
          .toMap
        // a path absent from the stats pass has ZERO rows (every
        // non-empty file produces exactly one group) — drop it from
        // the manifest: an empty file carries no data and would
        // otherwise be conservatively un-prunable forever
        newPaths.flatMap { p =>
          stats.get(p).map { case (lo, hi) => FileEntry(p, lo, hi) }
        }
      case None => newPaths.map(FileEntry(_, None, None))
    }
    val files =
      (if (parent > 0 && !replace) readManifest(root, parent) else Nil) ++
        newFiles
    publish(root, v, parent, files, None, batchId)
    v
  }

  /** Number of data files in a version's manifest. */
  def fileCount(root: String, version: Int): Int =
    readManifest(root, version).size

  /** OPTIMIZE/compaction as a REWRITE commit: the current snapshot is
    * re-written into `numFiles` compacted files and published as a new
    * version whose manifest REPLACES (not appends) the parent's file
    * list. The old files are untouched, so time travel to every
    * pre-optimize version keeps working; readers resolving manifests
    * mid-optimize see either the old or the new snapshot, never a
    * mix. The smalls-files problem is the #1 operational tax of
    * streaming ingest at scale — this is its table-native cure. */
  def optimize(spark: SparkSession, root: String, numFiles: Int = 1,
      statsCol: Option[String] = None): Int =
    commitImpl(read(spark, root).repartition(numFiles), root, statsCol,
      None, replace = true)

  /** MERGE (upsert) as a copy-on-write REWRITE commit: rows of the
    * current snapshot whose key matches an `updates` row are replaced,
    * unmatched update rows are inserted, everything else is carried
    * over — then the merged frame is published as a replace-commit.
    * Column sets must match. This is the whole-table COW form (the
    * honest baseline); the file-level refinement real formats add —
    * rewrite only files whose key range intersects the updates — drops
    * straight out of the manifest stats this layer already records,
    * and either way history stays intact: time travel to pre-merge
    * versions keeps working. Returns the new version id. */
  def merge(spark: SparkSession, root: String, updates: DataFrame,
      keyCol: String, numFiles: Int = 1,
      statsCol: Option[String] = None): Int = {
    import org.apache.spark.sql.functions.col
    val current = read(spark, root)
    val merged = current
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
      .unionByName(updates)
    commitImpl(merged.repartition(numFiles), root, statsCol, None,
      replace = true)
  }

  /** VACUUM: delete data files referenced by NO manifest among the
    * `keepLast` most recent versions, then delete the dropped
    * manifests themselves — the GC that reclaims what rewrite commits
    * (optimize/merge/rollback) leave behind. Time travel contracts to
    * the kept window; reads of kept versions are untouched. Returns
    * the number of data files deleted. O(manifests + files) driver
    * work, no data reads. */
  def vacuum(root: String, keepLast: Int): Int = {
    val cur = currentVersion(root)
    val keepFrom = math.max(1, cur - keepLast + 1)
    val keep = (keepFrom to cur)
      .flatMap(v => readManifest(root, v).map(_.path)).toSet
    val dropped = (1 until keepFrom)
      .flatMap(v => readManifest(root, v).map(_.path)).toSet -- keep
    dropped.foreach(p => Files.deleteIfExists(Paths.get(p)))
    (1 until keepFrom).foreach(v =>
      Files.deleteIfExists(manifestPath(root, v)))
    dropped.size
  }

  /** Snapshot read of `version` (default: latest). `mergeSchema=true`
    * unions the per-file parquet schemas (additive evolution: files
    * written before a column existed surface NULL for it) — the
    * footer union is O(files) at plan time, no data rewrite ever. */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None,
      mergeSchema: Boolean = false): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(readManifest(root, v).map(_.path): _*)
  }

  /** Stats-pruned snapshot read for `statsCol ∈ [lo, hi]`: files whose
    * manifest range provably misses the query range are never handed
    * to Spark at all — pruning is O(manifest) driver work, and the
    * surviving files still get row-group pushdown on top. Files
    * without stats are conservatively kept. Returns the pruned frame
    * and the (scanned, total) file counts so callers can assert the
    * skip actually happened. */
  def readPruned(spark: SparkSession, root: String, lo: Double, hi: Double,
      version: Option[Int] = None): (DataFrame, Int, Int) = {
    val v = version.getOrElse(currentVersion(root))
    val all = readManifest(root, v)
    val keep = all.filter { f =>
      (f.lo, f.hi) match {
        case (Some(flo), Some(fhi)) => fhi >= lo && flo <= hi
        case _ => true
      }
    }
    val df =
      if (keep.isEmpty) read(spark, root, Some(v)).limit(0)
      else spark.read.parquet(keep.map(_.path): _*)
    (df, keep.size, all.size)
  }

  /** ROLLBACK as a forward commit: publish a NEW version whose file
    * list is exactly `toVersion`'s — nothing is deleted (later
    * snapshots stay readable, the data dirs are immutable), history
    * stays linear, and the operation is O(manifest) regardless of
    * table size. Returns the published version id. */
  def rollback(root: String, toVersion: Int): Int = {
    val parent = currentVersion(root)
    val v = parent + 1
    publish(root, v, parent, readManifest(root, toVersion), Some(toVersion))
    v
  }

  /** Incremental (CDC-style) read: the rows ADDED between two
    * versions — exactly the files in `toVersion`'s manifest that are
    * absent from `fromVersion`'s. O(manifest) planning; the scan
    * reads only the delta files, never the base — the property that
    * makes incremental downstream jobs O(change) at 100 TB. */
  def readChanges(spark: SparkSession, root: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    // version 0 is the empty table — "changes since the beginning"
    val base =
      if (fromVersion == 0) Set.empty[String]
      else readManifest(root, fromVersion).map(_.path).toSet
    val delta = readManifest(root, toVersion).map(_.path).filterNot(base)
    // an empty delta (e.g. across a rollback) is a valid answer: zero
    // changed rows, schema preserved via the target snapshot
    if (delta.isEmpty)
      spark.read.parquet(
        readManifest(root, toVersion).map(_.path): _*).limit(0)
    else spark.read.parquet(delta: _*)
  }
}
