package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.jdk.CollectionConverters._

/** Minimal manifest-based versioned table (the lakehouse snapshot
  * mechanism, from first principles): every commit writes its data to
  * an immutable per-version directory and then publishes a JSON
  * manifest listing the COMPLETE file set of the new version (parent
  * files + new files). Readers resolve a manifest and read exactly its
  * files — so reads are snapshot-isolated against concurrent commits,
  * time travel is "pick an older manifest", and rollback is "commit
  * the old file list again". Publication is atomic-rename, the same
  * trick every table format and Spark's own checkpointing rely on: a
  * manifest is either fully visible or absent, never torn.
  *
  * Scale shape: the manifest holds file PATHS (O(files), not O(rows));
  * a read plans one parquet scan over the resolved list, so all
  * pushdown/pruning applies unchanged. Commit cost is the data write
  * plus one tiny driver-side JSON rename — no table-wide rewrite, no
  * lock. What this deliberately omits from the real formats:
  * column-level stats in manifests (file skipping), compaction
  * rewrites (we have `q_sink_compact` separately), and multi-writer
  * conflict detection (single-writer per table path here).
  */
object VersionedTable {

  private def manifestDir(root: String): Path = Paths.get(root, "_manifests")

  private def manifestPath(root: String, v: Int): Path =
    manifestDir(root).resolve(f"v$v%05d.json")

  /** Largest published version, 0 when the table doesn't exist yet. */
  def currentVersion(root: String): Int = {
    val d = manifestDir(root)
    if (!Files.isDirectory(d)) 0
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{5}\\.json") =>
        s.substring(1, 6).toInt }
      .foldLeft(0)(math.max)
  }

  private def readManifest(root: String, v: Int): Seq[String] = {
    val p = manifestPath(root, v)
    require(Files.exists(p), s"version $v not found under $root")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(Files.readString(p))
    node.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Append `df` as a new version; returns the published version id. */
  def commit(df: DataFrame, root: String): Int = {
    val parent = currentVersion(root)
    val v = parent + 1
    val dataDir = Paths.get(root, "data", f"v$v%05d")
    df.write.mode("errorifexists").parquet(dataDir.toString)
    val newFiles = Files.list(dataDir).iterator().asScala
      .map(_.toString)
      .filter(f => f.endsWith(".parquet") &&
        Paths.get(f).getFileName.toString.startsWith("part-"))
      .toSeq.sorted
    val files = (if (parent > 0) readManifest(root, parent) else Nil) ++
      newFiles
    Files.createDirectories(manifestDir(root))
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = om.createObjectNode()
    body.put("version", v)
    body.put("parent", parent)
    val arr = body.putArray("files")
    files.foreach(arr.add)
    // atomic publish: write a temp file in the same directory, then
    // rename — a manifest can never be observed half-written
    val tmp = manifestDir(root).resolve(f".v$v%05d.json.tmp")
    Files.writeString(tmp, om.writeValueAsString(body))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Snapshot read of `version` (default: latest). */
  def read(spark: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion(root))
    spark.read.parquet(readManifest(root, v): _*)
  }

  /** ROLLBACK as a forward commit: publish a NEW version whose file
    * list is exactly `toVersion`'s — nothing is deleted (later
    * snapshots stay readable, the data dirs are immutable), history
    * stays linear, and the operation is O(manifest) regardless of
    * table size. Returns the published version id. */
  def rollback(root: String, toVersion: Int): Int = {
    val parent = currentVersion(root)
    val v = parent + 1
    val files = readManifest(root, toVersion)
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val body = om.createObjectNode()
    body.put("version", v)
    body.put("parent", parent)
    body.put("rollbackOf", toVersion)
    val arr = body.putArray("files")
    files.foreach(arr.add)
    val tmp = manifestDir(root).resolve(f".v$v%05d.json.tmp")
    Files.writeString(tmp, om.writeValueAsString(body))
    Files.move(tmp, manifestPath(root, v), StandardCopyOption.ATOMIC_MOVE)
    v
  }

  /** Incremental (CDC-style) read: the rows ADDED between two
    * versions — exactly the files in `toVersion`'s manifest that are
    * absent from `fromVersion`'s. O(manifest) planning; the scan
    * reads only the delta files, never the base — the property that
    * makes incremental downstream jobs O(change) at 100 TB. */
  def readChanges(spark: SparkSession, root: String,
      fromVersion: Int, toVersion: Int): DataFrame = {
    val base = readManifest(root, fromVersion).toSet
    val delta = readManifest(root, toVersion).filterNot(base)
    // an empty delta (e.g. across a rollback) is a valid answer: zero
    // changed rows, schema preserved via the target snapshot
    if (delta.isEmpty)
      spark.read.parquet(readManifest(root, toVersion): _*).limit(0)
    else spark.read.parquet(delta: _*)
  }
}
