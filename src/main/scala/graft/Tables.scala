package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver-generated test corpus
  * (`TESTDATA.md`): one parquet file per table under `$sfDir/`.
  *
  * Scale stance: `spark.read.parquet` is the DataSource V2 vectorized
  * reader — predicate pushdown + column pruning reach the scan, so every
  * query that filters/projects only pays for what it touches. At 100 TB
  * the same call reads a partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects. Read it as a long (legacy flag) and convert to a
      // µs timestamp — lossless: the generator's ns values are µs-aligned
      // (verified: 0 rows with sub-µs precision), and DuckDB's
      // TIMESTAMP_NS→TIMESTAMP cast truncates identically.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      // integral `div`, NOT `/`: double division loses precision above
      // 2^53 and epoch-ns values are ~1.7e18.
      if (raw.schema("ts").dataType == LongType)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Per-JVM /tmp sink root for the source/sink round-trip ops. The pid
    * segment isolates concurrently running JVMs (the driver's Verify and
    * Bench overlap in practice): on a shared path two writers can
    * interleave as A.overwrite, B.overwrite, A.append, B.append, leaving
    * one sink with a doubled batch and the other missing one — silently
    * wrong aggregates. Within one JVM the path is stable, so
    * mode("overwrite") still cleans up earlier runs of the same query. */
  def sinkPath(kind: String, sfDir: String, leaf: String): String = {
    sweepStaleSinks
    s"/tmp/graft_${kind}_sink/p${ProcessHandle.current().pid()}/" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_") + s"/$leaf"
  }

  /** One-time (per JVM) sweep of sink dirs left by DEAD processes:
    * every new JVM writes a fresh `p<pid>` subtree and overwrite-mode
    * only cleans the current pid's paths, so repeated Verify/Bench runs
    * would otherwise accumulate unbounded copies of the round-trip
    * tables in /tmp. Live pids are left alone — the concurrent-writer
    * isolation the pid segment exists for is preserved. */
  private lazy val sweepStaleSinks: Unit = {
    import java.nio.file.{Files, LinkOption, Path, Paths}
    import scala.jdk.CollectionConverters._
    // list-and-close: Files.list holds an open directory fd until the
    // stream is closed — a sweep over hundreds of stale date-partition
    // dirs at JVM startup must not hold them all while Spark opens its
    // own files.
    def children(p: Path): Seq[Path] = {
      val st = Files.list(p)
      try st.iterator().asScala.toVector finally st.close()
    }
    // NOFOLLOW on the directory test: /tmp is world-writable and the
    // streaming source stages SYMLINKS under /tmp (Streaming.scala) — a
    // recursive delete that follows a directory link would destroy the
    // link's TARGET (e.g. the read-only testdata). Links are deleted as
    // entries, never entered.
    def deleteRec(p: Path): Unit = {
      if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS))
        children(p).foreach(deleteRec)
      Files.deleteIfExists(p)
    }
    try {
      children(Paths.get("/tmp"))
        .filter { p =>
          val n = p.getFileName.toString
          n.startsWith("graft_") && n.endsWith("_sink") &&
            Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)
        }
        .flatMap(children)
        .filter { pidDir =>
          val n = pidDir.getFileName.toString
          n.startsWith("p") && n.drop(1).nonEmpty &&
            n.drop(1).forall(_.isDigit) &&
            !ProcessHandle.of(n.drop(1).toLong)
              .map[Boolean](_.isAlive).orElse(false)
        }
        .foreach(d => try deleteRec(d) catch { case _: Throwable => () })
    } catch { case _: Throwable => () } // sweep is best-effort hygiene
  }
}
