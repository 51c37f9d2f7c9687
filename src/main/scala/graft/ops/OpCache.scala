package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-once registry for intermediates shared within (and across)
  * operators — exploded shingle rows, minhash signatures, ML feature
  * inputs. One home for every `.persist` in the op modules so a long
  * session (the 98-query bench, a user notebook) can release ALL cached
  * storage with one call instead of leaking it query over query (the
  * round-1 "bench interference" flag).
  *
  * `TrieMap.getOrElseUpdate` is atomic in Scala 2.13; under a rare
  * concurrent first-build two DataFrames may be constructed but only
  * the winner is persisted and retained — the loser is never
  * materialized (persist is lazy), so nothing leaks.
  *
  * MEMORY_AND_DISK everywhere: still correct when an intermediate
  * outgrows executor memory at scale.
  */
object OpCache {
  private val cache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String, String), DataFrame]

  def cached(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, key), {
      val df = build
      // iterative builds (fixpoints) return already-persisted results
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    })

  /** Unpersist and forget every cached intermediate of this session. */
  def clear(s: SparkSession): Unit =
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach(_.unpersist(blocking = false))
    }
}
