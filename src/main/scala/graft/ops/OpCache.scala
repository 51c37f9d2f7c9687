package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persist-once registry for intermediates shared within (and across)
  * operators — exploded shingle rows, minhash signatures, ML feature
  * inputs. One home for every `.persist` in the op modules so a long
  * session (the 98-query bench, a user notebook) can release ALL cached
  * storage with one call instead of leaking it query over query (the
  * round-1 "bench interference" flag).
  *
  * Builds are SINGLE-FLIGHT: `TrieMap.getOrElseUpdate` atomically
  * publishes a lazy holder, and the `lazy val` inside serializes the
  * actual build — so a concurrent first access (the 4-way parallel
  * all-query specs) cannot run an EAGER build (the clustering fixpoint)
  * twice; the second caller blocks on the first's holder instead.
  *
  * MEMORY_AND_DISK everywhere: still correct when an intermediate
  * outgrows executor memory at scale.
  */
object OpCache {
  private final class Holder(build: () => DataFrame) {
    @volatile var forced = false
    // clear() raced an in-flight build before this flag existed: clear
    // removed the holder, saw forced=false and skipped unpersist, then
    // the builder persisted into a holder no longer in the map — a
    // storage leak (a later cached() call persists a SECOND copy and
    // the first is never released). Now clear() marks the holder and
    // the builder, on completing AFTER a clear, unpersists its own
    // result. Both flag writes happen inside the lazy-val monitor or
    // are ordered volatile writes, so exactly one side releases.
    @volatile var cleared = false
    lazy val df: DataFrame = {
      val d = build()
      // iterative builds (fixpoints) return already-persisted results
      val out =
        if (d.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        else d
      forced = true
      if (cleared) out.unpersist(blocking = false)
      out
    }
  }

  private val cache = scala.collection.concurrent
    .TrieMap.empty[(SparkSession, String, String), Holder]

  /** Session-scoped clear hooks: op modules holding DRIVER-side memos
    * keyed by session (the learned-PQ codebooks) register here so
    * [[clear]] releases them with everything else — a bench rep must
    * not inherit the previous rep's fitted models any more than its
    * persisted frames (r10 ADVICE: the cbMemo bench-hygiene leak). */
  private val clearHooks = scala.collection.concurrent
    .TrieMap.empty[String, SparkSession => Unit]

  def onClear(key: String)(f: SparkSession => Unit): Unit =
    clearHooks.putIfAbsent(key, f)

  def cached(s: SparkSession, dir: String, key: String)
      (build: => DataFrame): DataFrame =
    cache.getOrElseUpdate((s, dir, key), new Holder(() => build)).df

  /** Unpersist and forget every cached intermediate of this session.
    * Never-forced holders are dropped without building them; a holder
    * whose build is IN FLIGHT is flagged so the builder releases its
    * own persist on completion (see Holder.cleared). */
  def clear(s: SparkSession): Unit = {
    cache.keys.filter(_._1 eq s).foreach { k =>
      cache.remove(k).foreach { h =>
        h.cleared = true
        if (h.forced) h.df.unpersist(blocking = false)
      }
    }
    clearHooks.values.foreach(_(s))
  }
}
