package graft

import java.nio.file.{Files, Paths}
import graft.sources.{ArtifactStore, VersionedTable}

/** The persisted derived-artifact store (round 14): build-once
  * semantics, read ≡ build equality, fingerprint-keyed staleness, and
  * stale-sibling hygiene. The graph queries' oracles separately pin
  * that reading the persisted edge list preserves every downstream
  * result bit-for-bit. */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  test("artifact builds once, later reads hit the table") {
    withTmpDir("graft_artifact") { base =>
      // a fake "corpus": one parquet table the artifact derives from
      val dir = s"$base/sf"
      (1L to 100L).toDF("k").write.parquet(s"$dir/lineitem.parquet")
      var builds = 0
      def readIt() = ArtifactStore.table(spark, dir, "squares@1",
        Seq("lineitem")) {
        builds += 1
        spark.read.parquet(s"$dir/lineitem.parquet")
          .select($"k", ($"k" * $"k").as("k2"))
      }
      val first = readIt().as[(Long, Long)].collect().toSet
      assert(builds === 1)
      assert(first === (1L to 100L).map(k => k -> k * k).toSet)
      // second call: no rebuild, identical rows
      assert(readIt().as[(Long, Long)].collect().toSet === first)
      assert(builds === 1, "same fingerprint must not rebuild")
      // the artifact IS a VersionedTable at the advertised root
      val root = ArtifactStore.rootFor(dir, "squares@1", Seq("lineitem"))
      assert(VersionedTable.currentVersion(root) === 1)
    }
  }

  test("incremental refresh: feed → changed keys → mergeTargeted ≡ full rebuild") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    // The LAW behind the ArtifactStore scaladoc's maintenance contract
    // (round 14): a derived artifact keyed by a source entity refreshes
    // from the source's row-level change feed by recomputing the
    // derivation for EXACTLY the changed keys and merge-targeting the
    // slice in (plus a delete leg for keys whose derivation shrank to
    // empty) — and the result is bit-identical to a full rebuild.
    withTmpDir("graft_artifact_incr") { base =>
      val src = s"$base/src"
      // the co-purchase shape: per-order part pairs
      def pairsOf(df: DataFrame): DataFrame =
        df.as("a").join(df.as("b"), Seq("o"))
          .filter(col("a.p") < col("b.p"))
          .select($"o", col("a.p").as("pa"), col("b.p").as("pb"))
          .distinct()
      val v1 = (1L to 20L).flatMap(o =>
        Seq((o, o % 5), (o, o % 5 + 1), (o, o % 5 + 2))).toDF("o", "p")
      VersionedTable.commit(v1, src)
      val art = s"$base/art"
      VersionedTable.commit(pairsOf(VersionedTable.read(spark, src)),
        art, statsCol = Some("o")) // key stats so targeting bites
      // source change: orders 3 and 7 get new line sets; order 11
      // SHRINKS to a single part (its pairs must vanish downstream)
      val updates = Seq((3L, 100L), (3L, 101L), (7L, 200L), (7L, 201L),
        (7L, 202L), (11L, 300L)).toDF("o", "p")
      VersionedTable.merge(spark, src, updates, "o", cdc = true)
      // refresh: O(change) — the feed names the touched keys, the
      // derivation reruns over ONLY those orders' current rows
      val changedKeys = VersionedTable.readChangeFeed(spark, src, 1, 2)
        .select($"o").distinct()
      assert(changedKeys.count() === 3) // exactly the merged orders
      val head = VersionedTable.read(spark, src)
      val slice = pairsOf(head.join(changedKeys, Seq("o"), "left_semi"))
      VersionedTable.mergeTargeted(spark, art, slice, "o")
      val emptied = changedKeys
        .join(slice.select($"o").distinct(), Seq("o"), "left_anti")
      VersionedTable.delete(spark, art, emptied, "o")
      // the law: incremental ≡ full rebuild, as sets of rows
      val incr = VersionedTable.read(spark, art)
        .as[(Long, Long, Long)].collect().toSet
      val rebuilt = pairsOf(head).as[(Long, Long, Long)].collect().toSet
      assert(incr === rebuilt)
      assert(!incr.exists(_._1 == 11L), "shrunk order's pairs must vanish")
      assert(incr.exists(_._1 == 3L) && incr.exists(_._1 == 7L))
    }
  }

  test("a changed source fingerprint rebuilds; the stale sibling is swept") {
    withTmpDir("graft_artifact_stale") { base =>
      val dir = s"$base/sf"
      (1L to 10L).toDF("k").write.parquet(s"$dir/lineitem.parquet")
      var builds = 0
      def readIt() = ArtifactStore.table(spark, dir, "sums@1",
        Seq("lineitem")) {
        builds += 1
        spark.read.parquet(s"$dir/lineitem.parquet")
          .agg(org.apache.spark.sql.functions.sum($"k").as("s"))
      }
      assert(readIt().as[Long].head() === 55L)
      val oldRoot = ArtifactStore.rootFor(dir, "sums@1", Seq("lineitem"))
      // corpus changes wholesale → new fingerprint, one rebuild, and
      // (grace window elapsed — forced to zero here) the previous
      // artifact root is gone after the new build
      (1L to 20L).toDF("k").write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val newRoot = ArtifactStore.rootFor(dir, "sums@1", Seq("lineitem"))
      assert(newRoot !== oldRoot)
      val saved = ArtifactStore.sweepGraceMs
      try {
        ArtifactStore.sweepGraceMs = 0L
        assert(readIt().as[Long].head() === 210L)
      } finally ArtifactStore.sweepGraceMs = saved
      assert(builds === 2)
      assert(!Files.exists(Paths.get(oldRoot)),
        "the stale-fingerprint sibling must be swept")
      assert(readIt().as[Long].head() === 210L)
      assert(builds === 2)
    }
  }

  test("a stale sibling younger than the grace window survives a sweep") {
    // r14 verdict item #8 / ADVICE r14: an already-planned scan of the
    // previous artifact fails (not rebuilds) if its files vanish — so
    // the sweep defers deletion until the sibling has been quiet for
    // the grace window, letting in-flight readers of the just-
    // superseded artifact finish.
    withTmpDir("graft_artifact_grace") { base =>
      val dir = s"$base/sf"
      (1L to 10L).toDF("k").write.parquet(s"$dir/lineitem.parquet")
      def readIt() = ArtifactStore.table(spark, dir, "sums@2",
        Seq("lineitem")) {
        spark.read.parquet(s"$dir/lineitem.parquet")
          .agg(org.apache.spark.sql.functions.sum($"k").as("s"))
      }
      assert(readIt().as[Long].head() === 55L)
      val oldRoot = ArtifactStore.rootFor(dir, "sums@2", Seq("lineitem"))
      // a reader of the old artifact plans its scan "now"; the corpus
      // flips and the new build's sweep runs while that plan is live
      val planned = VersionedTable.read(spark, oldRoot)
      (1L to 20L).toDF("k").write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      assert(readIt().as[Long].head() === 210L) // default grace in force
      assert(Files.exists(Paths.get(oldRoot)),
        "a just-superseded sibling inside the grace window must survive")
      // ... so the in-flight plan still completes
      assert(planned.count() === 1L)
    }
  }
}
