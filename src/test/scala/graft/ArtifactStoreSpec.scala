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
      // the previous artifact root is gone after the new build
      (1L to 20L).toDF("k").write.mode("overwrite")
        .parquet(s"$dir/lineitem.parquet")
      val newRoot = ArtifactStore.rootFor(dir, "sums@1", Seq("lineitem"))
      assert(newRoot !== oldRoot)
      assert(readIt().as[Long].head() === 210L)
      assert(builds === 2)
      assert(!Files.exists(Paths.get(oldRoot)),
        "the stale-fingerprint sibling must be swept")
      assert(readIt().as[Long].head() === 210L)
      assert(builds === 2)
    }
  }
}
