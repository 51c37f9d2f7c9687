package graft

import java.nio.file.{Files, Paths}
import graft.sources.VersionedTable

/** Named refs on the versioned table (round 14): tag immutability,
  * branch advance/promotion, ref-aware vacuum, and the error surface.
  * The graded end-to-end read legs live in `q_scan_table_refs`. */
class VersionedTableRefsSpec extends SparkSpec {
  import spark.implicits._

  private def threeVersions(root: String): Unit =
    (1 to 3).foreach(v =>
      VersionedTable.commit(
        Seq((v.toLong, s"v$v")).toDF("k", "tag"), root))

  test("tags pin, branches advance, reads resolve by name") {
    withTmpDir("graft_refs") { base =>
      val root = s"$base/t"
      threeVersions(root)
      VersionedTable.createTag(root, "rel-1", 1)
      VersionedTable.createBranch(root, "prod", 2)
      assert(VersionedTable.readRef(spark, root, "rel-1")
        .as[(Long, String)].collect().toSet === Set((1L, "v1")))
      assert(VersionedTable.readRef(spark, root, "prod").count() === 2)
      // promotion: one pointer move, the read follows
      VersionedTable.advanceBranch(root, "prod", 3)
      assert(VersionedTable.readRef(spark, root, "prod").count() === 3)
      // pointer rollback (the data never moves)
      VersionedTable.advanceBranch(root, "prod", 1)
      assert(VersionedTable.readRef(spark, root, "prod").count() === 1)
      // tags never move
      val e = intercept[IllegalArgumentException] {
        VersionedTable.advanceBranch(root, "rel-1", 2)
      }
      assert(e.getMessage.contains("tags never move"))
      // listing
      val got = VersionedTable.refs(spark, root)
        .as[(String, String, Int)].collect().toSet
      assert(got === Set(("rel-1", "tag", 1), ("prod", "branch", 1)))
    }
  }

  test("vacuum keeps every version a ref can still reach") {
    withTmpDir("graft_refs_vac") { base =>
      val root = s"$base/t"
      threeVersions(root)
      // v4 REPLACES the data files (compaction) — v1..v3's originals
      // become collectable garbage once outside the keep window
      VersionedTable.optimize(spark, root, numFiles = 1)
      VersionedTable.createTag(root, "audit", 1)
      // keepLast=1 would normally drop the pre-compaction files — the
      // tag holds the floor at v1, nothing is collected, the tag reads
      assert(VersionedTable.vacuum(root, keepLast = 1) === 0)
      assert(VersionedTable.readRef(spark, root, "audit").count() === 1)
      // dropping the ref releases the floor: the next vacuum collects
      VersionedTable.dropRef(root, "audit")
      assert(VersionedTable.vacuum(root, keepLast = 1) > 0)
      assert(VersionedTable.read(spark, root).count() === 3)
    }
  }

  test("ref error surface: duplicates, bad names, out-of-range versions") {
    withTmpDir("graft_refs_err") { base =>
      val root = s"$base/t"
      threeVersions(root)
      VersionedTable.createTag(root, "t1") // default = head (v3)
      assert(VersionedTable.resolveRef(root, "t1") === ("tag", 3))
      intercept[java.nio.file.FileAlreadyExistsException] {
        VersionedTable.createTag(root, "t1", 1)
      }
      intercept[IllegalArgumentException] {
        VersionedTable.createTag(root, "bad/name", 1)
      }
      intercept[IllegalArgumentException] {
        VersionedTable.createBranch(root, "b1", 99)
      }
      intercept[IllegalArgumentException] {
        VersionedTable.resolveRef(root, "missing")
      }
      assert(VersionedTable.dropRef(root, "t1"))
      assert(!VersionedTable.dropRef(root, "t1"))
      assert(!Files.exists(
        Paths.get(root, "_refs", "t1.json")))
    }
  }
}
