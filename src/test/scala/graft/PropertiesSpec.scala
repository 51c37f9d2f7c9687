package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Aggregates, Windows}

/** ScalaCheck-generator-driven properties (SURVEY §5.3), sampled with
  * fixed seeds (the scalatest–scalacheck bridge artifact isn't available
  * offline, so sampling is driven manually). Spark-backed properties use
  * few cases — each case is a Spark job. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("versioned table: random histories match the in-memory model") {
    // MODEL-BASED check of the table layer: a random sequence of
    // commit / optimize / rollback steps is applied both to a real
    // VersionedTable and to a driver-side model (the multiset of rows
    // each version must contain). Afterwards EVERY version's read
    // must equal its model snapshot, and each commit step's
    // incremental read must equal exactly the rows that step added —
    // the whole history, not just the head, is the contract.
    import graft.sources.VersionedTable
    sealed trait Step
    case class Commit(rows: Seq[Long]) extends Step
    case object Optimize extends Step
    case class Rollback(frac: Double) extends Step
    case class Merge(updFrac: Double, nIns: Int) extends Step
    case class DeferDelete(frac: Double) extends Step
    case object Rename extends Step // flips the value column's name
    case class OverwriteAll(n: Int) extends Step // INSERT OVERWRITE
    var nextKey = 0L
    val genStep: Gen[Step] = Gen.frequency(
      5 -> Gen.chooseNum(1, 4).map(n => Commit(Seq.fill(n)(0L))),
      2 -> Gen.const(Optimize),
      2 -> Gen.chooseNum(0.0, 1.0).map(Rollback),
      2 -> Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0, 2))
        .map { case (f, n) => Merge(f, n) },
      2 -> Gen.chooseNum(0.0, 1.0).map(DeferDelete),
      1 -> Gen.const(Rename),
      // round 14: the catalog's INSERT OVERWRITE path — a full-snapshot
      // replace must keep agreeing with the model across every
      // interleaving (rollback over it, masks before it, renames)
      2 -> Gen.chooseNum(1, 3).map(OverwriteAll))
    // history starts with a commit and always interleaves at least one
    // deferred delete AND one rename (round 13 — every later step must
    // keep agreeing with the model across a schema evolution; fixed
    // seeds would otherwise be free to never draw either step)
    val genHistory = for {
      h <- Gen.listOfN(6, genStep)
      f <- Gen.chooseNum(0.0, 1.0)
    } yield Commit(Seq(0L)) ::
      (h.take(2) ++ (Rename :: h.slice(2, 3)) ++
        (DeferDelete(f) :: h.drop(3)))
    samples(genHistory, 2).foreach { steps =>
      withTmpDir("graft_vtable_model") { base =>
        val root = s"$base/t"
        // model(v) = the key multiset version v must read back
        val model = scala.collection.mutable.ArrayBuffer[Seq[Long]](Nil)
        val added = scala.collection.mutable.Map[Int, Seq[Long]]()
        // the value column's LOGICAL name in force (flipped by Rename);
        // nameAt(v) = name each version must read back under
        var vCol = "v"
        val nameAt = scala.collection.mutable.ArrayBuffer[String]("v")
        steps.foreach {
          case Commit(ks) =>
            val keys = ks.map { _ => nextKey += 1; nextKey }
            val v = VersionedTable.commit(
              keys.map(k => (k, s"r$k")).toDF("k", vCol), root)
            model += (model.last ++ keys)
            added(v) = keys
            assert(v === model.size - 1)
          case Optimize =>
            VersionedTable.optimize(spark, root)
            model += model.last
          case Rollback(frac) =>
            val to = math.max(1, (frac * (model.size - 1)).toInt)
            VersionedTable.rollback(root, to)
            model += model(to)
          case Merge(updFrac, nIns) =>
            // update a deterministic subset of live keys (values
            // change, keys stay) and insert nIns fresh keys — the
            // model's key multiset is last \ nothing ∪ inserts, and
            // the updated rows must carry the NEW values
            val live = model.last
            val upd = live.filter(k => (k * updFrac).toLong % 3 == 0)
            val ins = Seq.fill(nIns) { nextKey += 1; nextKey }
            val updates = (upd.map(k => (k, s"u$k")) ++
              ins.map(k => (k, s"r$k"))).toDF("k", vCol)
            VersionedTable.merge(spark, root, updates, "k")
            model += (live ++ ins) // replace-commit: no delta law entry
            // updated rows must read back with the merged values
            if (upd.nonEmpty) {
              val gotUpd = VersionedTable.read(spark, root)
                .filter($"k".isin(upd: _*)).select(col(vCol)).as[String]
                .collect().toSet
              assert(gotUpd === upd.map(k => s"u$k").toSet,
                s"merge did not replace matched rows (steps: $steps)")
            }
          case DeferDelete(frac) =>
            // merge-on-read: the mask applies at read time, the data
            // files must not move, and every DOWNSTREAM operation
            // (merge materializes via its masked read, optimize
            // clears, rollback restores) must keep agreeing with the
            // model — that interleaving is exactly what this step
            // buys over the pointwise MOR spec
            val live = model.last
            val del = live.filter(k => (k * frac).toLong % 4 == 0).distinct
            val before = VersionedTable.resolveFiles(root,
              VersionedTable.currentVersion(root))
            val v = VersionedTable.deleteDeferred(spark, root,
              del.toDF("k"), "k")
            assert(VersionedTable.resolveFiles(root, v) === before,
              s"deferred delete moved data files (steps: $steps)")
            model += model.last.filterNot(del.toSet)
          case OverwriteAll(n) =>
            // the whole snapshot swaps for n fresh rows; pending masks
            // can't touch the new files (their sequence is newer than
            // every recorded delete)
            val keys = Seq.fill(n) { nextKey += 1; nextKey }
            VersionedTable.overwriteAll(
              keys.map(k => (k, s"r$k")).toDF("k", vCol), root)
            model += keys
          case Rename =>
            // metadata-only: flips the value column's logical name;
            // rows, files, and masks must all be untouched
            val to = if (vCol == "v") "val2" else "v"
            VersionedTable.renameColumn(spark, root, vCol, to)
            vCol = to
            model += model.last
        }
        steps.foldLeft("v") { (n, s) =>
          val next = s match {
            case Rename => if (n == "v") "val2" else "v"
            case _ => n
          }
          nameAt += next; next
        }
        // the history log must transcribe the executed steps: one row
        // per version, kinds matching the step types in order
        val expectedKinds = steps.map {
          case _: Commit => "append"
          case Optimize => "neutral"
          case _: Rollback => "rollback"
          case _: Merge => "replace" // cdc=false merge
          case _: DeferDelete => "eqdelete"
          case Rename => "schema"
          case _: OverwriteAll => "replace"
        }
        val gotKinds = VersionedTable.history(spark, root)
          .orderBy($"version").select($"kind").as[String].collect().toSeq
        assert(gotKinds === expectedKinds,
          s"history log diverged from the executed steps (steps: $steps)")
        (1 until model.size).foreach { v =>
          val frame = VersionedTable.read(spark, root, Some(v))
          // each version reads under the logical names in force AT v
          // (pre-activation versions keep their raw written names)
          assert(frame.columns.toSet === Set("k", nameAt(v)),
            s"version $v columns != (k, ${nameAt(v)}) (steps: $steps)")
          val got = frame
            .select($"k").as[Long].collect().sorted.toSeq
          assert(got === model(v).sorted,
            s"version $v diverged from the model (steps: $steps)")
          added.get(v).foreach { keys =>
            val delta = VersionedTable.readChanges(spark, root, v - 1, v)
              .select($"k").as[Long].collect().sorted.toSeq
            assert(delta === keys.sorted,
              s"incremental read v${v - 1}→v$v diverged (steps: $steps)")
          }
        }
      }
    }
  }

  test("targeted rewrites under MIXED stats columns match the model (ADVICE r12)") {
    // The statsBy-identity regression surface, model-based: commits
    // randomly record file stats on the KEY column or on an unrelated
    // column x (= k + 1000, so x-ranges never contain the keys), and
    // optimize(clusterBy) randomly re-records stats on either — then
    // every targeted delete/merge on k must still produce exactly the
    // model's row set. Before the fix a file with x-stats was treated
    // as having k-range [lo,hi] ∌ key and silently carried its
    // matching rows through a DELETE.
    import graft.sources.VersionedTable
    sealed trait Step
    case class CommitS(n: Int, statsOnX: Boolean) extends Step
    case class DeleteT(frac: Double) extends Step
    case class MergeT(frac: Double, nIns: Int) extends Step
    case class OptimizeC(onX: Boolean) extends Step
    val genStep: Gen[Step] = Gen.frequency(
      4 -> Gen.zip(Gen.chooseNum(1, 3), Gen.oneOf(true, false))
        .map { case (n, b) => CommitS(n, b) },
      3 -> Gen.chooseNum(0.0, 1.0).map(DeleteT),
      2 -> Gen.zip(Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0, 2))
        .map { case (f, n) => MergeT(f, n) },
      1 -> Gen.oneOf(true, false).map(OptimizeC))
    val genHistory = Gen.listOfN(7, genStep)
      .map(h => (CommitS(2, statsOnX = true) :: h) :+ DeleteT(0.7))
    var nextKey = 0L
    samples(genHistory, 2).foreach { steps =>
      withTmpDir("graft_statsby_model") { base =>
        val root = s"$base/t"
        val model = scala.collection.mutable.Map[Long, String]()
        def frame(rows: Seq[(Long, String)]) =
          rows.map { case (k, v) => (k, k + 1000L, v) }
            .toDF("k", "x", "v").repartition(1)
        steps.foreach {
          case CommitS(n, onX) =>
            val rows = Seq.fill(n) { nextKey += 1; nextKey }
              .map(k => (k, s"r$k"))
            VersionedTable.commit(frame(rows), root,
              statsCol = Some(if (onX) "x" else "k"))
            rows.foreach { case (k, v) => model(k) = v }
          case DeleteT(frac) =>
            val del = model.keys.toSeq.sorted
              .filter(k => (k * frac).toLong % 3 == 0)
            if (del.nonEmpty) {
              VersionedTable.delete(spark, root, del.toDF("k"), "k")
              del.foreach(model.remove)
            }
          case MergeT(frac, nIns) =>
            val upd = model.keys.toSeq.sorted
              .filter(k => (k * frac).toLong % 4 == 0)
            val ins = Seq.fill(nIns) { nextKey += 1; nextKey }
            val rows = upd.map(k => (k, s"u$k")) ++
              ins.map(k => (k, s"r$k"))
            if (rows.nonEmpty) {
              VersionedTable.mergeTargeted(spark, root, frame(rows), "k")
              rows.foreach { case (k, v) => model(k) = v }
            }
          case OptimizeC(onX) =>
            VersionedTable.optimize(spark, root, numFiles = 2,
              clusterBy = Some(if (onX) "x" else "k"))
        }
        val got = VersionedTable.read(spark, root)
          .select($"k", $"v").as[(Long, String)].collect().toMap
        assert(got === model.toMap,
          s"targeted rewrites diverged from the model (steps: $steps)")
      }
    }
  }

  test("delta manifests: a 55-commit history resolves every version; checkpoints only every K") {
    // r9 verdict item 2: manifests record add/remove vs parent with a
    // periodic full checkpoint, and resolve(deltas) must equal the old
    // full-list semantics over a LONG history — every version readable,
    // commit JSON O(change) between checkpoints.
    import graft.sources.VersionedTable
    withTmpDir("graft_vtable_long") { base =>
      val root = s"$base/t"
      val model = scala.collection.mutable.ArrayBuffer[Seq[Long]](Nil)
      (1 to 55).foreach { i =>
        VersionedTable.commit(Seq((i.toLong, s"r$i")).toDF("k", "v"), root)
        model += (model.last :+ i.toLong)
      }
      (1 to 55).foreach { v =>
        val got = VersionedTable.read(spark, root, Some(v))
          .select($"k").as[Long].collect().sorted.toSeq
        assert(got === model(v), s"version $v diverged")
      }
      // checkpoint policy: the full file list appears ONLY at v1 and
      // every CheckpointInterval-th commit; every other manifest is a
      // single-entry delta
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      (1 to 55).foreach { v =>
        val node = om.readTree(java.nio.file.Files.readString(
          java.nio.file.Paths.get(root, "_manifests", f"v$v%05d.json")))
        val isCp = v == 1 || v % VersionedTable.CheckpointInterval == 0
        assert(node.has("files") === isCp, s"checkpoint policy at v$v")
        assert(node.get("add").size() === 1, s"delta must be O(change) at v$v")
        assert(!node.has("remove"), s"append must not remove at v$v")
      }
      // incremental reads ride the same chains
      val delta = VersionedTable.readChanges(spark, root, 23, 31)
        .select($"k").as[Long].collect().sorted.toSeq
      assert(delta === (24L to 31L))
    }
  }

  test("decimal sums are order-invariant") {
    val money = Gen.listOfN(40, Gen.chooseNum(0L, 9999999L).map(_ / 100.0))
    samples(money, 20).foreach { xs =>
      val a = xs.map(BigDecimal(_)).sum
      val b = scala.util.Random.shuffle(xs).map(BigDecimal(_)).sum
      assert(a === b)
    }
  }

  test("jaccard is symmetric and within [0,1]") {
    val words = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    samples(Gen.zip(words, words), 20).foreach { case (x, y) =>
      val (sx, sy) = (x.toSet, y.toSet)
      val j = sx.intersect(sy).size.toDouble / sx.union(sy).size
      val j2 = sy.intersect(sx).size.toDouble / sy.union(sx).size
      assert(j === j2 && j >= 0.0 && j <= 1.0)
    }
  }

  test("dedup is idempotent (Spark distinct)") {
    samples(Gen.listOfN(30, Gen.chooseNum(0, 5)), 3).foreach { xs =>
      val d1 = xs.toDF("x").distinct()
      val d2 = d1.distinct()
      assert(d1.as[Int].collect().sorted === d2.as[Int].collect().sorted)
    }
  }

  test("window running sum ≡ brute-force prefix scan") {
    import org.apache.spark.sql.expressions.Window
    samples(Gen.listOfN(20, Gen.chooseNum(-100, 100)), 3).foreach { xs =>
      val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
      val w = Window.orderBy($"i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val got = df.orderBy($"i").select(sum($"v").over(w).as("s"))
        .as[Long].collect()
      val want = xs.map(_.toLong).scanLeft(0L)(_ + _).drop(1)
      assert(got.toSeq === want)
    }
  }

  test("pivot ≡ conditional aggregation") {
    val rows = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(1, 4), Gen.oneOf("x", "y", "z")))
    samples(rows, 3).foreach { data =>
      val df = data.toDF("k", "t")
      val piv = df.groupBy($"k").pivot("t", Seq("x", "y", "z")).count()
        .select($"k", coalesce($"x", lit(0L)).as("x"),
          coalesce($"y", lit(0L)).as("y"), coalesce($"z", lit(0L)).as("z"))
      val cond = df.groupBy($"k").agg(
        count(when($"t" === "x", 1)).as("x"),
        count(when($"t" === "y", 1)).as("y"),
        count(when($"t" === "z", 1)).as("z"))
      assert(piv.orderBy($"k").collect().toSeq ===
        cond.orderBy($"k").collect().toSeq)
    }
  }

  test("aggStats squared-sum scaling stays in the decimal→double agreement zone at 100× magnitude") {
    import java.math.RoundingMode.HALF_UP
    // Spark casts an exact decimal to double with ONE correct rounding;
    // DuckDB computes (double)unscaled / 10^scale — TWO roundings. They
    // agree exactly while the unscaled value fits in 2^53 (Det rule).
    def sparkCast(bd: java.math.BigDecimal): Double = bd.doubleValue
    def duckCast(bd: java.math.BigDecimal): Double =
      new java.math.BigDecimal(bd.unscaledValue).doubleValue / math.pow(10, bd.scale)
    // 100× graded magnitude: money up to ~1e6 (2 dp), 1000-row groups
    val money = Gen.chooseNum(0L, 99999999L).map(_ / 100.0)
    samples(Gen.listOfN(1000, money), 5).foreach { xs =>
      // the aggStats pipeline: y = d12(x/100) (exact for 2-dp money),
      // syy = ROUND(Σ y², 4)
      val y = xs.map(x => new java.math.BigDecimal(x / 100.0).setScale(4, HALF_UP))
      val syy = y.map(v => v.multiply(v)).reduce(_ add _).setScale(4, HALF_UP)
      assert(syy.unscaledValue.abs.bitLength <= 53,
        s"scaled Σy² unscaled=${syy.unscaledValue} left the 2^53 agreement zone")
      assert(sparkCast(syy) === duckCast(syy), "engine casts disagree in-zone")
      // exactness of the pre-scaling: y is x/100 with no precision loss
      xs.zip(y).foreach { case (x, yv) =>
        assert(yv.multiply(new java.math.BigDecimal(100)).doubleValue === x)
      }
    }
    // the UNSCALED formulation at the same magnitude crosses 2^53 where
    // the two casts genuinely diverge — the cliff the op now avoids:
    val diverging = (0 until 1000).map { k =>
      new java.math.BigDecimal(java.math.BigInteger.valueOf(9007199254740993L)
        .add(java.math.BigInteger.valueOf(k * 1001L)), 4)
    }.filter(bd => sparkCast(bd) != duckCast(bd))
    assert(diverging.nonEmpty,
      "expected at least one >2^53 unscaled value where the casts diverge")
  }

  test("connected components ≡ driver-side union-find on random graphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.chooseNum(0L, 19L)))
      .map(_.filter { case (a, b) => a != b })
    samples(edgeGen, 3).foreach { edges =>
      if (edges.nonEmpty) {
        // truth: classic union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // min-reachable id per component (find() returns A root, not
        // necessarily the min — normalize via group min)
        val byRoot = nodes.groupBy(find)
        val truth = byRoot.flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }
        val got = graft.ops.Dedup.connectedComponents(edges.toDF("a_id", "b_id"))
          .as[(Long, Long)].collect().toMap
        assert(got === truth, s"edges=$edges")
      }
    }
  }

  test("native md5_int60 ≡ the composed conv(substring(md5)) chain") {
    // random strings incl. unicode + empties; both paths over the same
    // frame must agree bit-for-bit (every hash-derived op depends on it)
    val strs = Gen.listOfN(200, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.const(""),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.listOfN(6, Gen.oneOf("é", "日", "a", ":", "0")).map(_.mkString)))
    samples(strs, 3).foreach { xs =>
      val df = xs.toDF("s")
      val both = df.select(
        graft.Det.md5int60(col("s")).as("native"),
        graft.Det.md5int60Chain(col("s")).as("chain"))
      assert(both.filter($"native" =!= $"chain").count() === 0)
      // 60-bit range: always non-negative, below 2^60
      assert(both.filter($"native" < 0 ||
        $"native" >= (1L << 60)).count() === 0)
    }
  }

  test("native sorted_intersect_count ≡ size(array_intersect) (randomized)") {
    // the fused merge-count the sparsify scoring rides: on
    // sorted-distinct bigint arrays (the adjacency contract) it must
    // agree with the composed form on every draw, including empties
    // and disjoint/identical pairs
    val arrays = Gen.listOfN(60, for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted))
    samples(arrays, 3).foreach { xs =>
      val df = xs.toDF("a", "b")
      val both = df.select(
        graft.functions.SortedIntersectCountF.count(col("a"), col("b"))
          .as("fused"),
        size(array_intersect(col("a"), col("b"))).as("composed"))
      assert(both.filter($"fused" =!= $"composed").count() === 0)
    }
  }

  test("sweep-line peak ≡ brute-force per-instant scan on random intervals") {
    val iv = Gen.listOfN(10, for {
      u <- Gen.chooseNum(1L, 6L)
      a <- Gen.chooseNum(0L, 20L)
      b <- Gen.chooseNum(0L, 20L)
    } yield (u, math.min(a, b), math.max(a, b)))
    samples(iv, 5).foreach { raw =>
      // one interval per user (the op aggregates min/max per user first)
      val merged = raw.groupBy(_._1).map { case (u, xs) =>
        (u, xs.map(_._2).min, xs.map(_._3).max) }.toSeq
      val df = merged.toDF("user_id", "us0", "us1")
        .withColumn("day", lit("d"))
      val Array((users, peak)) = Aggregates.sweepPeaks(df)
        .select($"n_users", $"peak_concurrency")
        .as[(Long, Long)].collect()
      val brute = (0L to 20L).map(t =>
        merged.count { case (_, a, b) => a <= t && t <= b }).max
      assert(users === merged.size.toLong)
      assert(peak === brute.toLong, s"intervals=$merged")
    }
  }

  test("cusum peak lands exactly on a planted level shift") {
    val cases = Gen.zip(Gen.chooseNum(3, 17), Gen.chooseNum(1L, 9L),
      Gen.chooseNum(11L, 20L))
    samples(cases, 6).foreach { case (m, a, b) =>
      val n = 20
      val daily = (0 until n).map(i =>
        ("t", i, if (i < m) a else b)).toDF("event_type", "day", "x")
      val Array((nd, peakDay, peakVal)) = Windows.cusumPeaks(daily)
        .select($"n_days", $"peak_day", $"peak_cusum_scaled")
        .as[(Long, Int, Long)].collect()
      assert(nd === n.toLong)
      assert(peakDay === m - 1, s"shift at $m, a=$a b=$b")
      assert(peakVal === m.toLong * (n - m) * (a - b))
    }
  }

  test("A except B is disjoint from A intersect B") {
    val keys = Gen.listOfN(20, Gen.chooseNum(0, 10))
    samples(Gen.zip(keys, keys), 3).foreach { case (a, b) =>
      val da = a.toDF("k"); val db = b.toDF("k")
      val ex = da.except(db).as[Int].collect().toSet
      val in = da.intersect(db).as[Int].collect().toSet
      assert(ex.intersect(in).isEmpty)
    }
  }
}
