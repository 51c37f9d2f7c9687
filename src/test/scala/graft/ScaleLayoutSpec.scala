package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Physical-layout techniques for the 100-TB stance: bucketing for
  * co-located (shuffle-free) joins, and date-partitioned sinks whose
  * scans prune partitions. Verified by plan inspection, not just
  * results. */
class ScaleLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val db = "graft_bucketing"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // a previously crashed run can leave the managed location behind
    // without a catalog entry — clear both
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      val loc = new java.io.File(s"$warehouse/$db.db/$t")
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    Tables.t(spark, sf, "orders")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(s"$db.orders_b")
    Tables.t(spark, sf, "customer")
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(s"$db.customer_b")
    // force SMJ (the toy-scale default would broadcast) and aggregate on
    // the bucket key: with co-bucketed layout the whole join+agg needs
    // ZERO exchanges
    val joined = spark.table(s"$db.orders_b")
      .hint("merge")
      .join(spark.table(s"$db.customer_b"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join+agg should not shuffle:\n$plan")
    // and it still computes the right thing
    val viaBuckets = joined.orderBy($"c_custkey")
      .as[(Long, Long)].collect().toSeq
    val plain = Tables.t(spark, sf, "orders")
      .join(Tables.t(spark, sf, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey").agg(count(lit(1)).as("n"))
      .orderBy($"c_custkey").as[(Long, Long)].collect().toSeq
    assert(viaBuckets === plain)
  }

  test("z-order files bound BOTH dimensions; a 1-D sort provably cannot") {
    // Each q_layout_zorder file is a contiguous 2^14-code z-range, which
    // pins the top 3 bits of BOTH dims: per-file range ≤ 127 on each
    // axis — that's what lets a scan skip files on either predicate.
    val z = SparkEntry.queries("q_layout_zorder")(spark, sf)
      .agg(max($"max_a" - $"min_a").as("ra"), max($"max_b" - $"min_b").as("rb"))
      .as[(Long, Long)].head()
    assert(z._1 <= 127L && z._2 <= 127L,
      s"z-file envelopes must confine both dims to 128-wide bands: $z")
    // Contrast: files sorted by `a` alone bound `a` but leave `b` at
    // nearly the full 1024 domain — skipping on b reads everything.
    val lin = Tables.t(spark, sf, "events")
      .select(($"user_id" % 1024L).as("a"),
        expr("(unix_micros(ts) div 3600000000) % 1024").as("b"))
      .groupBy(expr("a div 16").as("file_id"))
      .agg(max($"b" - lit(0L)).as("mx"), min($"b").as("mn"))
      .agg(avg($"mx" - $"mn")).as[Double].head()
    assert(lin > 512.0,
      s"1-D layout should leave the second dim unclustered, got avg range $lin")
  }

  test("date-partitioned sink prunes partitions on read") {
    withTmpDir("graft_part") { path =>
    Tables.t(spark, sf, "orders")
      .withColumn("order_year", year($"o_orderdate"))
      .write.mode("overwrite")
      .partitionBy("order_year")
      .parquet(path)
    val pruned = spark.read.parquet(path).filter($"order_year" === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"partition filter missing:\n$plan")
    val expected = Tables.t(spark, sf, "orders")
      .filter(year($"o_orderdate") === 1997).count()
    assert(pruned.count() === expected)
    }
  }
}
