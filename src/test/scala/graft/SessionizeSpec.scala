package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFunctions

/** The native sessionize operator (`graft.plans.SessionizeExec`):
  * boundary semantics on synthetic data, randomized equality with the
  * lag + running-sum window composition, multi-partition survival,
  * and the one-exchange/zero-window plan shape. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def native(df: org.apache.spark.sql.DataFrame) =
    GraftFunctions.sessionize(df, "key", "ts", "tie", 100L)

  test("session boundaries: key change and over-gap step, inclusive gap stays") {
    val df = Seq(
      (1L, 0L, 1L), (1L, 100L, 2L),   // gap exactly 100 → same session
      (1L, 201L, 3L),                 // gap 101 > 100 → new session
      (1L, 250L, 4L),
      (2L, 0L, 5L),                   // key change → session resets to 1
      (3L, 999L, 6L)
    ).toDF("key", "ts", "tie")
    val got = native(df).select($"tie", $"session_idx")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L,
      5L -> 1L, 6L -> 1L))
  }

  test("equal timestamps break ties by the tie column, never split by it") {
    // two rows at the same ts: tie orders them, gap 0 ≤ threshold so
    // they always share a session regardless of tie values
    val df = Seq((7L, 50L, 9L), (7L, 50L, 2L), (7L, 251L, 1L))
      .toDF("key", "ts", "tie")
    val got = native(df).select($"tie", $"session_idx")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(9L -> 1L, 2L -> 1L, 1L -> 2L))
  }

  test("randomized: native ≡ lag + running-sum window composition") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260814L)
    val rows = Seq.fill(5003)(
      (rnd.nextInt(37).toLong, rnd.nextInt(10000).toLong))
      .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    // repartition(5) forces a real exchange into the operator
    val df = rows.toDF("key", "ts", "tie").repartition(5)
    val w = Window.partitionBy($"key").orderBy($"ts", $"tie")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = df
      .withColumn("prev", lag($"ts", 1).over(w))
      .withColumn("new_s",
        when($"prev".isNull || $"ts" - $"prev" > 100L, 1L).otherwise(0L))
      .withColumn("session_idx", sum($"new_s").over(run))
      .select($"tie", $"session_idx").as[(Long, Long)].collect().toMap
    val got = native(df).select($"tie", $"session_idx")
      .as[(Long, Long)].collect().toMap
    assert(got === composed)
  }

  test("q_sessionize_native ≡ q_sessionize on the corpus (both oracled)") {
    val a = SparkEntry.queries("q_sessionize")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_sessionize_native")(spark, sf)
      .collect().toSeq
    assert(b === a)
  }

  test("plan: one hash exchange, zero WindowExec, rollup reuses clustering") {
    val p = SparkEntry.queries("q_sessionize_native")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("Sessionize"), s"native operator missing:\n$p")
    assert(!p.contains(" Window ["),
      s"the native path must carry no WindowExec:\n$p")
    // exactly one hash exchange (the user clustering); the trailing
    // orderBy contributes a RANGE exchange, which is fine
    val hashEx = p.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashEx === 1,
      s"expected 1 hash exchange (operator + reused rollup), got $hashEx:\n$p")
  }

  test("plan: the exec fuses into whole-stage codegen with sort and rollup") {
    // round 12 (r10 verdict item #6): SessionizeExec implements
    // CodegenSupport — the session ordinal is a plain long local in
    // the parent's generated consume loop, no JoinedRow/projection.
    // AQE's initial-plan string hides codegen spans, so pin the
    // statically collapsed plan in an AQE-off session.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q_sessionize_native")(ss, sf)
      val p = df.queryExecution.executedPlan.toString
      val sessLine = p.linesIterator.find(_.contains("Sessionize")).get
      assert(sessLine.trim.takeWhile(!_.isLetter).contains("*"),
        s"SessionizeExec must sit inside a WholeStageCodegen span:\n$p")
      // result equality through the codegen path
      assert(df.collect().toSeq ===
        SparkEntry.queries("q_sessionize_native")(spark, sf).collect().toSeq)
    } finally graft.ops.OpCache.clear(ss)
  }
}
