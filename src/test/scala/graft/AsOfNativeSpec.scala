package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** The native as-of join (graft.plans.AsOfJoin): physical-plan shape,
  * hand-computed semantics on constructed edge cases, and exact
  * agreement with the union+window formulation under many partitions.
  */
class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user_id, us) purchases / (click_id, user_id, us) clicks
  private def purchases = Seq(
    (100L, 1L, 50L),  // prior clicks at 10, 40 → 11
    (101L, 1L, 40L),  // click AT 40 is visible (<=) → 11
    (102L, 1L, 5L),   // no prior click → null
    (103L, 2L, 70L),  // user 2: two clicks at the SAME us 60 → larger id 23
    (104L, 3L, 10L)   // user 3 has no clicks at all → null
  ).toDF("event_id", "user_id", "us")

  private def clicks = Seq(
    (10L, 1L, 10L), (11L, 1L, 40L),
    (22L, 2L, 60L), (23L, 2L, 60L),
    (30L, 4L, 5L)    // user 4 never purchases; row must be skipped cleanly
  ).toDF("click_id", "user_id", "us")

  private def nativeResult = AsOf.asofJoinNative(purchases, clicks,
    keyCol = "user_id", timeCol = "us", tieCol = "event_id",
    rightTieCol = "click_id", valueCols = Map("click_id" -> "prior_click_id"))

  test("asofJoinNative: hand-computed matches, ties, and null fills") {
    val got = nativeResult.orderBy("event_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      (100L, Some(11L)), (101L, Some(11L)), (102L, None),
      (103L, Some(23L)), (104L, None)))
  }

  test("asofJoinNative: plans into AsOfJoinExec (no window, no BNLJ)") {
    val plan = nativeResult.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin asofon"), // AsOfJoinExec prints sans Exec
      s"expected the native operator in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "marker condition must never reach a product-join strategy")
    assert(!plan.contains("Window"),
      "the native path must not fall back to the window formulation")
  }

  test("asofJoinNative: equals the union+window formulation on a randomized corpus") {
    // deterministic pseudo-random corpus: enough keys to span all 4
    // partitions, duplicate timestamps to exercise tie-breaks
    val ev = spark.range(0, 2000).select(
      col("id").as("event_id"),
      pmod(hash(col("id")), lit(37)).cast("long").as("user_id"),
      pmod(hash(col("id") * 7 + 1), lit(101)).cast("long").as("us"))
    val l = ev.filter(pmod(col("event_id"), lit(3)) === 0)
      .select(col("event_id"), col("user_id"), col("us"))
    val r = ev.filter(pmod(col("event_id"), lit(3)) =!= 0)
      .select(col("event_id").as("click_id"), col("user_id"), col("us"))
    val viaWindow = AsOf.asofJoin(l, r, "user_id", "us",
        "event_id", "click_id", Map("click_id" -> "prior"))
      .orderBy("event_id").collect().toSeq
    val viaNative = AsOf.asofJoinNative(l, r, "user_id", "us",
        "event_id", "click_id", Map("click_id" -> "prior"))
      .orderBy("event_id").collect().toSeq
    assert(viaNative == viaWindow)
  }

  test("asofJoinNative: string keys order correctly through the interpreted path") {
    val l = Seq(("b", 10L, 1L), ("a", 10L, 2L), ("c", 10L, 3L))
      .toDF("k", "us", "event_id")
    val r = Seq(("a", 5L, 10L), ("b", 5L, 20L), ("b", 7L, 21L), ("d", 1L, 30L))
      .toDF("k", "us", "click_id")
    val got = AsOf.asofJoinNative(l, r, "k", "us", "event_id", "click_id",
        Map("click_id" -> "prior"))
      .orderBy("k").collect()
      .map(x => (x.getString(0), if (x.isNullAt(3)) None else Some(x.getLong(3))))
    assert(got.toSeq == Seq(("a", Some(10L)), ("b", Some(21L)), ("c", None)))
  }

  test("asofJoinNative: null left keys match nothing and survive as null fills") {
    val l = Seq((Some(1L), 10L, 1L), (None, 10L, 2L), (Some(1L), 20L, 3L))
      .toDF("k", "us", "event_id")
    val r = Seq((1L, 5L, 10L)).toDF("k", "us", "click_id")
    val got = AsOf.asofJoinNative(l, r, "k", "us", "event_id", "click_id",
        Map("click_id" -> "prior"))
      .orderBy("event_id").collect()
      .map(x => (x.getLong(1) /* us */, x.isNullAt(0),
        if (x.isNullAt(3)) None else Some(x.getLong(3))))
    assert(got.toSeq == Seq(
      (10L, false, Some(10L)), (10L, true, None), (20L, false, Some(10L))))
  }

  test("AsOfOn marker without the strategy fails loudly, not wrongly") {
    // a session clone WITHOUT the strategy: planning falls through to
    // the default join strategies, which must then fail at execution
    // with the instructive marker error — never silently produce rows
    val s2 = spark.newSession()
    graft.expr.GraftFunctions.register(s2)
    val l = Seq((1L, 1L, 10L)).toDF("event_id", "user_id", "us")
    val r = Seq((2L, 1L, 5L)).toDF("click_id", "user_id", "us")
      .select(col("user_id").as("__r_key"), col("us").as("__r_time"),
        col("click_id").as("__r_tie"), col("click_id"))
    val lv = s2.createDataFrame(l.collectAsList(), l.schema)
    val rv = s2.createDataFrame(r.collectAsList(), r.schema)
    val cond = call_function(graft.expr.GraftFunctions.AsOfOnName,
      lv("user_id"), rv("__r_key"), lv("us"), rv("__r_time"),
      lv("event_id"), rv("__r_tie"))
    val ex = intercept[Exception] {
      lv.join(rv, cond, "left").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m =>
      m != null && m.contains("graft_asof_on")))
  }

  test("asofJoinForward: next-within-tolerance, same-instant visibility, tie, no-match") {
    // purchases at us 50/40/5/70/10; clicks reused as the "next" side
    val got = AsOf.asofJoinForward(purchases, clicks,
        keyCol = "user_id", timeCol = "us", tieCol = "event_id",
        rightTieCol = "click_id",
        valueCols = Map("click_id" -> "next_click_id"),
        toleranceUs = 20L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.toSeq == Seq(
      (100L, None, None),          // no click ≥ 50 for user 1
      (101L, Some(11L), Some(40L)),// click AT 40 visible (>=), lag 0
      (102L, Some(10L), Some(10L)),// next at 10, within 20
      (103L, None, None),          // user 2 clicks at 60 < 70 → nothing ahead
      (104L, None, None)))         // user 3 has no clicks
  }

  test("asofJoinForward: same-instant tie resolves to the larger right tie") {
    val l = Seq((103L, 2L, 60L)).toDF("event_id", "user_id", "us")
    val got = AsOf.asofJoinForward(l, clicks, "user_id", "us",
        "event_id", "click_id", Map("click_id" -> "nxt"),
        toleranceUs = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((103L, 23L, 60L)))
  }

  test("asofJoinForward: tolerance boundary is inclusive; beyond it nulls") {
    val l = Seq((1L, 1L, 100L), (2L, 1L, 79L)).toDF("event_id", "user_id", "us")
    val r = Seq((9L, 1L, 110L)).toDF("click_id", "user_id", "us")
    val got = AsOf.asofJoinForward(l, r, "user_id", "us", "event_id",
        "click_id", Map("click_id" -> "nxt"), toleranceUs = 10L)
      .orderBy("event_id").collect()
      .map(r0 => (r0.getLong(0),
        if (r0.isNullAt(3)) None else Some(r0.getLong(3))))
    // 110-100=10 ≤ 10 → match; 110-79=31 > 10 → null
    assert(got.toSeq == Seq((1L, Some(9L)), (2L, None)))
  }
}
