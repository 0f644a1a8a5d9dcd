package graft

import org.apache.spark.sql.functions._

import graft.ops.Funnel

/** Hand fixtures for the funnel / cohort-retention operators: ordered
  * reachability (a stage event BEFORE the previous stage must not
  * count) and distinct-user offset counting.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: strict temporal ordering across stages") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "purchase", 3L),
      (2L, "click", 1L), (2L, "view", 2L),   // click precedes view: no stage 2
      (3L, "view", 1L), (3L, "purchase", 2L), // skipped click: no stage 3
      (4L, "view", 1L), (4L, "click", 2L)
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, col("user_id"), col("event_type"),
        col("ts"), Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.toSeq === Seq(
      (0, "view", 4L, None),
      (1, "click", 2L, Some(0.5)),
      (2, "purchase", 1L, Some(0.5))))
  }

  test("funnel: same-timestamp stage event does not count (strict >)") {
    val ev = Seq((1L, "view", 5L), (1L, "click", 5L))
      .toDF("user_id", "event_type", "ts")
    val got = Funnel.funnel(ev, col("user_id"), col("event_type"),
        col("ts"), Seq("view", "click"))
      .orderBy("stage_idx").collect().map(r => r.getLong(2))
    assert(got.toSeq === Seq(1L, 0L))
  }

  test("retentionCohorts: distinct-user offset counts per cohort day") {
    val ev = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L), (1L, 7L), // dup day rows collapse
      (2L, 0L), (2L, 2L),
      (3L, 1L), (3L, 2L)
    ).toDF("user_id", "day")
    val got = Funnel.retentionCohorts(ev, col("user_id"), col("day"),
        Seq(1, 7))
      .orderBy("cohort_day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, 1L),  // users 1,2; only user 1 at d1 and d7
      (1L, 1L, 1L, 0L))) // user 3; active at d1 (=day 2)
  }
}
