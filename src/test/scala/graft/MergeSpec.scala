package graft

import org.apache.spark.sql.functions._

/** Pins graft.ops.Merge edge semantics the oracle query can't isolate:
  * unmatched U/D are no-ops, matched I behaves as update (upsert),
  * untouched base rows pass through.
  */
class MergeSpec extends SparkSpec {

  test("merge: all five MERGE branches") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("key", "v")
    val changes = Seq(
      (1L, "U", 5L),   // matched update: v += 5
      (2L, "D", 0L),   // matched delete
      (3L, "I", 99L),  // matched insert → upsert (update path)
      (4L, "U", 7L),   // unmatched update: no-op
      (5L, "D", 7L),   // unmatched delete: no-op
      (6L, "I", 60L)   // unmatched insert
    ).toDF("key", "op", "v")
    val out = graft.ops.Merge.merge(base, changes, "key", "op", Seq("v"),
        onUpdate = Map("v" -> (col("b.v") + col("c.v"))),
        onInsert = Map("v" -> col("c.v")))
      .orderBy(col("key"))
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 15L), (3L, 129L), (6L, 60L)))
  }

  test("merge: base rows without changes pass through unchanged") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("key", "v")
    val changes = Seq((9L, "I", 90L)).toDF("key", "op", "v")
    val out = graft.ops.Merge.merge(base, changes, "key", "op", Seq("v"),
        onUpdate = Map("v" -> col("c.v")),
        onInsert = Map("v" -> col("c.v")))
      .orderBy(col("key")).as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 10L), (2L, 20L), (9L, 90L)))
  }

  test("scd2: close+open on change, no-op on equal, insert, history untouched, idempotent") {
    import spark.implicits._
    def dim(rows: Seq[(Long, String, Long, Option[Long], Boolean)]) =
      rows.toDF("key", "segment", "valid_from", "valid_to", "is_current")
    val base = dim(Seq(
      (1L, "A", 1L, Some(2L), false), (1L, "B", 2L, None, true), // has history
      (2L, "C", 1L, None, true),                                 // will change
      (3L, "D", 1L, None, true)))                                // untouched
    val updates = Seq(
      (1L, "B"),   // same as current → no-op
      (2L, "X"),   // change → close + open
      (9L, "N")    // brand-new key
    ).toDF("key", "segment")
    def apply(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Merge.scd2(d, updates, "key", Seq("segment"), batchVer = 3L)
    val out = apply(base)
      .orderBy(col("key"), col("valid_from"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      (1L, "A", 1L, 2L, false),  // closed history passes through
      (1L, "B", 2L, -1L, true),  // no-op update: still open from v2
      (2L, "C", 1L, 3L, false),  // closed at this batch
      (2L, "X", 3L, -1L, true),  // new open version
      (3L, "D", 1L, -1L, true),  // untouched
      (9L, "N", 3L, -1L, true))) // insert
    // idempotency: re-applying the same batch changes nothing
    val twice = apply(apply(base))
      .orderBy(col("key"), col("valid_from"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSeq
    assert(twice == out)
  }

  test("scd2: duplicate key in the updates feed fails loudly, not silently fans out") {
    import spark.implicits._
    val base = Seq((1L, "A", 1L, Option.empty[Long], Some(true)))
      .toDF("key", "segment", "valid_from", "valid_to", "is_current")
    val dupUpdates = Seq((1L, "X"), (1L, "Y")).toDF("key", "segment")
    val e = intercept[Exception] {
      graft.ops.Merge.scd2(base, dupUpdates, "key", Seq("segment"), 2L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("duplicate key")), msgs(e).mkString("; "))
    // guard off: caller explicitly accepts the precondition
    val out = graft.ops.Merge.scd2(base, dupUpdates.limit(1), "key",
      Seq("segment"), 2L, requireUniqueKeys = false).collect()
    assert(out.length == 2) // closed A + opened X
  }

  test("scd2: rows with NULL is_current route to history passthrough, never vanish") {
    import spark.implicits._
    val base = Seq(
      (1L, "A", 1L, Option.empty[Long], Option.empty[Boolean]), // null flag
      (2L, "B", 1L, Option.empty[Long], Some(true))
    ).toDF("key", "segment", "valid_from", "valid_to", "is_current")
    val updates = Seq((2L, "B2")).toDF("key", "segment")
    val out = graft.ops.Merge.scd2(base, updates, "key", Seq("segment"), 9L)
      .orderBy(col("key"), col("valid_from"), col("segment"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // key 1 survives untouched (null flag = history), key 2 closed+opened
    assert(out.toSeq == Seq(1L -> "A", 2L -> "B", 2L -> "B2"))
  }
}
