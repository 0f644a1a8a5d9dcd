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
}
