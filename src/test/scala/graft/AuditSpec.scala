package graft

import org.apache.spark.sql.functions._

import graft.ops.Audit

/** Pins ops.Audit: fused constraint-suite metrics on constructed rows,
  * the one-scan plan shape, anti-join referential integrity, and the
  * null-safe snapshot diff.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  test("tableAudit: exact metrics, passing and failing checks") {
    val df = Seq(
      (1L, 1, Some("A"), Some(5.0)),
      (1L, 1, Some("A"), Some(5.0)),   // duplicate key
      (2L, 1, Some("Z"), Some(99.0)),  // bad accepted value, out of bounds
      (3L, 1, None, None)              // null flag (counts for accepted too)
    ).toDF("k1", "k2", "flag", "qty")
    val got = Audit.tableAudit(df, uniqueKey = Seq("k1", "k2"),
        notNull = Seq("flag"),
        accepted = Map("flag" -> Seq("A", "B")),
        bounds = Map("qty" -> (0.0, 10.0)))
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == Set(
      ("row_count", "*", 4.0, true),
      ("unique_key", "k1,k2", 1.0, false),   // 4 rows, 3 distinct keys
      ("not_null", "flag", 1.0, false),
      ("accepted_values", "flag", 2.0, false), // 'Z' + null
      ("bounds", "qty", 2.0, false)))          // 99.0 + null
  }

  test("tableAudit: the whole suite is ONE scan of the input") {
    val docs = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val plan = Audit.tableAudit(docs, uniqueKey = Seq("doc_id"),
        notNull = Seq("text", "lang"),
        bounds = Map("n_chars" -> (0.0, 1e9)))
      .queryExecution.executedPlan.toString
    assert(plan.split("Scan parquet").length - 1 == 1, s"expected 1 scan:\n$plan")
  }

  test("refIntegrity: counts orphan child rows") {
    val child = Seq(1L, 2L, 2L, 9L).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Audit.refIntegrity(child, "fk", parent, "pk", "ri").collect().head
    assert(r.getDouble(2) == 1.0 && !r.getBoolean(3))
  }

  test("snapshotDiff: added/removed/changed/unchanged with null-safe flags") {
    val o = Seq((1L, Some(10L), Some("a")), (2L, Some(20L), Some("b")),
      (3L, Some(30L), None), (4L, Some(40L), Some("d"))).toDF("k", "v", "s")
    val n = Seq((1L, Some(10L), Some("a")),            // unchanged
      (3L, Some(30L), Some("c")),                       // null→value = changed
      (4L, None, Some("d")),                            // value→null = changed
      (5L, Some(50L), Some("e"))                        // added
    ).toDF("k", "v", "s")                               // key 2 removed
    val rows = Audit.snapshotDiff(o, n, "k", Seq("v", "s"))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    assert(rows(1L) == (("unchanged", 0, 0)))
    assert(rows(2L) == (("removed", 0, 0)))
    assert(rows(3L) == (("changed", 0, 1)))
    assert(rows(4L) == (("changed", 1, 0)))
    assert(rows(5L) == (("added", 0, 0)))
  }
}
