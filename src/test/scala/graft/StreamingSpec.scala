package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Lookback

/** Streaming semantics (SURVEY.md §2.10): overlapping lookback windows
  * re-deliver alerts; watermark + dropDuplicates yields one row per id.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("overlapping redelivery deduped by id within watermark (T2)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp)]
    val deduped = Lookback.dedupById(
      mem.toDF.toDF("id", "ts"), "id", "ts", "6 hours")
    val name = "dedup_out_" + java.util.UUID.randomUUID.toString.replace("-", "")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      def ts(h: Int, m: Int) = Timestamp.valueOf(f"2025-12-08 $h%02d:$m%02d:00")
      // batch 1: the 6h window [06:00, 12:00]
      mem.addData(("a", ts(10, 0)), ("b", ts(11, 0)))
      q.processAllAvailable()
      // batch 2: overlapping window [07:00, 13:00] re-delivers a & b
      mem.addData(("a", ts(10, 0)), ("b", ts(11, 0)), ("c", ts(12, 30)))
      q.processAllAvailable()
      val out = spark.table(name).collect().map(_.getString(0)).sorted
      assert(out.toSeq == Seq("a", "b", "c")) // each id exactly once
    } finally q.stop()
  }

  test("window filter replicates the 6h lookback predicate (task.ts:134-135)") {
    val now = Timestamp.valueOf("2025-12-08 12:00:00").getTime
    val df = Seq(
      ("in", Timestamp.valueOf("2025-12-08 07:00:00")),
      ("edge_now", Timestamp.valueOf("2025-12-08 12:00:00")),
      ("edge_from", Timestamp.valueOf("2025-12-08 06:00:00")),
      ("old", Timestamp.valueOf("2025-12-08 05:59:59")),
      ("future_out", Timestamp.valueOf("2025-12-08 12:00:01"))).toDF("id", "ts")
    val kept = Lookback.windowFilter(df, "ts", now)
      .collect().map(_.getString(0)).toSet
    assert(kept == Set("in", "edge_now")) // half-open (now-6h, now]
  }
}
