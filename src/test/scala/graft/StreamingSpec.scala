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

  test("checkpoint restart: committed files never reprocess, dedup state survives") {
    // The recovery contract a 24/7 ingest relies on: a query restarted
    // from its checkpoint (a) skips files already committed, (b) resumes
    // dropDuplicates state so duplicates arriving AFTER the restart are
    // still suppressed, (c) the append-mode file sink stays exactly-once.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt_")
    val (in, out, cp) = (s"$root/in", s"$root/out", s"$root/cp")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    try {
      import s.implicits._
      def writeBatch(ids: Range, tag: String): Unit =
        ids.map(i => (i.toLong, tag)).toDF("id", "tag")
          .coalesce(1).write.mode("append").parquet(in)
      def runOnce(): Unit = {
        val q = s.readStream
          .schema("id LONG, tag STRING").parquet(in)
          .dropDuplicates("id")
          .writeStream.outputMode("append").format("parquet")
          .option("path", out).option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      writeBatch(1 to 5, "run1")
      runOnce()
      val first = s.read.parquet(out).collect()
      assert(first.map(_.getLong(0)).sorted.toSeq == (1L to 5L))
      // ids 4,5 are REDELIVERED in a new file after the restart
      writeBatch(4 to 8, "run2")
      runOnce()
      val rows = s.read.parquet(out).collect()
        .map(r => r.getLong(0) -> r.getString(1))
      assert(rows.map(_._1).sorted.toSeq == (1L to 8L),
        s"each id exactly once, got ${rows.sortBy(_._1).mkString(",")}")
      // survivors of the redelivered ids kept their FIRST delivery
      assert(rows.toMap.apply(4L) == "run1" && rows.toMap.apply(5L) == "run1")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
