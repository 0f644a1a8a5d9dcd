package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Graft.table
import graft.ops.AsOf

/** Advanced operator coverage: as-of join, range/band join, cube &
  * grouping sets, approximate distinct, and a Structured-Streaming-
  * executed aggregation whose result is checked against a batch SQL
  * oracle (SURVEY.md §2.4 J3, §2.6 A4, §2.10).
  */
object Advanced {

  private def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase matched to the user's most recent prior
    // (or simultaneous) click — union+window plan, single shuffle.
    "q27_asof_join" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("us"))
      AsOf.asofJoin(purchases, clicks, keyCol = "user_id", timeCol = "us",
          tieCol = "event_id", rightTieCol = "click_id",
          valueCols = Map("click_id" -> "prior_click_id"))
        .select(col("event_id"), col("user_id"), col("prior_click_id"))
        .orderBy(col("event_id"))
    }),

    // Band/range join: lineitem prices against a broadcast band dim.
    "q28_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("p0_20k", 0.0, 20000.0), ("p20_40k", 20000.0, 40000.0),
        ("p40_60k", 40000.0, 60000.0), ("p60_80k", 60000.0, 80000.0),
        ("p80k_up", 80000.0, 1e12)).toDF("band", "lo", "hi")
      AsOf.bandJoin(table(s, d, "lineitem"), bands, col("l_extendedprice"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
        .orderBy(col("band"))
    }),

    // CUBE with grouping-id (all four grouping-set combinations).
    "q17_cube" -> ((s, d) => {
      table(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Approximate distinct (HLL++) vs exact — rows-only entry (approx
    // algorithms differ across engines by design); the spec asserts the
    // relative error bound.
    "q43_approx_distinct" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .withColumn("rel_err",
          round(abs(col("approx") - col("exact")) / col("exact"), 3))
        .orderBy(col("l_returnflag"))
    }),

    // Tumbling-window aggregation executed through Structured Streaming
    // (AvailableNow over the parquet dir, memory sink), oracle-checked
    // against the equivalent batch SQL — proves the streaming engine
    // computes the same answer the SQL semantics demand (SURVEY.md §2.10).
    "q52_stream_window_agg" -> ((s, d) => {
      val name = "stream_agg_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val schema = table(s, d, "events").schema
      // state-store count is fixed at query start from shuffle.partitions;
      // size it to the state's cardinality (a few hundred window×type
      // groups), not the relational default — every store is a per-batch
      // commit (and at scale, a per-batch snapshot upload)
      val prevParts = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      try {
      // file-stream sources watch a directory — stage the single parquet
      // file into one (in production this IS a directory of arriving files)
      val stage = java.nio.file.Files.createTempDirectory("graft_stream_")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$d/events.parquet"),
        stage.resolve("events.parquet"))
      val stream = s.readStream.schema(schema)
        .parquet(stage.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      val q = stream.writeStream.outputMode("complete")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(name)
        .select(unix_micros(col("window.start")).as("win_start_us"),
          col("event_type"), col("n"), col("cents"))
        .orderBy(col("win_start_us"), col("event_type"))
      } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    }))

  val oracles: Map[String, String] = Map(
    "q27_asof_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events),
         u AS (
           SELECT event_id, user_id, us, 1 AS side, NULL::BIGINT AS click_id
           FROM ev WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, us, 0 AS side, event_id AS click_id
           FROM ev WHERE event_type = 'click'),
         c AS (
           SELECT event_id, user_id, side,
             last_value(CASE WHEN side = 0 THEN click_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS prior_click_id
           FROM u)
         SELECT event_id, user_id, prior_click_id
         FROM c WHERE side = 1 ORDER BY event_id""",
    "q28_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
           ('p0_20k', 0.0, 20000.0), ('p20_40k', 20000.0, 40000.0),
           ('p40_60k', 40000.0, 60000.0), ('p60_80k', 60000.0, 80000.0),
           ('p80k_up', 80000.0, 1e12))
         SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
         FROM lineitem JOIN bands
           ON l_extendedprice >= lo AND l_extendedprice < hi
         GROUP BY band ORDER BY band""",
    "q17_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         coalesce(l_linestatus, '(all)') AS linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q52_stream_window_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS win_start_us, event_type,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY win_start_us, event_type
         ORDER BY win_start_us, event_type""")
}
