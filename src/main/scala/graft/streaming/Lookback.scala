package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming semantics of the reference's scheduled 6-hour lookback
  * (SURVEY.md §2.10): every run re-reads an overlapping window, so the
  * stream is at-least-once; idempotency comes from the stable feature id
  * (`active911-<id>`, task.ts:215). In Structured Streaming that is
  * watermark + dropDuplicates on the id.
  */
object Lookback {

  /** Exactly-once-per-id view of an at-least-once stream: keep the first
    * arrival of each id, with state bounded by the watermark horizon.
    *
    * `dropDuplicatesWithinWatermark`, not `dropDuplicates`: plain
    * dropDuplicates only evicts dedup state when the watermark column is
    * part of the key — on the id alone its state grows forever (every id
    * ever seen), which is exactly what a 6-hour-lookback job running for
    * months must not do. The WithinWatermark variant evicts an id's
    * state once the watermark passes its event time + delay; redelivery
    * from the reference's overlapping windows (task.ts:134-135) always
    * lands inside that horizon, so the dedup is still exact for the
    * at-least-once pattern it exists to absorb.
    */
  def dedupById(stream: DataFrame, idCol: String, tsCol: String,
                watermark: String = "6 hours"): DataFrame =
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  /** Reference-equivalent batch predicate: the source-side 6-hour window
    * (`task.ts:134-135`) as a filter against a supplied "now".
    */
  def windowFilter(df: DataFrame, tsCol: String, nowMs: Long,
                   hours: Int = 6): DataFrame =
    df.filter(unix_millis(col(tsCol)) > nowMs - hours * 3600L * 1000
      && unix_millis(col(tsCol)) <= nowMs)
}
