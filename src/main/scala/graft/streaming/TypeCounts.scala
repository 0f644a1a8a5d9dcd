package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Per-(user, event_type) running aggregates on a `MapState` — the third
  * typed handle of the Spark 4 arbitrary-state API (SURVEY.md §2.10 T4:
  * ValueState = RunningTotals, ListState = RecentEvents, MapState =
  * here). The map key is the event type, so a user's state is ONE map of
  * O(#types) entries instead of #types separate grouping keys — the
  * layout you want when per-subkey updates arrive interleaved and the
  * subkey universe per user is small.
  *
  * Each micro-batch folds its rows into the touched map entries ONLY
  * (point reads/writes on the RocksDB-backed map — untouched types are
  * never deserialized, unlike a ValueState holding a whole Map) and
  * emits one Update-mode row per touched (user, type). Totals are exact
  * integer cents, so per-(user, type) emissions are monotone and the
  * batch-equality oracle reads the max.
  *
  * At stream scale state stays O(active users × active types), TTL
  * bounds quiet keys (NONE here — the harness stream is finite), and the
  * processor is partitioned by user like every other keyed state op.
  */
object TypeCounts {

  case class EventIn(user_id: Long, event_type: String, cents: Long)
  case class Acc(n: Long, cents: Long)
  case class Out(user_id: Long, event_type: String, n_events: Long,
                 total_cents: Long)

  class Processor extends StatefulProcessor[Long, EventIn, Out] {
    @transient private var state: MapState[String, Acc] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getMapState[String, Acc]("by_type",
        Encoders.STRING, Encoders.product[Acc], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[Out] = {
      // fold the batch locally, then ONE point write per touched type;
      // LinkedHashMap keeps emission order deterministic per batch
      val touched = scala.collection.mutable.LinkedHashMap[String, Acc]()
      rows.foreach { r =>
        val cur = touched.getOrElse(r.event_type,
          if (state.containsKey(r.event_type)) state.getValue(r.event_type)
          else Acc(0L, 0L))
        touched(r.event_type) = Acc(cur.n + 1L, cur.cents + r.cents)
      }
      touched.foreach { case (t, a) => state.updateValue(t, a) }
      touched.iterator.map { case (t, a) => Out(key, t, a.n, a.cents) }
    }
  }

  /** Wire the processor over a stream of (user_id, event_type, cents). */
  def counts(spark: SparkSession,
             events: Dataset[EventIn]): Dataset[Out] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
