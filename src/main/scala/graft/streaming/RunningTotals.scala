package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-key running totals on the Spark 4 arbitrary-state API
  * (`transformWithState` + `StatefulProcessor` — the successor to
  * `flatMapGroupsWithState`, SURVEY.md §2.10 T4): typed named state
  * handles, explicit TTL config, and timer support, backed by the
  * RocksDB state store.
  *
  * State is ONE (count, cents) pair per key — O(active keys), the shape
  * that survives unbounded streams; each micro-batch folds its rows into
  * the pair and emits the key's updated running total (Update mode).
  * Totals are exact integer cents, so emissions are monotone per key —
  * the final value per key is the max, which is what the batch-equality
  * oracle reads.
  *
  * At 100 TB-of-stream scale the same processor runs unchanged: state is
  * keyed and partitioned by the grouping key, RocksDB spills it off-heap,
  * and a TTL (here NONE — the harness stream is finite) bounds lifetime
  * for keys that go quiet.
  */
object RunningTotals {

  case class EventIn(user_id: Long, cents: Long)
  case class Totals(n: Long, cents: Long)
  case class TotalsOut(user_id: Long, n_events: Long, total_cents: Long)

  class Processor extends StatefulProcessor[Long, EventIn, TotalsOut] {
    @transient private var state: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[TotalsOut] = {
      var s = if (state.exists()) state.get() else Totals(0L, 0L)
      rows.foreach(r => s = Totals(s.n + 1L, s.cents + r.cents))
      state.update(s)
      Iterator.single(TotalsOut(key, s.n, s.cents))
    }
  }

  /** Wire the processor over a stream of (user_id, cents). */
  def totals(spark: SparkSession, events: Dataset[EventIn]): Dataset[TotalsOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
