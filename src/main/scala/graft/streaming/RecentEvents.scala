package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-key bounded recent-event history on the Spark 4 arbitrary-state
  * API — the `ListState` surface (`RunningTotals` covers `ValueState`):
  * each key keeps its K most recent (time, tie, type) observations, the
  * feature-store shape behind "last K actions" model inputs.
  *
  * Determinism discipline: rows arrive in ARBITRARY order within a
  * micro-batch (shuffle order, not event order), so the processor sorts
  * the batch's rows together with the retained history by (us, event_id)
  * before trimming to K — the result is the same K rows any ordering of
  * the input would produce, which is what lets a batch oracle replay it
  * with a window. State is ≤K tuples per key (O(active keys · K)),
  * RocksDB-backed, TTL-boundable for keys that go quiet.
  */
object RecentEvents {

  case class EventIn(user_id: Long, us: Long, event_id: Long, event_type: String)
  case class Obs(us: Long, event_id: Long, event_type: String)
  case class RecentOut(user_id: Long, n_total: Long, recent: String)

  /** Two named state handles per key: the bounded observation list and
    * a monotone seen-counter (`ValueState`) — the counter versions the
    * emissions, so a consumer collapsing multiple micro-batch updates
    * keeps the one with max n_total (see q132's max_by).
    */
  class Processor(k: Int) extends StatefulProcessor[Long, EventIn, RecentOut] {
    @transient private var state: ListState[Obs] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      state = getHandle.getListState[Obs]("recent",
        Encoders.product[Obs], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
                                 timerValues: TimerValues): Iterator[RecentOut] = {
      val batch = rows.map(r => Obs(r.us, r.event_id, r.event_type)).toSeq
      val merged = (state.get().toSeq ++ batch)
        .sortBy(o => (o.us, o.event_id))
        .takeRight(k)
      state.clear()
      state.appendList(merged.toArray)
      val n = (if (seen.exists()) seen.get() else 0L) + batch.size
      seen.update(n)
      // newest first in the emitted feature string
      Iterator.single(RecentOut(key, n,
        merged.reverse.map(_.event_type).mkString(",")))
    }
  }

  /** Wire the processor over a stream of events; emits each key's
    * recent-k feature string after every micro-batch (Update mode).
    */
  def recent(spark: SparkSession, events: Dataset[EventIn],
             k: Int): Dataset[RecentOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor(k), TimeMode.None(), OutputMode.Update())
  }
}
