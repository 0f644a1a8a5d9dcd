package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Sessionization on `transformWithState` with EVENT-TIME TIMERS — the
  * last piece of the Spark 4 arbitrary-state API after the typed state
  * handles (SURVEY.md §2.10 T4: ValueState/ListState/MapState are
  * q120/q132/q168; timers are here): a session closes either when a
  * later event from the same user arrives past the 30-min gap, or when
  * the registered timer fires because the watermark passed
  * `last + gap`. Same semantics as the `flatMapGroupsWithState` version
  * ([[StatefulSessions]]) — this is the successor API's spelling, with
  * the timeout turned into an explicit registered timer instead of the
  * GroupState timeout channel.
  *
  * Timer discipline: exactly ONE live timer per key (the previous one
  * is deleted before registering the new horizon — leaked timers would
  * fire on stale sessions); the horizon is floored at watermark+1 so a
  * straggler-extended session still gets a valid future timer. State is
  * O(active users); emissions are Append-mode closed-session rows, so
  * the sink never sees a live session.
  */
object TimedSessions {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(startMs: Long, lastMs: Long, n: Long,
                          timerMs: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
                        n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  class Processor extends StatefulProcessor[Long, Event, SessionOut] {
    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      var out = List.empty[SessionOut]
      var cur = if (state.exists()) Option(state.get()) else None
      val prevTimer = cur.map(_.timerMs).getOrElse(0L)
      // arrival order within a micro-batch is not guaranteed — sort
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastMs <= GapMs =>
            cur = Some(s.copy(lastMs = t, n = s.n + 1))
          case Some(s) =>
            out ::= SessionOut(key, s.startMs, s.lastMs, s.n)
            cur = Some(SessionState(t, t, 1L, 0L))
          case None =>
            cur = Some(SessionState(t, t, 1L, 0L))
        }
      }
      cur.foreach { s =>
        if (prevTimer > 0L) getHandle.deleteTimer(prevTimer)
        val horizon = math.max(s.lastMs + GapMs,
          timerValues.getCurrentWatermarkInMs() + 1)
        getHandle.registerTimer(horizon)
        state.update(s.copy(timerMs = horizon))
      }
      out.reverseIterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      if (state.exists()) {
        val s = state.get()
        state.clear()
        Iterator.single(SessionOut(key, s.startMs, s.lastMs, s.n))
      } else Iterator.empty
  }

  /** Wire the timer-driven sessionizer over a stream of (user_id, ts).
    * The watermark delay bounds late data, state lifetime, AND timer
    * latency — all three ride the same event-time clock.
    */
  def sessions(spark: SparkSession, events: Dataset[Event],
               watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.EventTime(),
        OutputMode.Append())
  }
}
