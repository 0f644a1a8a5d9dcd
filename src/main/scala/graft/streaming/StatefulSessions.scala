package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10
  * T4): per-user sessionization that emits a summary row when a session
  * closes, keeping only (start, last, count) per live session in the
  * state store.
  *
  * This is the operator to reach for when `session_window` can't express
  * the semantics (emit-on-close with custom payload, caps on session
  * length, side outputs). State is O(active users), not O(events) — the
  * shape that survives unbounded streams.
  *
  * Timeouts are **event-time** (watermark-driven), not processing-time:
  * a session closes either when a later event from the same user arrives
  * past the gap, or when the watermark passes `last + gap`. This keeps
  * results deterministic on event time (replayable, no wall-clock
  * dependence) and — practically — keeps `processAllAvailable` usable:
  * with processing-time timeouts Spark schedules a new micro-batch every
  * trigger tick to re-evaluate timeouts, so a default-trigger query
  * busy-loops and never quiesces.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp)
  case class SessionState(startMs: Long, lastMs: Long, n: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)

  val GapMs: Long = 30L * 60 * 1000

  def update(userId: Long, events: Iterator[Event],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
    var out = List.empty[SessionOut]
    var cur = state.getOption
    // arrival order within a micro-batch is not guaranteed — sort by time
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastMs <= GapMs =>
          cur = Some(s.copy(lastMs = t, n = s.n + 1))
        case Some(s) =>
          out ::= SessionOut(userId, s.startMs, s.lastMs, s.n)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    if (state.hasTimedOut) {
      cur.foreach(s => out ::= SessionOut(userId, s.startMs, s.lastMs, s.n))
      state.remove()
    } else {
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes the inactivity horizon; guard
        // against a horizon already behind the watermark (late stragglers)
        val horizon = s.lastMs + GapMs
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(horizon, floor))
      }
    }
    out.reverseIterator
  }

  /** Wire the stateful sessionizer over a stream of (user_id, ts). The
    * watermark delay bounds both late data and state lifetime.
    */
  def sessions(spark: SparkSession, events: Dataset[Event],
               watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    import spark.implicits._
    events.withWatermark("ts", watermarkDelay)
      .as(Encoders.product[Event])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
