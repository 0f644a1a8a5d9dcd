package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming counting-maintenance view (r9, SURVEY §7.6 "streaming IVM
  * bridge") — q339's delete-capable join-view algebra re-expressed as a
  * `transformWithState` processor, so the SAME maintenance rules run
  * over a live stream of signed deltas instead of a staged batch:
  *
  *  - COUNT/SUM: the per-group scalars fold each row's sign (+1 insert,
  *    −1 delete) — O(1) per row, exactly the signed-partial merge;
  *  - exact COUNT DISTINCT: per-(group, member) SUPPORT counts live in
  *    a `MapState` (point reads/writes on touched members only — the
  *    RocksDB layout that never deserializes the untouched state); a
  *    member is live while support > 0, and the live count itself is
  *    maintained INCREMENTALLY in a `ValueState` on the 0↔positive
  *    transitions, so no batch ever iterates the map (iterating would
  *    be O(distinct) per batch — the scan the counting form exists to
  *    avoid);
  *  - MAX/MIN are deliberately ABSENT: they are not delta-maintainable
  *    under deletes (q339 re-derives them with a group-pruned base
  *    rescan — a batch move with no streaming analogue short of
  *    keeping every value in state; [[ExtremaView]] is that analogue,
  *    paying the value histogram).
  *
  * Emissions are NOT monotone under deletes (a count can go down), so
  * the q120 "groupBy max over the update sink" trick cannot pick the
  * final view. Instead the state carries a per-key VERSION incremented
  * once per micro-batch that touches the key; the final view row per
  * key is the sink row with the max version — deterministic regardless
  * of how the sink interleaves updates.
  *
  * At stream scale: state is O(groups + live members), partitioned by
  * group key, RocksDB-backed. With `ttlMs` (r12, VERDICT-r11 #5 — TTL
  * parity with [[ExtremaView]]): a group idle for `ttlMs` of
  * processing time is evicted WHOLE via a group-granular timer — its
  * support map is dropped, a tombstone row (zero counts, version
  * bumped) is emitted, and an O(1) scalar survives for version
  * continuity; a later delta revives the group from empty ("since the
  * last activity gap" scoping). Deliberately NOT per-item `TTLConfig`:
  * expiring individual support entries under a still-live group would
  * silently break the counting algebra (a dropped parked retraction
  * lets its late insert count a member live). Exact-forever semantics
  * = ttlMs None (the default).
  */
object CountingView {

  case class DeltaIn(segment: String, custkey: Long, cents: Long, sign: Long)
  case class Scalars(n: Long, rev: Long, live: Long, version: Long)
  case class ViewOut(segment: String, version: Long, n_orders: Long,
                     rev_cents: Long, n_customers: Long)
  /** Last-activity bookkeeping for the TTL variant: when the group was
    * last touched and its one live timer (deleted before re-arming —
    * leaked timers would fire eviction checks forever). Shared with
    * [[ExtremaView]].
    */
  case class TtlMeta(lastSeenMs: Long, timerMs: Long)

  class Processor(ttlMs: Option[Long] = None)
      extends StatefulProcessor[String, DeltaIn, ViewOut] {
    @transient private var scalars: ValueState[Scalars] = _
    @transient private var support: MapState[Long, Long] = _
    @transient private var ttlMeta: ValueState[TtlMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      scalars = getHandle.getValueState[Scalars]("scalars",
        Encoders.product[Scalars], TTLConfig.NONE)
      support = getHandle.getMapState[Long, Long]("support",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      if (ttlMs.isDefined)
        ttlMeta = getHandle.getValueState[TtlMeta]("ttlmeta",
          Encoders.product[TtlMeta], TTLConfig.NONE)
    }

    /** Idle-group eviction (r12, VERDICT-r11 #5): the group-granular
      * timer pattern proven on [[ExtremaView]] (which embeds this
      * counting algebra), ported to the standalone counting view so an
      * unbounded key universe no longer grows RocksDB forever. See
      * [[ExtremaView.Processor.handleExpiredTimer]] for why timers,
      * never per-item TTL.
      */
    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[ViewOut] =
      ttlMs match {
        case Some(t) if scalars.exists() =>
          val now = timerValues.getCurrentProcessingTimeInMs()
          val seen =
            if (ttlMeta.exists()) ttlMeta.get().lastSeenMs else Long.MinValue
          if (now >= seen + t) {
            val v = scalars.get().version + 1L
            support.clear(); ttlMeta.clear()
            scalars.update(Scalars(0L, 0L, 0L, v))
            Iterator.single(ViewOut(key, v, 0L, 0L, 0L))
          } else Iterator.empty
        case _ => Iterator.empty
      }

    override def handleInputRows(key: String, rows: Iterator[DeltaIn],
                                 timerValues: TimerValues): Iterator[ViewOut] = {
      var s = if (scalars.exists()) scalars.get()
              else Scalars(0L, 0L, 0L, 0L)
      // fold the batch locally per member, then one point write each
      val touched = scala.collection.mutable.LinkedHashMap[Long, Long]()
      rows.foreach { r =>
        s = s.copy(n = s.n + r.sign, rev = s.rev + r.sign * r.cents)
        val cur = touched.getOrElse(r.custkey,
          if (support.containsKey(r.custkey)) support.getValue(r.custkey)
          else 0L)
        touched(r.custkey) = cur + r.sign
      }
      touched.foreach { case (ck, sup) =>
        val before = if (support.containsKey(ck)) support.getValue(ck) else 0L
        // NEGATIVE supports are retained (ADVICE-r10): an out-of-order
        // retraction (delete arriving before its insert) parks the
        // member at −k; the late insert cancels back through 0 and the
        // entry is dropped exactly there. Dropping at ≤ 0 would forget
        // the pending retraction and let the late insert count the
        // member live. A member is LIVE only while support > 0.
        if (sup == 0L) { if (support.containsKey(ck)) support.removeKey(ck) }
        else support.updateValue(ck, sup)
        if (before > 0L && sup <= 0L) s = s.copy(live = s.live - 1L)
        else if (before <= 0L && sup > 0L) s = s.copy(live = s.live + 1L)
      }
      s = s.copy(version = s.version + 1L)
      scalars.update(s)
      // TTL variant: refresh the group's idle clock and re-arm its one
      // eviction timer (delete-before-register — one live timer per key)
      ttlMs.foreach { t =>
        val now = timerValues.getCurrentProcessingTimeInMs()
        if (ttlMeta.exists()) {
          val m = ttlMeta.get()
          if (m.timerMs > 0L) getHandle.deleteTimer(m.timerMs)
        }
        val horizon = now + t
        getHandle.registerTimer(horizon)
        ttlMeta.update(TtlMeta(now, horizon))
      }
      Iterator.single(ViewOut(key, s.version, s.n, s.rev, s.live))
    }
  }

  /** Wire the processor over a stream of signed (segment, custkey,
    * cents, sign) deltas. `ttlMs` opts into the group-granular idle
    * eviction lifecycle (see the class doc); None keeps exact-forever
    * semantics.
    */
  def view(spark: SparkSession, deltas: Dataset[DeltaIn],
           ttlMs: Option[Long] = None): Dataset[ViewOut] = {
    import spark.implicits._
    val timeMode =
      if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    deltas.groupByKey(_.segment)
      .transformWithState(new Processor(ttlMs), timeMode,
        OutputMode.Update())
  }
}
