package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.util.LongAccumulator

/** Delete-capable streaming IVM WITH extrema (r10, VERDICT-r9 #6) —
  * [[CountingView]]'s counting algebra composed with q347's
  * support-at-extremum trigger inside one `transformWithState`
  * processor, so the streaming MV matches the batch MV under mixed
  * insert+delete batches INCLUDING max/min. q341 deliberately omitted
  * extrema ("not delta-maintainable under deletes — a stream has no
  * base to rescan"); this processor supplies the missing base: a
  * per-group VALUE HISTOGRAM (`MapState[cents, liveCount]`) — the
  * O(distinct values) state a retractable extremum fundamentally
  * needs (Flink's retract-max keeps the same multiset; with only
  * (extreme, support) stored, a delete of the last extreme row is
  * unanswerable). The q347 discipline decides when that histogram is
  * ever ITERATED:
  *
  *  - inserts fold: `mx = max(mx, v)` with support bumped on equality
  *    — O(1), MAX is monotone under inserts;
  *  - deletes at the stored extreme decrement its support; everything
  *    else is point histogram writes;
  *  - ONLY when a batch exhausts the support at the stored extreme
  *    does the processor scan the histogram keys for the new extreme —
  *    the streaming analogue of q347's group-pruned base rescan, and
  *    the trigger is the same minimality argument: any weaker
  *    condition misses a true extremum move, any stronger one scans a
  *    histogram whose stored value is still certified by a survivor.
  *
  * A retraction storm away from the extremum therefore costs ZERO
  * histogram scans — pinned by StatefulStreamSpec via the injected
  * `rescans` accumulator (tasks merge it back to the driver; in a
  * cluster this is the same observability a Spark metric gives).
  *
  * State per group: scalars + live-member support map (CountingView's)
  * + the value histogram — O(groups + members + distinct values),
  * RocksDB-backed, point reads/writes on touched entries only.
  * Emissions are versioned like CountingView (a count can go down, so
  * the final view row per key is max version, never a monotone fold).
  * A group whose post-batch count is zero emits n_orders = 0 with
  * None extrema — the reader filters it out, matching q347's
  * "emptied group vanishes" batch semantics.
  */
object ExtremaView {

  case class Scalars(n: Long, rev: Long, live: Long, version: Long,
                     mx: Long, mxSup: Long, mn: Long, mnSup: Long)
  case class ViewOut(segment: String, version: Long, n_orders: Long,
                     rev_cents: Long, n_customers: Long,
                     max_cents: Option[Long], min_cents: Option[Long])
  /** Last-activity bookkeeping for the TTL variant: when the group was
    * last touched and its one live timer (deleted before re-arming —
    * leaked timers would fire eviction checks forever).
    */
  case class TtlMeta(lastSeenMs: Long, timerMs: Long)

  class Processor(rescans: Option[LongAccumulator],
                  ttlMs: Option[Long] = None)
      extends StatefulProcessor[String, CountingView.DeltaIn, ViewOut] {
    @transient private var scalars: ValueState[Scalars] = _
    @transient private var support: MapState[Long, Long] = _
    @transient private var hist: MapState[Long, Long] = _
    @transient private var ttlMeta: ValueState[TtlMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      scalars = getHandle.getValueState[Scalars]("scalars",
        Encoders.product[Scalars], TTLConfig.NONE)
      support = getHandle.getMapState[Long, Long]("support",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      hist = getHandle.getMapState[Long, Long]("hist",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      if (ttlMs.isDefined)
        ttlMeta = getHandle.getValueState[TtlMeta]("ttlmeta",
          Encoders.product[TtlMeta], TTLConfig.NONE)
    }

    /** Idle-group eviction (r11, VERDICT-r10 #5). Deliberately NOT the
      * per-item `TTLConfig` channel: item-level TTL expires individual
      * map entries under a still-live group, which silently breaks the
      * counting algebra (an expired histogram entry at the max makes a
      * later rescan wrong with no error). Group-granular timers keep
      * the algebra intact: either ALL of a group's derivation state is
      * live, or the group was evicted WHOLE and its next delta
      * re-derives from empty (the `revived` path — which rescans, so
      * extrema stay exact over the post-revival multiset). An O(1)
      * scalar tombstone is retained per evicted group so the reader's
      * max-version rule keeps working across eviction and revival; the
      * O(members + distinct values) map state — the part that grows —
      * is dropped.
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
            support.clear(); hist.clear(); ttlMeta.clear()
            scalars.update(Scalars(0L, 0L, 0L, v,
              Long.MinValue, 0L, Long.MaxValue, 0L))
            Iterator.single(ViewOut(key, v, 0L, 0L, 0L, None, None))
          } else Iterator.empty
        case _ => Iterator.empty
      }

    override def handleInputRows(key: String,
                                 rows: Iterator[CountingView.DeltaIn],
                                 timerValues: TimerValues): Iterator[ViewOut] = {
      val hadState = scalars.exists()
      var s = if (hadState) scalars.get()
              else Scalars(0L, 0L, 0L, 0L,
                Long.MinValue, 0L, Long.MaxValue, 0L)
      // a group coming back from the emptied/inverted state (prior
      // n ≤ 0) has SENTINEL extrema but possibly NONEMPTY histogram
      // (parked out-of-order retractions, or positives cancelled only
      // in aggregate) — its extrema must be re-derived by scan, the
      // insert fold alone could miss a leftover positive entry. A
      // brand-new group (no state) has an empty histogram, so the
      // fold + support check is sound without a scan.
      val revived = hadState && s.n <= 0L
      // fold the batch locally per member / per value, then one point
      // write each (the CountingView discipline: never iterate state
      // for a batch)
      val touched = scala.collection.mutable.LinkedHashMap[Long, Long]()
      val histTouched = scala.collection.mutable.LinkedHashMap[Long, Long]()
      var insMax = Long.MinValue
      var insMin = Long.MaxValue
      rows.foreach { r =>
        s = s.copy(n = s.n + r.sign, rev = s.rev + r.sign * r.cents)
        val cur = touched.getOrElse(r.custkey,
          if (support.containsKey(r.custkey)) support.getValue(r.custkey)
          else 0L)
        touched(r.custkey) = cur + r.sign
        val hc = histTouched.getOrElse(r.cents,
          if (hist.containsKey(r.cents)) hist.getValue(r.cents) else 0L)
        histTouched(r.cents) = hc + r.sign
        if (r.sign > 0L) {
          if (r.cents > insMax) insMax = r.cents
          if (r.cents < insMin) insMin = r.cents
        }
      }
      touched.foreach { case (ck, sup) =>
        val before = if (support.containsKey(ck)) support.getValue(ck) else 0L
        // NEGATIVE counts are retained (ADVICE-r10, here and in hist
        // below): an out-of-order retraction (delete arriving before
        // its insert) parks the entry at −k; the late insert cancels
        // back through 0 and the entry is dropped exactly there.
        // Dropping at ≤ 0 would forget the pending retraction — the
        // late insert would then restart from 0 and live counts /
        // extrema would silently diverge from scalars.n. A member is
        // LIVE (a value PRESENT) only while its count > 0.
        if (sup == 0L) { if (support.containsKey(ck)) support.removeKey(ck) }
        else support.updateValue(ck, sup)
        if (before > 0L && sup <= 0L) s = s.copy(live = s.live - 1L)
        else if (before <= 0L && sup > 0L) s = s.copy(live = s.live + 1L)
      }
      histTouched.foreach { case (v, c) =>
        if (c == 0L) { if (hist.containsKey(v)) hist.removeKey(v) }
        else hist.updateValue(v, c)
      }
      // extrema: insert fold first (monotone), then the q347 trigger —
      // rescan the histogram ONLY if the stored extreme's support is
      // exhausted after this batch's deltas at that value
      def supAt(v: Long): Long =
        histTouched.getOrElse(v,
          if (hist.containsKey(v)) hist.getValue(v) else 0L)
      if (s.n <= 0L) {
        // emptied group: no extrema exist; reset to the empty sentinel.
        // No scan here — the histogram may be nonempty (parked
        // retractions), but nothing is emitted for it, and the revival
        // path above forces the scan when the group comes back.
        s = s.copy(mx = Long.MinValue, mxSup = 0L,
          mn = Long.MaxValue, mnSup = 0L)
      } else {
        // MAX side — fold + trigger are the shared algebra
        // (ops.ExtremaIvm, r12: one module with the q339/q347 batch
        // derivation; ExtremaIvmSpec pins batch ≡ scalar)
        val mxCand = graft.ops.ExtremaIvm.foldMax(s.mx, insMax)
        if (!graft.ops.ExtremaIvm.rescanNeeded(supAt(mxCand), revived)) {
          s = s.copy(mx = mxCand, mxSup = supAt(mxCand))
        } else {
          // support at the stored (insert-folded) max exhausted —
          // the ONE case that reads the histogram. Only count > 0
          // entries are PRESENT values (negative entries are parked
          // out-of-order retractions, see the persist fold above).
          rescans.foreach(_.add(1L))
          var bm = Long.MinValue
          hist.iterator().foreach { case (v, c) =>
            if (c > 0L && v > bm) bm = v
          }
          s = s.copy(mx = bm, mxSup = supAt(bm))
        }
        // MIN side (mirror)
        val mnCand = graft.ops.ExtremaIvm.foldMin(s.mn, insMin)
        if (!graft.ops.ExtremaIvm.rescanNeeded(supAt(mnCand), revived)) {
          s = s.copy(mn = mnCand, mnSup = supAt(mnCand))
        } else {
          rescans.foreach(_.add(1L))
          var bm = Long.MaxValue
          hist.iterator().foreach { case (v, c) =>
            if (c > 0L && v < bm) bm = v
          }
          s = s.copy(mn = bm, mnSup = supAt(bm))
        }
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
      Iterator.single(ViewOut(key, s.version, s.n, s.rev, s.live,
        if (s.n > 0L) Some(s.mx) else None,
        if (s.n > 0L) Some(s.mn) else None))
    }
  }

  /** Wire the processor over a stream of signed (segment, custkey,
    * cents, sign) deltas — [[CountingView.view]]'s contract plus
    * retractable extrema.
    *
    * Well-formedness contract (ADVICE-r10): the delta stream must be
    * well-formed IN AGGREGATE — every delete is matched by an insert of
    * the same (segment, custkey, cents), but the delete MAY arrive
    * first. Out-of-order retractions park as negative counts in state
    * and cancel exactly when the matching insert lands; once the stream
    * is drained the view equals the batch MV over the net multiset.
    * DURING an inversion window, emissions reflect the signed algebra
    * (e.g. a group whose net count dips ≤ 0 emits n_orders ≤ 0 with
    * None extrema and is filtered by the reader); a delete with NO
    * matching insert ever is outside the contract and leaves the parked
    * entry in state permanently.
    *
    * State-lifecycle contract with `ttlMs` (r11, VERDICT-r10 #5): a
    * group idle for `ttlMs` of PROCESSING time is evicted WHOLE — its
    * support map and value histogram are dropped, a tombstone row
    * (n_orders = 0, None extrema, version bumped) is emitted, and only
    * an O(1) scalar survives for version continuity. A later delta
    * REVIVES the group from empty: the view becomes "since the last
    * activity gap", the streaming-native scoping for unbounded key
    * universes (a pure stream has no base to re-derive evicted history
    * from). Exact-forever semantics = ttlMs None (the default).
    * Eviction is timer-driven at group granularity, never per-item
    * TTL — see [[Processor.handleExpiredTimer]] for why.
    */
  def view(spark: SparkSession, deltas: Dataset[CountingView.DeltaIn],
           rescans: Option[LongAccumulator] = None,
           ttlMs: Option[Long] = None): Dataset[ViewOut] = {
    import spark.implicits._
    val timeMode =
      if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    deltas.groupByKey(_.segment)
      .transformWithState(new Processor(rescans, ttlMs), timeMode,
        OutputMode.Update())
  }
}
