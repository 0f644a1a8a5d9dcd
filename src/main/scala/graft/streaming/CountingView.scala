package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

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
  *    keeping every value in state).
  *
  * Emissions are NOT monotone under deletes (a count can go down), so
  * the q120 "groupBy max over the update sink" trick cannot pick the
  * final view. Instead the state carries a per-key VERSION incremented
  * once per micro-batch that touches the key; the final view row per
  * key is the sink row with the max version — deterministic regardless
  * of how the sink interleaves updates.
  *
  * At stream scale: state is O(groups + live members), partitioned by
  * group key, RocksDB-backed; a TTL would bound quiet groups (NONE
  * here — harness streams are finite).
  */
object CountingView {

  case class DeltaIn(segment: String, custkey: Long, cents: Long, sign: Long)
  case class Scalars(n: Long, rev: Long, live: Long, version: Long)
  case class ViewOut(segment: String, version: Long, n_orders: Long,
                     rev_cents: Long, n_customers: Long)

  class Processor extends StatefulProcessor[String, DeltaIn, ViewOut] {
    @transient private var scalars: ValueState[Scalars] = _
    @transient private var support: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      scalars = getHandle.getValueState[Scalars]("scalars",
        Encoders.product[Scalars], TTLConfig.NONE)
      support = getHandle.getMapState[Long, Long]("support",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
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
      Iterator.single(ViewOut(key, s.version, s.n, s.rev, s.live))
    }
  }

  /** Wire the processor over a stream of signed (segment, custkey,
    * cents, sign) deltas.
    */
  def view(spark: SparkSession,
           deltas: Dataset[DeltaIn]): Dataset[ViewOut] = {
    import spark.implicits._
    deltas.groupByKey(_.segment)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
