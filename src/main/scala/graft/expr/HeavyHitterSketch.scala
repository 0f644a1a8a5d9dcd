package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitter candidate sketch (SURVEY.md §2.13 UDAF
  * surface), as a typed `Aggregator` wired into DataFrames via
  * `functions.udaf`.
  *
  * The buffer holds at most k (item, weight) entries in a MUTABLE hash
  * map updated in place: `reduce` runs once per input token, so an
  * immutable-Map buffer would allocate a path copy per row and rebuild
  * the whole map on every decrement — pure garbage churn on the 100 TB
  * hot path this sketch exists for. Spark's object-hash aggregation
  * keeps the buffer as a live object within a partition (Kryo-encoded
  * only on spill/shuffle of partials), so in-place mutation is the
  * intended usage, same as the built-in typed aggregators.
  *
  * `reduce` is the classic MG step: increment a tracked item, insert
  * while there's room, otherwise decrement everything in place
  * (removing zeros via the entry iterator) — O(k) only when the buffer
  * is full of strangers, allocation-free in every case. `merge` sums
  * the two buffers and, if more than k entries survive, subtracts the
  * (k+1)-largest weight from all and drops the non-positive — the
  * mergeable-summaries construction (Agarwal et al., PODS'12), which
  * keeps the MG guarantee intact across partials.
  *
  * Guarantee: every item with true frequency > n/(k+1) is in the
  * result, regardless of data order or merge shape. Surviving WEIGHTS
  * are order-dependent lower bounds, so [[finish]] returns candidate
  * items only; callers needing exact counts do the standard second
  * pass over the (≤ k) candidates — see the `q81` query. Per-group
  * state is O(k) on the map side, in the shuffle, and in the reducer:
  * finding the ~100 tokens that dominate a 100 TB corpus shuffles k
  * entries per partition instead of the full token histogram.
  */
class HeavyHitterSketch(k: Int)
    extends Aggregator[String, java.util.HashMap[String, java.lang.Long],
      Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  type Buf = java.util.HashMap[String, java.lang.Long]

  override def zero: Buf = new java.util.HashMap[String, java.lang.Long](k * 2)

  override def reduce(m: Buf, x: String): Buf = {
    val c = m.get(x)
    if (c != null) m.put(x, c + 1L)
    else if (m.size < k) m.put(x, 1L)
    else {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val w = e.getValue - 1L
        if (w <= 0L) it.remove() else e.setValue(w)
      }
    }
    m
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      val prev = a.get(e.getKey)
      a.put(e.getKey, if (prev == null) e.getValue else prev + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-largest weight; at most k survive
      val ws = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { ws(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val cut = ws(ws.length - (k + 1)) // (k+1)-largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val w = e.getValue - cut
        if (w <= 0L) it.remove() else e.setValue(w)
      }
    }
    a
  }

  override def finish(m: Buf): Seq[String] = {
    import scala.jdk.CollectionConverters._
    m.keySet().asScala.toSeq.sorted
  }

  /** Kryo: the buffer is a live JVM object inside a partition; encoding
    * happens only when partials spill or shuffle, where an opaque
    * binary blob is exactly right (the shuffle moves ≤ k entries).
    */
  override def bufferEncoder: Encoder[Buf] =
    Encoders.kryo[java.util.HashMap[String, java.lang.Long]]

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object HeavyHitterSketch {
  /** Input encoder for `functions.udaf(new HeavyHitterSketch(k), encoder)`. */
  val inputEncoder: Encoder[String] = Encoders.STRING
}
