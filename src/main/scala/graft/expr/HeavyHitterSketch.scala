package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Misra-Gries heavy-hitter candidate sketch (SURVEY.md §2.13 UDAF
  * surface), as a typed `Aggregator` wired into DataFrames via
  * `functions.udaf`.
  *
  * The buffer holds at most k (item, weight) entries. `reduce` is the
  * classic MG step: increment a tracked item, insert while there's
  * room, otherwise decrement everything (dropping zeros) — O(k) only
  * when the buffer is full of strangers. `merge` sums the two buffers
  * and, if more than k entries survive, subtracts the (k+1)-largest
  * weight from all and drops the non-positive — the mergeable-summaries
  * construction (Agarwal et al., PODS'12), which keeps the MG
  * guarantee intact across partials.
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
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(a: Map[String, Long],
                     b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (item, w)) =>
      acc.updated(item, acc.getOrElse(item, 0L) + w)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-largest weight; at most k survive
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(k)
      summed.collect { case (item, w) if w > cut => item -> (w - cut) }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] =
    m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder()
}

object HeavyHitterSketch {
  /** Input encoder for `functions.udaf(new HeavyHitterSketch(k), encoder)`. */
  val inputEncoder: Encoder[String] = Encoders.STRING
}
