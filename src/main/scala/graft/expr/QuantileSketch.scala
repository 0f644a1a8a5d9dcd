package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** KLL-style mergeable quantile sketch (SURVEY.md §2.13 UDAF surface,
  * r8) as a typed `Aggregator` — the second quantile sketch beside the
  * engine-native `percentile_approx` (q66), exposing the compactor
  * construction itself so its merge algebra is library surface, not a
  * black box.
  *
  * Structure (Karnin–Lang–Liberty, FOCS'16, simplified to uniform
  * compactor capacity — the MRL/Manku-style variant): level i holds
  * items of weight 2^i in an array list; when a level reaches capacity
  * k it is SORTED and every other item (alternating offset) promotes
  * to level i+1 at doubled weight — halving the level's footprint
  * while keeping each item's rank estimate unbiased up to the
  * alternation. The compaction offset alternates DETERMINISTICALLY per
  * (level, compaction count): reproducible within one aggregation
  * tree, while the rank-error CONTRACT (the q66 brackets) stays the
  * correctness story because Spark's merge order is not deterministic
  * anyway.
  *
  * `merge` concatenates level-wise then re-compacts — the mergeable-
  * summaries property that makes this a one-pass distributed
  * aggregate: partials of size O(k·log(n/k)) move through the shuffle
  * instead of the column. `finish` materializes the (value, weight)
  * pairs, sorts once (O(k·log n) items, driver-side model material),
  * and reads quantiles off the cumulative weight.
  *
  * Error: with uniform capacity k the rank error is
  * O(levels / k) · n — far inside the loose [p40,p60]/[p80,p95]
  * contract brackets at k=256 on every harness SF.
  */
class QuantileSketch(k: Int, qs: Seq[Double])
    extends Aggregator[Long, QuantileSketch.Buf, Seq[Long]] {
  require(k >= 8 && k % 2 == 0, s"capacity must be even and >= 8, got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))

  import QuantileSketch.Buf

  override def zero: Buf = new Buf

  private def compact(b: Buf, level: Int): Unit = {
    val src = b.levels.get(level)
    if (b.levels.size == level + 1) b.levels.add(new java.util.ArrayList[java.lang.Long])
    val dst = b.levels.get(level + 1)
    src.sort(java.util.Comparator.naturalOrder[java.lang.Long]())
    // deterministic alternating offset per (level, compaction count)
    val off = ((b.compactions + level) & 1L).toInt
    b.compactions += 1
    var i = off
    while (i < src.size) { dst.add(src.get(i)); i += 2 }
    src.clear()
    if (dst.size >= k) compact(b, level + 1)
  }

  override def reduce(b: Buf, x: Long): Buf = {
    b.levels.get(0).add(java.lang.Long.valueOf(x))
    b.n += 1
    if (b.levels.get(0).size >= k) compact(b, 0)
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var lvl = 0
    while (lvl < b.levels.size) {
      while (a.levels.size <= lvl) a.levels.add(new java.util.ArrayList[java.lang.Long])
      a.levels.get(lvl).addAll(b.levels.get(lvl))
      lvl += 1
    }
    a.n += b.n
    a.compactions += b.compactions
    lvl = 0
    while (lvl < a.levels.size) {
      if (a.levels.get(lvl).size >= k) compact(a, lvl)
      lvl += 1
    }
    a
  }

  override def finish(b: Buf): Seq[Long] = {
    if (b.n == 0L) return qs.map(_ => 0L)
    val items = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var lvl = 0
    while (lvl < b.levels.size) {
      val w = 1L << lvl
      val it = b.levels.get(lvl).iterator()
      while (it.hasNext) items += ((it.next().longValue(), w))
      lvl += 1
    }
    val sorted = items.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      var i = 0
      var out = sorted.last._1
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { out = sorted(i)._1; found = true }
        i += 1
      }
      out
    }
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object QuantileSketch {
  /** Mutable compactor stack; a live JVM object inside a partition
    * (Kryo-encoded only on spill/shuffle of partials, where an opaque
    * O(k·levels) blob is exactly right).
    */
  final class Buf extends Serializable {
    val levels = new java.util.ArrayList[java.util.ArrayList[java.lang.Long]]
    levels.add(new java.util.ArrayList[java.lang.Long])
    var n: Long = 0L
    var compactions: Long = 0L
  }

  /** Input encoder for `functions.udaf(new QuantileSketch(k, qs), encoder)`. */
  val inputEncoder: Encoder[Long] = Encoders.scalaLong
}
