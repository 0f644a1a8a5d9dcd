package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** t-digest mergeable quantile sketch (SURVEY §2.13 UDAF surface, r9)
  * — the TAIL-ACCURATE counterpart to the uniform-error KLL compactor
  * (expr/QuantileSketch, q337): centroid capacity follows the k1
  * (arcsine) scale function k(q) = δ/2π · asin(2q−1), so a centroid
  * near the median may hold ~π·n/δ points while centroids at the
  * extremes shrink toward singletons — rank error ∝ √(q(1−q)), the
  * error shape you want for p99/p999 SLO work where KLL's uniform
  * guarantee overspends in the middle and underspends in the tails.
  * "Pick your sketch by error shape" is the library story: KLL for
  * uniform rank error, t-digest for tails.
  *
  * Construction (Dunning & Ertl's merging variant, from the published
  * algorithm): raw values buffer unsorted; at capacity the buffer and
  * the existing centroid list are SORTED BY MEAN and re-merged in one
  * greedy pass — a running centroid absorbs its successor while the
  * merged weight stays inside the k-limit (the cumulative-q window
  * where k advances by ≤ 1). `merge` concatenates centroid lists +
  * buffers and re-compresses: mergeable summaries, O(δ) partials
  * through the shuffle. The SIZE INVARIANT — every multi-point
  * centroid spans ≤ 1 k-unit — survives any merge shape and is what
  * the spec pins; the VALUES are merge-order-sensitive (t-digest is
  * not a deterministic summary, unlike a sorted exact list), so query
  * contracts use rank BRACKETS (q66/q337's stance), never exact
  * values.
  *
  * `finish` reads quantiles off the cumulative weight without
  * interpolation (the KLL read): the returned value is some input
  * value whose rank differs from the target by at most the covering
  * centroid's weight — ≤ n·2π√(q(1−q))/δ + 1, e.g. δ=200 ⇒ ~1.6% of
  * n at the median and ~0.3% at p99.
  */
class TDigest(delta: Double, qs: Seq[Double])
    extends Aggregator[Double, TDigest.Buf, Seq[Double]] {
  require(delta >= 20.0, s"compression must be >= 20, got $delta")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0))

  import TDigest.{Buf, BUFFER_CAP}

  override def zero: Buf = new Buf

  private def kOf(q: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(math.max(-1.0, math.min(1.0, 2.0 * q - 1.0)))
  private def qOf(k: Double): Double =
    (math.sin(math.max(-delta / 4.0, math.min(delta / 4.0, k))
      * 2.0 * math.Pi / delta) + 1.0) / 2.0

  /** Sort centroids + buffer by (mean, weight) and re-merge greedily
    * under the k1 limit. Deterministic given the input multiset; the
    * multiset itself depends on merge order, hence the bracket
    * contracts.
    */
  private[graft] def compress(b: Buf): Unit = {
    val m = b.means
    val w = b.weights
    val nc = b.nCentroids
    // a clean state (no raw buffer, not a post-merge concatenation,
    // already within budget) is a valid sorted digest — skip; `dirty`
    // matters because a merge-append is NOT sorted by mean and must
    // always re-merge before any cumulative-weight read
    if (b.bufN == 0 && !b.dirty && nc <= 2 * delta.toInt + 10) return
    if (nc + b.bufN == 0) { b.dirty = false; return }
    val all = new Array[(Double, Double)](nc + b.bufN)
    var i = 0
    while (i < nc) { all(i) = (m(i), w(i)) ; i += 1 }
    var j = 0
    while (j < b.bufN) { all(nc + j) = (b.buffer(j), 1.0); j += 1 }
    java.util.Arrays.sort(all, Ordering.Tuple2[Double, Double])
    val total = all.iterator.map(_._2).sum
    var out = 0
    var cm = all(0)._1
    var cw = all(0)._2
    var wSoFar = 0.0
    var wLimit = total * qOf(kOf(0.0) + 1.0)
    i = 1
    while (i < all.length) {
      val (xm, xw) = all(i)
      if (wSoFar + cw + xw <= wLimit) {
        cm += (xm - cm) * xw / (cw + xw)
        cw += xw
      } else {
        b.means(out) = cm; b.weights(out) = cw; out += 1
        wSoFar += cw
        wLimit = total * qOf(kOf(wSoFar / total) + 1.0)
        cm = xm; cw = xw
      }
      i += 1
    }
    b.means(out) = cm; b.weights(out) = cw; out += 1
    b.nCentroids = out
    b.bufN = 0
    b.dirty = false
  }

  override def reduce(b: Buf, x: Double): Buf = {
    b.buffer(b.bufN) = x
    b.bufN += 1
    b.n += 1
    if (b.bufN >= BUFFER_CAP) compress(b)
    b
  }

  override def merge(a: Buf, b: Buf): Buf = {
    // compress both sides first (each lands ≤ ~2δ+10 centroids), then
    // append the partner's centroids — weights > 1 must survive, so
    // they go to the centroid arrays, not the unit-weight raw buffer —
    // and re-merge once; the concatenation is unsorted, so it is
    // marked dirty until that compress.
    compress(a)
    compress(b)
    require(a.nCentroids + b.nCentroids <= a.means.length,
      s"centroid arrays undersized for delta=$delta")
    var i = 0
    while (i < b.nCentroids) {
      a.means(a.nCentroids + i) = b.means(i)
      a.weights(a.nCentroids + i) = b.weights(i)
      i += 1
    }
    a.nCentroids += b.nCentroids
    a.n += b.n
    a.dirty = true
    compress(a)
    a
  }

  override def finish(b: Buf): Seq[Double] = {
    compress(b)
    if (b.n == 0L) return qs.map(_ => 0.0)
    val total = (0 until b.nCentroids).iterator.map(b.weights(_)).sum
    qs.map { q =>
      val target = math.max(1e-9, q * total)
      var cum = 0.0
      var i = 0
      var out = b.means(b.nCentroids - 1)
      var found = false
      while (i < b.nCentroids && !found) {
        cum += b.weights(i)
        if (cum >= target) { out = b.means(i); found = true }
        i += 1
      }
      out
    }
  }

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
}

object TDigest {
  private[graft] val BUFFER_CAP = 512

  /** Mutable centroid store; live JVM object within a partition,
    * Kryo-encoded only when partials move (an opaque O(δ) blob).
    * Arrays sized for two compressed digests side by side plus slack,
    * so `merge` appends without reallocating.
    */
  final class Buf extends Serializable {
    val means = new Array[Double](4096)
    val weights = new Array[Double](4096)
    var nCentroids: Int = 0
    val buffer = new Array[Double](BUFFER_CAP)
    var bufN: Int = 0
    var n: Long = 0L
    /** true while the centroid prefix is an unsorted concatenation
      * (post-merge-append) — compress() must run before any read. */
    var dirty: Boolean = false
  }

  /** Input encoder for `functions.udaf(new TDigest(d, qs), encoder)`. */
  val inputEncoder: Encoder[Double] = Encoders.scalaDouble
}
