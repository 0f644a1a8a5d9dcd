package graft

import graft.expr.TDigest

/** Pins the t-digest sketch directly (q342 pins it through the grouped
  * contract): tail-accurate rank error on a known skewed distribution
  * (the property KLL does NOT have — compare QuantileSketchSpec's
  * uniform 3% bound), the k1 size invariant across merge shapes,
  * exactness while every centroid is a singleton, and the bounded
  * footprint.
  */
class TDigestSpec extends SparkSpec {

  private def rankOf(sorted: IndexedSeq[Double], v: Double): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  // deterministic skewed stream (heavy right tail, shuffled order)
  private def skewed(n: Int): IndexedSeq[Double] =
    (0 until n).map { i =>
      val u = (((i.toLong * 2654435761L) % n + n) % n + 0.5) / n
      // inverse-CDF of a power-law-ish shape: tail stretches to ~1e6
      math.pow(1.0 - u, -2.0)
    }

  test("rank error is tail-shaped: p99/p999 within 0.5% rank, p50 " +
      "within 3% — tails tighter than the middle") {
    val qs = Seq(0.5, 0.99, 0.999)
    val sk = new TDigest(200.0, qs)
    val xs = skewed(40000)
    var b = sk.zero
    xs.foreach(x => b = sk.reduce(b, x))
    val got = sk.finish(b)
    val sorted = xs.sorted
    val bounds = Seq(0.03, 0.005, 0.002) // k1 theory: error ∝ √(q(1−q))
    for (((q, v), bound) <- qs.zip(got).zip(bounds)) {
      val r = rankOf(sorted, v)
      assert(math.abs(r - q) < bound,
        s"q=$q estimated $v at true rank $r — outside the $bound bound")
    }
  }

  test("exact while all centroids are singletons (n small vs delta)") {
    val sk = new TDigest(200.0, Seq(0.1, 0.5, 0.9))
    var b = sk.zero
    val xs = (1 to 50).map(_.toDouble)
    xs.foreach(x => b = sk.reduce(b, x))
    // cum-weight read at singleton centroids = exact order statistics
    assert(sk.finish(b) == Seq(5.0, 25.0, 45.0))
  }

  test("k1 size invariant holds after any merge shape: every " +
      "multi-point centroid spans <= 1 k-unit (+ float slack)") {
    val delta = 100.0
    val sk = new TDigest(delta, Seq(0.5))
    val xs = skewed(30000)
    val shards = xs.grouped(1000).toSeq
    def sketchOf(s: Seq[Double]) = {
      var b = sk.zero
      s.foreach(x => b = sk.reduce(b, x))
      b
    }
    def kOf(q: Double): Double =
      delta / (2.0 * math.Pi) *
        math.asin(math.max(-1.0, math.min(1.0, 2.0 * q - 1.0)))
    def checkInvariant(b: TDigest.Buf, label: String): Unit = {
      sk.compress(b)
      val total = (0 until b.nCentroids).map(b.weights(_)).sum
      var cum = 0.0
      (0 until b.nCentroids).foreach { i =>
        val w = b.weights(i)
        if (w > 1.0) {
          val span = kOf((cum + w) / total) - kOf(cum / total)
          assert(span <= 1.0 + 1e-6,
            s"$label centroid $i spans $span k-units (w=$w)")
        }
        cum += w
      }
      assert(math.abs(total - 30000.0) < 1e-6)
    }
    val leftFold = shards.map(sketchOf).reduceLeft(sk.merge)
    checkInvariant(leftFold, "left-fold")
    def pairUp(bs: Seq[TDigest.Buf]): TDigest.Buf =
      if (bs.size == 1) bs.head
      else pairUp(bs.grouped(2).map(g =>
        if (g.size == 2) sk.merge(g(0), g(1)) else g(0)).toSeq)
    val balanced = pairUp(shards.map(sketchOf))
    checkInvariant(balanced, "balanced")
    // both shapes stay inside the rank bound too
    val sorted = xs.sorted
    for (b <- Seq(leftFold, balanced)) {
      val r = rankOf(sorted, sk.finish(b).head)
      assert(math.abs(r - 0.5) < 0.05)
    }
  }

  test("footprint stays O(delta): 100k inserts hold ~2*delta centroids") {
    val sk = new TDigest(100.0, Seq(0.5))
    var b = sk.zero
    (0 until 100000).foreach(i => b = sk.reduce(b, i.toDouble))
    sk.compress(b)
    assert(b.nCentroids <= 2 * 100 + 10,
      s"${b.nCentroids} centroids — compression did not bound the digest")
    assert(b.n == 100000L)
  }
}
