package graft

import graft.expr.QuantileSketch

/** Pins the KLL-style compactor sketch directly (q337 pins it through
  * the grouped-aggregation contract): rank error on a known
  * distribution, merge-shape independence, compaction actually firing
  * (bounded footprint), and exactness below capacity.
  */
class QuantileSketchSpec extends SparkSpec {

  private def rankOf(sorted: IndexedSeq[Long], v: Long): Double =
    sorted.count(_ <= v).toDouble / sorted.length

  test("rank error: p50/p90 of 40k skewed values land within 3% rank " +
      "of truth; exact below capacity") {
    val qs = Seq(0.5, 0.9)
    val sk = new QuantileSketch(256, qs)
    // deterministic skewed stream (quadratic residues, shuffled order)
    val xs = (0 until 40000).map(i =>
      ((i.toLong * 2654435761L) % 40000) * ((i % 97) + 1) % 100000)
    var b = sk.zero
    xs.foreach(x => b = sk.reduce(b, x))
    val got = sk.finish(b)
    val sorted = xs.sorted
    for ((q, v) <- qs.zip(got)) {
      val r = rankOf(sorted, v)
      assert(math.abs(r - q) < 0.03,
        s"q=$q estimated $v at true rank $r — outside the 3% bound")
    }
    // below capacity the level-0 buffer is the raw data -> exact
    val small = new QuantileSketch(256, Seq(0.5))
    var sb = small.zero
    (1L to 101L).foreach(x => sb = small.reduce(sb, x))
    assert(small.finish(sb) == Seq(51L))
  }

  test("merge-shape independence: many-way merges of disjoint shards " +
      "stay inside the rank bound regardless of grouping") {
    val qs = Seq(0.25, 0.5, 0.75)
    val sk = new QuantileSketch(128, qs)
    val xs = (0 until 30000).map(i => (i.toLong * 48271) % 65536)
    val shards = xs.grouped(1000).toSeq
    def sketchOf(s: Seq[Long]) = {
      var b = sk.zero
      s.foreach(x => b = sk.reduce(b, x))
      b
    }
    // left fold vs balanced-pair merge
    val bufs1 = shards.map(sketchOf)
    val leftFold = bufs1.reduceLeft(sk.merge)
    val bufs2 = shards.map(sketchOf)
    def pairUp(bs: Seq[QuantileSketch.Buf]): QuantileSketch.Buf =
      if (bs.size == 1) bs.head
      else pairUp(bs.grouped(2).map(g =>
        if (g.size == 2) sk.merge(g(0), g(1)) else g(0)).toSeq)
    val balanced = pairUp(bufs2)
    val sorted = xs.sorted
    for (est <- Seq(sk.finish(leftFold), sk.finish(balanced));
         (q, v) <- qs.zip(est)) {
      val r = rankOf(sorted, v)
      assert(math.abs(r - q) < 0.05,
        s"merged sketch q=$q at true rank $r — merge broke the bound")
    }
  }

  test("compaction bounds the footprint: 100k inserts keep " +
      "O(k log(n/k)) items, far below n") {
    val sk = new QuantileSketch(64, Seq(0.5))
    var b = sk.zero
    (0 until 100000).foreach(i => b = sk.reduce(b, i.toLong))
    var items = 0
    val it = b.levels.iterator()
    while (it.hasNext) items += it.next().size
    assert(items < 64 * (b.levels.size + 1),
      s"footprint $items exceeds capacity x levels")
    assert(items < 2000, s"footprint $items did not compact")
    assert(b.n == 100000L)
  }
}
