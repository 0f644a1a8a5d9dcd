package graft

import org.apache.spark.sql.functions._

import graft.ext.Transport

/** Pins ext.Transport.sinkhorn on a 2×2 coupling small enough to walk
  * by hand: the operator's per-cell values must equal a driver-side
  * replay of the exact ladder (round-12 half-steps, ordered sums), and
  * the structural OT facts must hold — row marginals equal `a` after
  * the final u half-step, total mass ≈ 1, and the cheap diagonal
  * carries more mass than the off-diagonal when marginals allow.
  */
class TransportSpec extends SparkSpec {

  private def r(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("sinkhorn 2x2: cells equal the hand-replayed ladder; row " +
      "marginals equal a; routing rates quantize the coupling") {
    import spark.implicits._
    val a = Seq((0L, 0.5), (1L, 0.5)).toDF("bin", "a")
    val b = Seq((0L, 0.75), (1L, 0.25)).toDF("bin", "b")
    val g = Transport.sinkhorn(a, b, (i, j) => abs(i - j),
      eps = 1.0, iters = 3)
    val got = g.select(col("i"), col("j"),
        round(col("u") * col("k") * col("v"), 9).as("p9"))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1)) -> r0.getDouble(2))
      .toMap

    // driver replay of the exact ladder
    val av = Array(0.5, 0.5)
    val bv = Array(0.75, 0.25)
    val k = Array.tabulate(2, 2)((i, j) => r(math.exp(-math.abs(i - j)), 12))
    val u = Array(1.0, 1.0)
    val v = Array(0.0, 0.0)
    for (_ <- 1 to 3) {
      for (j <- 0 to 1)
        v(j) = r(bv(j) / (0 to 1).map(i => k(i)(j) * u(i)).sum, 12)
      for (i <- 0 to 1)
        u(i) = r(av(i) / (0 to 1).map(j => k(i)(j) * v(j)).sum, 12)
    }
    for (i <- 0 to 1; j <- 0 to 1)
      assert(got((i.toLong, j.toLong)) == r(u(i) * k(i)(j) * v(j), 9),
        s"cell ($i,$j) diverged from the hand ladder")

    // final half-step is u => row sums equal a (to coupling rounding)
    for (i <- 0 to 1) {
      val row = (0 to 1).map(j => got((i.toLong, j.toLong))).sum
      assert(math.abs(row - av(i)) < 1e-8, s"row $i marginal $row != 0.5")
    }
    // mass conservation and cost preference: bin 0 is over-demanded
    // (b0=0.75 > a0=0.5), so mass flows 1->0 but the cheap diagonal
    // still dominates each row
    assert(math.abs(got.values.sum - 1.0) < 1e-7)
    assert(got((0L, 0L)) > got((0L, 1L)))
    assert(got((1L, 0L)) > 0.0 && got((1L, 1L)) > got((0L, 1L)))

    // routing rates: permille quantization + contiguous [lo, hi) per i
    val rr = Transport.routingRates(g)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    for (i <- 0 to 1; j <- 0 to 1) {
      val pm = math.floor(1000.0 * got((i.toLong, j.toLong)) / av(i)).toLong
      assert(rr((i.toLong, j.toLong))._1 == pm)
    }
    for (i <- 0L to 1L) {
      assert(rr((i, 0L))._2 == 0L) // first range starts at 0
      assert(rr((i, 1L))._2 == rr((i, 0L))._3) // contiguous
      assert(rr((i, 1L))._3 <= 1000L) // floors never overshoot
    }
  }
}
