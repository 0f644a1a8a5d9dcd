package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entropic optimal transport as a library operator (SURVEY.md §2.14
  * EXT, round 8 — q330's ladder generalized per the r7 backlog).
  *
  * Optimal transport is the distribution-MATCHING member of the
  * divergence family (PSI/KL/KS/MMD² measure mismatch; OT also says HOW
  * to move mass): given two histograms over a common bin domain and a
  * ground cost between bins, the entropically-regularized coupling
  * P = diag(u)·K·diag(v), K = exp(−cost/ε), converges under Sinkhorn's
  * alternating marginal scalings u ← a/(Kv), v ← b/(Kᵀu). The coupling
  * is the actionable artifact: its rows say what fraction of each
  * source bin's mass serves each target bin — the routing table behind
  * dataset-mixture rebalancing (q332).
  *
  * Numeric discipline (the q330 spellings, kept verbatim so both
  * engines walk one float ladder): the kernel is round₁₂(exp(−cost/ε))
  * — exp is the one libm call, rounded on BOTH engines before use (the
  * BM25 ln stance); u and v are re-rounded to 12 dp between half-steps
  * (q113's iterative-float discipline); every axis sum is an ORDERED
  * cumsum + max-of-cumsum (q175 — all terms nonnegative, so the max IS
  * the total, replicated per row without a second shuffle). Zero-mass
  * bins scale to u=v=0 (their coupling row/column is exactly zero).
  *
  * 100 TB design: the grid is bins² — bounded by the BINNING, never by
  * the data; the only row-scale work is whatever histogram aggregation
  * produces `a` and `b` upstream. 1k bins → a 1M-cell keyed grid; the
  * iteration is `iters` window passes over that grid, each partitioned
  * by one axis (bins-sized partitions, trivially in-memory).
  */
object Transport {

  /** Run `iters` Sinkhorn rounds over the `a` × `b` bin grid.
    *
    * @param a    source marginal: (bin: integral, a: double probability,
    *             round-12, MUST cover every bin of the domain — emit
    *             zero-mass bins explicitly via a spine join)
    * @param b    target marginal: (bin, b) — same domain
    * @param cost ground cost between a source and a target bin column
    * @param eps  entropic regularizer ε in K = exp(−cost/ε)
    * @param iters unrolled Sinkhorn rounds (each = one v and one u
    *             half-step; the final half-step is u, so ROW sums of
    *             the returned coupling equal `a` to round-12 exactly)
    * @return the full grid (i, j, a, b, k, u, v); the coupling cell is
    *         u·k·v (callers round it — q330/q332 use round-9)
    */
  def sinkhorn(a: DataFrame, b: DataFrame,
               cost: (Column, Column) => Column,
               eps: Double = 1.0, iters: Int = 3): DataFrame = {
    val W = Window
    var g = a.select(col("bin").as("i"), col("a"))
      .crossJoin(broadcast(b.select(col("bin").as("j"), col("b"))))
      .withColumn("k",
        round(exp(-cost(col("i"), col("j")).cast("double") / lit(eps)), 12))
      .withColumn("u", lit(1.0))
    for (_ <- 1 to iters) {
      val wj = W.partitionBy(col("j")).orderBy(col("i"))
      g = g.withColumn("cs", sum(col("k") * col("u")).over(
          wj.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("s", max(col("cs")).over(W.partitionBy(col("j"))))
        .withColumn("v", round(when(col("b") > 0,
          col("b") / col("s")).otherwise(lit(0.0)), 12))
        .drop("cs", "s")
      val wi = W.partitionBy(col("i")).orderBy(col("j"))
      g = g.withColumn("ct", sum(col("k") * col("v")).over(
          wi.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("tt", max(col("ct")).over(W.partitionBy(col("i"))))
        .withColumn("u", round(when(col("a") > 0,
          col("a") / col("tt")).otherwise(lit(0.0)), 12))
        .drop("ct", "tt")
    }
    g.select(col("i"), col("j"), col("a"), col("b"),
      col("k"), col("u"), col("v"))
  }

  /** Per-(source → target) routing rates in permille, derived from the
    * coupling: pm(i→j) = ⌊1000 · p(i,j) / a_i⌋ — the fraction of bin
    * i's rows that should serve target bin j, quantized to the
    * [[Corpus.sampleBucket]] resolution so the assignment is ONE
    * deterministic hash-range predicate per row (no rand(), pushes to
    * the scan). Rows whose bucket falls past Σ_j pm(i→j) are the floor
    * remainder — dropped, ≤ bins‰ of each source bin by construction.
    * Returns (i, j, pm, lo, hi) with [lo, hi) the cumulative
    * bucket range of route i→j in j order.
    */
  def routingRates(coupling: DataFrame): DataFrame = {
    val W = Window
    val wj = W.partitionBy(col("i")).orderBy(col("j"))
    coupling
      .withColumn("p9", round(col("u") * col("k") * col("v"), 9))
      .withColumn("pm", when(col("a") > 0,
          floor(lit(1000.0) * col("p9") / col("a")).cast("long"))
        .otherwise(lit(0L)))
      .withColumn("hi", sum(col("pm")).over(
        wj.rowsBetween(W.unboundedPreceding, 0)))
      .withColumn("lo", col("hi") - col("pm"))
      .select(col("i"), col("j"), col("pm"), col("lo"), col("hi"))
  }
}
