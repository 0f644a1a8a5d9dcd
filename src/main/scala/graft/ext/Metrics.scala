package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored/labeled data (SURVEY.md §2.14
  * EXT, round 6): ROC AUC, the two-sample Kolmogorov–Smirnov statistic,
  * Cohen's kappa inter-annotator agreement, Bradley–Terry pairwise
  * preference strengths, and per-group isotonic (PAVA) calibration.
  * These are the measurement half of a training-data pipeline — scoring
  * a quality classifier (AUC/KS against held-out labels), auditing
  * labeling agreement (kappa), aggregating pairwise preference
  * judgments into item strengths (Bradley–Terry), and calibrating a
  * scorer's probabilities (isotonic) — sitting beside the drift tools
  * (q145 KL, q198 quantile drift, q169 MAD screen).
  *
  * Numeric discipline (SURVEY §5): every statistic is computed from
  * EXACT integer counts/sums with ONE double division at the end, so
  * shuffle order cannot perturb the value and the DuckDB oracles match
  * bit-for-bit before the defensive `roundz`.
  *
  * 100 TB design: AUC/KS reduce to one group-by on the score value plus
  * one ordered window over DISTINCT scores (cardinality-bounded, not
  * row-bounded); kappa is a k×k contingency aggregate; Bradley–Terry
  * reduces the corpus to an O(items²) win matrix (driver-side model
  * material, like the k-means centroids) after a distributed pair
  * build; isotonic runs PAVA independently per model group —
  * thousands of groups fit one `flatMapGroups` pass, each group's bin
  * list bounded by the binning resolution, never by corpus size.
  */
object Metrics {

  /** ROC AUC via the Mann–Whitney rank-sum with average-rank tie
    * handling: group rows by exact score, cumulative count below each
    * score, positives at a score contribute
    * `n_pos · (below + (n + 1)/2)` to the positive rank sum; then
    * AUC = (Σranks₊ − N₊(N₊+1)/2) / (N₊·N₋). All-integer until the
    * final division (rank sums are exact in whole- and half-units —
    * doubled internally to stay integral).
    *
    * Output (one row): `n_pos`, `n_neg`, `auc` (raw double).
    */
  def aucROC(df: DataFrame, score: Column, label: Column): DataFrame = {
    val byScore = df
      .select(score.as("s"), label.cast("long").as("y"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // 2·ranksum to keep the half-ranks integral: 2·below + n + 1
    val ranked = byScore
      .withColumn("below", sum(col("n")).over(w) - col("n"))
      .withColumn("rs2", col("np") * (lit(2) * col("below") + col("n") + 1))
    ranked.agg(sum(col("np")).as("n_pos"),
        (sum(col("n")) - sum(col("np"))).as("n_neg"),
        sum(col("rs2")).as("rs2"))
      .select(col("n_pos"), col("n_neg"),
        ((col("rs2") - col("n_pos") * (col("n_pos") + 1)).cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `a` and `b`
    * populations of `value` (both flagged per row): D = max over the
    * pooled distinct values of |F_a − F_b|, computed as an exact
    * integer max of |c_a·N_b − c_b·N_a| with one division by N_a·N_b.
    *
    * Output (one row): `n_a`, `n_b`, `ks_d` (raw double), `ks_at`
    * (smallest value attaining the max — deterministic).
    */
  def ksTwoSample(df: DataFrame, value: Column, inA: Column): DataFrame = {
    val byV = df
      .select(value.as("v"), inA.cast("long").as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("na"), (count(lit(1)) - sum(col("a"))).as("nb"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byV
      .withColumn("ca", sum(col("na")).over(w))
      .withColumn("cb", sum(col("nb")).over(w))
    val tot = cum.agg(max(col("ca")).as("n_a"), max(col("cb")).as("n_b"))
    cum.crossJoin(broadcast(tot))
      .withColumn("num", abs(col("ca") * col("n_b") - col("cb") * col("n_a")))
      .orderBy(col("num").desc, col("v"))
      .limit(1)
      .select(col("n_a"), col("n_b"),
        (col("num").cast("double") / (col("n_a") * col("n_b"))).as("ks_d"),
        col("v").as("ks_at"))
  }

  /** Cohen's kappa between two categorical rater columns:
    * κ = (N·Σdiag − Σ_k row_k·col_k) / (N² − Σ_k row_k·col_k),
    * exact-integer numerator/denominator, one division.
    *
    * Output (one row): `n`, `po`, `pe`, `kappa` (raw doubles for the
    * last three).
    */
  def cohenKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val cells = df.select(raterA.as("ra"), raterB.as("rb"))
      .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("c"))
    val rows = cells.groupBy(col("ra")).agg(sum(col("c")).as("rowc"))
    val cols = cells.groupBy(col("rb")).agg(sum(col("c")).as("colc"))
    val peNum = rows.join(cols, col("ra") === col("rb"))
      .agg(coalesce(sum(col("rowc") * col("colc")), lit(0L)).as("pe_num"))
    val agg = cells.agg(sum(col("c")).as("n"),
      coalesce(sum(when(col("ra") === col("rb"), col("c"))), lit(0L))
        .as("diag"))
    agg.crossJoin(peNum)
      .select(col("n"),
        (col("diag").cast("double") / col("n")).as("po"),
        (col("pe_num").cast("double") / (col("n") * col("n"))).as("pe"),
        ((col("n") * col("diag") - col("pe_num")).cast("double") /
          (col("n") * col("n") - col("pe_num"))).as("kappa"))
  }

  /** Pearson chi-square test of independence between two categorical
    * columns: χ² = Σ_cells (O − E)²/E with E = row·col/N, summed over
    * the FULL row×col grid (zero-observed cells included — omitting
    * them understates the statistic). Counts and marginals are exact
    * integers; E and the per-cell terms are doubles in a fixed spelling
    * mirrored by the oracle, the final Σ defensively rounded by the
    * caller (BM25 precedent for small float sums).
    *
    * Output (one row): `n`, `dof`, `chi2` (raw double).
    */
  def chiSquare(df: DataFrame, a: Column, b: Column): DataFrame = {
    val cells = df.select(a.as("ra"), b.as("cb"))
      .groupBy(col("ra"), col("cb")).agg(count(lit(1)).as("o"))
    val rows = cells.groupBy(col("ra")).agg(sum(col("o")).as("rs"))
    val cols = cells.groupBy(col("cb")).agg(sum(col("o")).as("cs"))
    val n = cells.agg(sum(col("o")).as("n"))
    val grid = rows.crossJoin(cols).crossJoin(broadcast(n))
      .join(cells, Seq("ra", "cb"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("e",
        (col("rs") * col("cs")).cast("double") / col("n"))
      .withColumn("t",
        (col("o") - col("e")) * (col("o") - col("e")) / col("e"))
    grid.groupBy(col("n"))
      .agg(sum(col("t")).as("chi2"),
        ((countDistinct(col("ra")) - 1) *
          (countDistinct(col("cb")) - 1)).as("dof"))
      .select(col("n"), col("dof"), col("chi2"))
  }

  /** Bradley–Terry strengths from a win-count relation
    * (`item_a`, `item_b`, `wins_a`, `wins_b`), via the classic MM
    * update p_i ← W_i / Σ_{j≠i} n_ij/(p_i+p_j), normalized each round.
    *
    * The distributed phase reduces the corpus to the O(items²) win
    * matrix; like the k-means centroids (Embeddings.kmeans) that
    * matrix is bounded driver-side MODEL material — collect it and
    * iterate locally (items = event types / models / sources: k is
    * small by construction; require() guards the bound).
    *
    * Returns (items sorted): `item`, `wins`, `losses`, `strength`,
    * plus model-level booleans `stationary_ok` (MM fixed-point residual
    * ≤ 1e-9 relative after `iters` rounds) and `loglik_monotone`
    * (log-likelihood non-decreasing across rounds — the MM guarantee).
    */
  def bradleyTerry(pairWins: DataFrame, itemA: String, itemB: String,
                   winsA: String, winsB: String, iters: Int = 50,
                   maxItems: Int = 1024): DataFrame = {
    val spark = pairWins.sparkSession
    import spark.implicits._
    val rows = pairWins
      .select(col(itemA).cast("string"), col(itemB).cast("string"),
        col(winsA).cast("long"), col(winsB).cast("long"))
      .as[(String, String, Long, Long)].collect()
    val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    require(items.length <= maxItems,
      s"bradleyTerry: ${items.length} items exceeds driver-side bound " +
        s"$maxItems — pre-aggregate or raise the bound deliberately")
    val idx = items.zipWithIndex.toMap
    val k = items.length
    val n = Array.ofDim[Long](k, k) // n(i)(j) = wins of i over j
    rows.foreach { case (a, b, wa, wb) =>
      n(idx(a))(idx(b)) += wa; n(idx(b))(idx(a)) += wb
    }
    val wins = Array.tabulate(k)(i => n(i).sum)
    val losses = Array.tabulate(k)(i => (0 until k).map(j => n(j)(i)).sum)
    var p = Array.fill(k)(1.0 / k)
    def logLik(q: Array[Double]): Double = {
      var ll = 0.0
      for (i <- 0 until k; j <- 0 until k if n(i)(j) > 0)
        ll += n(i)(j) * (math.log(q(i)) - math.log(q(i) + q(j)))
      ll
    }
    var monotone = true
    var prevLl = logLik(p)
    for (_ <- 0 until iters) {
      val next = Array.tabulate(k) { i =>
        val denom = (0 until k).map(j =>
          if (j == i) 0.0
          else (n(i)(j) + n(j)(i)).toDouble / (p(i) + p(j))).sum
        if (denom == 0.0) p(i) else wins(i) / denom
      }
      val s = next.sum
      p = next.map(_ / s)
      val ll = logLik(p)
      if (ll < prevLl - 1e-9) monotone = false
      prevLl = ll
    }
    val stationary = (0 until k).forall { i =>
      val s = (0 until k).map(j =>
        if (j == i) 0.0
        else (n(i)(j) + n(j)(i)).toDouble / (p(i) + p(j))).sum
      math.abs(wins(i) - p(i) * s) <= 1e-6 * math.max(1.0, wins(i).toDouble)
    }
    items.indices.map(i =>
        (items(i), wins(i), losses(i), p(i), stationary, monotone))
      .toDF("item", "wins", "losses", "strength",
        "stationary_ok", "loglik_monotone")
  }

  /** Per-group isotonic regression (weighted PAVA) over pre-binned
    * counts: input one row per (group, bin) with exact integer `pos`
    * (successes) and `n` (trials); output adds `fitted` — the
    * monotone-non-decreasing calibrated rate. Each group's bins are
    * processed sequentially inside one task (the pool-adjacent-
    * violators stack), groups in parallel — the distributed shape for
    * thousands of models. Fitted values divide EXACT merged Long sums
    * once, so they equal the oracle's minimax form
    * max_{j≤i} min_{k≥i} mean(j..k) bit-for-bit.
    */
  def isotonicFit(bins: DataFrame, group: String, bin: String,
                  pos: String, trials: String): DataFrame = {
    val spark = bins.sparkSession
    import spark.implicits._
    val typed = bins.select(col(group).cast("string"),
        col(bin).cast("long"), col(pos).cast("long"),
        col(trials).cast("long"))
      .as[(String, Long, Long, Long)]
    typed.groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val sorted = it.toArray.sortBy(_._2)
        // PAVA stack of (startIdx, sumPos, sumN)
        val st = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
        sorted.zipWithIndex.foreach { case ((_, _, p, n), i) =>
          var cur = (i, p, n)
          // merge while the new block's rate is below its predecessor's
          while (st.nonEmpty && {
            val (_, p0, n0) = st.last
            // cross-multiplied exact comparison: cur.rate <= prev.rate
            cur._2 * n0 <= p0 * cur._3
          }) {
            val (s0, p0, n0) = st.remove(st.length - 1)
            cur = (s0, p0 + cur._2, n0 + cur._3)
          }
          st += cur
        }
        val fitted = new Array[Double](sorted.length)
        st.foreach { case (s0, p0, n0) =>
          val v = p0.toDouble / n0
          var i = s0
          val end = st.find(_._1 > s0).map(_._1).getOrElse(sorted.length)
          while (i < end && i < sorted.length) { fitted(i) = v; i += 1 }
        }
        sorted.zipWithIndex.map { case ((_, b, p, n), i) =>
          (g, b, p, n, fitted(i))
        }
      }
      .toDF(group, bin, pos, trials, "fitted")
  }
}
