package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.GramMoments

/** Covariance / PCA over an `Array[Float]` embedding column (EXT,
  * SURVEY.md §2.14): the moment pass is a single distributed Gram
  * aggregate ([[graft.expr.GramMoments]], O(D²) state per partition);
  * everything after — covariance finalization, power-iteration
  * eigensolve, basis assembly — is driver math on one D×D matrix, the
  * classic RowMatrix/PCA split. Projection back onto the corpus is a
  * narrow codegen'd map (no shuffle, no UDF).
  */
object Embeddings {

  /** Result of the distributed moment pass, finalized on the driver:
    * population mean and covariance (row-major `cov(i)(j)`).
    */
  final case class Moments(n: Long, mean: Array[Double],
                           cov: Array[Array[Double]]) {
    def dim: Int = mean.length
    def trace: Double = {
      var t = 0.0; var i = 0
      while (i < dim) { t += cov(i)(i); i += 1 }
      t
    }
  }

  /** Top eigenpairs of the covariance, eigenvalue-descending. */
  final case class Eigen(values: Array[Double], vectors: Array[Array[Double]])

  /** ONE distributed pass: n, Σv, Σvvᵀ via the GramMoments aggregator,
    * then cov(i,j) = gram(i,j)/n − mean_i·mean_j on the driver.
    * Population (1/n) covariance — the convention the oracle recomputes.
    */
  def moments(df: DataFrame, vecCol: String, dim: Int): Moments = {
    val agg = udaf(new GramMoments(dim), GramMoments.inputEncoder)
    val row = df.select(agg(col(vecCol)).as("m")).select("m.*").head()
    val n = row.getAs[Long]("n")
    require(n > 0, "moments of an empty relation")
    val sum = row.getAs[Seq[Double]]("sum").toArray
    val gram = row.getAs[Seq[Double]]("gram").toArray
    val mean = sum.map(_ / n)
    val cov = Array.ofDim[Double](dim, dim)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = gram(idx) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        idx += 1; j += 1
      }
      i += 1
    }
    Moments(n, mean, cov)
  }

  /** Top-r eigenpairs by cyclic Jacobi rotations — the right solver for
    * a small symmetric driver-side matrix: quadratically convergent
    * with NO eigengap dependence (power/deflation iteration stalls when
    * λ₁ ≈ λ₂, which is the normal case for near-isotropic embedding
    * covariances), machine-precision residuals and exact-to-rounding
    * orthogonality (V is a product of rotations). Deterministic: fixed
    * cyclic sweep order, data-independent convergence threshold, and a
    * canonical sign convention (largest-|component| entry positive).
    * D is an embedding dim, so driver O(sweeps·D³) is microseconds; a
    * huge-D case would swap in a distributed Lanczos, not this.
    */
  def symEigen(cov: Array[Array[Double]], r: Int,
               maxSweeps: Int = 64): Eigen = {
    val d = cov.length
    require(r > 0 && r <= d, s"r=$r out of range for dim $d")
    val b = cov.map(_.clone())
    val vmat = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offNorm(): Double = {
      var s = 0.0; var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += 2 * b(i)(j) * b(i)(j); j += 1 }
        i += 1
      }
      math.sqrt(s)
    }
    val scale = {
      var s = 0.0; var i = 0
      while (i < d) { var j = 0; while (j < d) { s += b(i)(j) * b(i)(j); j += 1 }; i += 1 }
      math.max(math.sqrt(s), Double.MinPositiveValue)
    }

    var sweep = 0
    while (sweep < maxSweeps && offNorm() > 1e-14 * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = b(p)(q)
          if (apq != 0.0) {
            // classic Jacobi rotation zeroing b(p)(q)
            val tau = (b(q)(q) - b(p)(p)) / (2.0 * apq)
            val t = math.signum(tau) match {
              case 0.0 => 1.0
              case s0  => s0 / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            }
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s0 = t * c
            var k = 0
            while (k < d) {
              val bkp = b(k)(p); val bkq = b(k)(q)
              b(k)(p) = c * bkp - s0 * bkq
              b(k)(q) = s0 * bkp + c * bkq
              k += 1
            }
            k = 0
            while (k < d) {
              val bpk = b(p)(k); val bqk = b(q)(k)
              b(p)(k) = c * bpk - s0 * bqk
              b(q)(k) = s0 * bpk + c * bqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = vmat(k)(p); val vkq = vmat(k)(q)
              vmat(k)(p) = c * vkp - s0 * vkq
              vmat(k)(q) = s0 * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // top-r by eigenvalue desc, index-asc tiebreak; canonical sign
    val order = (0 until d).sortBy(i => (-b(i)(i), i)).take(r)
    val values = order.map(i => b(i)(i)).toArray
    val vectors = order.map { ci =>
      val v = Array.tabulate(d)(k => vmat(k)(ci))
      var best = 0; var i = 1
      while (i < d) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
      if (v(best) < 0) v.map(x => -x) else v
    }.toArray
    Eigen(values, vectors)
  }

  /** ‖Cv − λv‖∞ — the eigenpair residual used by the q101 contract. */
  def eigenResidual(cov: Array[Array[Double]], value: Double,
                    vector: Array[Double]): Double = {
    val d = cov.length
    var worst = 0.0
    var i = 0
    while (i < d) {
      var s = 0.0; var j = 0
      while (j < d) { s += cov(i)(j) * vector(j); j += 1 }
      worst = math.max(worst, math.abs(s - value * vector(i)))
      i += 1
    }
    worst
  }

  /** Project (and optionally whiten) the corpus onto a driver-computed
    * basis: mean-center, dot with each component, divide by √λ when
    * whitening. A NARROW map over broadcast literal arrays — codegen'd
    * HOF arithmetic, no shuffle, no UDF; at 100 TB this is a pure scan.
    */
  def project(df: DataFrame, vecCol: String, mean: Array[Double],
              eigen: Eigen, whiten: Boolean = false,
              outCol: String = "proj"): DataFrame = {
    val meanLit = array(mean.map(lit): _*)
    val centered = zip_with(col(vecCol), meanLit,
      (x, m) => x.cast("double") - m)
    val comps = eigen.vectors.zip(eigen.values).map { case (vec, lam) =>
      val vLit = array(vec.map(lit): _*)
      val d = aggregate(zip_with(centered, vLit, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      if (whiten) d / math.sqrt(math.max(lam, 1e-300)) else d
    }
    df.withColumn(outCol, array(comps: _*))
  }

  /** Per-vector standardized outlier score — the embedding-space
    * anomaly screen (drop corrupt/degenerate vectors before training):
    * score = Σᵢ ((xᵢ − μᵢ)/σᵢ)², diagonal-covariance Mahalanobis.
    * Moments come from the SAME one-pass [[moments]] aggregate as PCA
    * (O(D²) state, one corpus pass); scoring is a narrow codegen'd
    * zip_with fold over broadcast literal μ/σ arrays — no shuffle, no
    * UDF, a pure scan at 100 TB. Zero-variance dimensions contribute 0
    * (no divide-by-zero).
    */
  def outlierScores(df: DataFrame, vecCol: String, dim: Int,
                    outCol: String = "score"): DataFrame = {
    val m = moments(df, vecCol, dim)
    val std = Array.tabulate(dim)(i => math.sqrt(math.max(m.cov(i)(i), 0.0)))
    val meanLit = array(m.mean.map(lit): _*)
    val stdLit = array(std.map(lit): _*)
    val z = zip_with(
      zip_with(col(vecCol), meanLit, (x, mu) => x.cast("double") - mu),
      stdLit,
      (cx, sd) => when(sd > 0, pow(cx / sd, 2)).otherwise(lit(0.0)))
    df.withColumn(outCol, aggregate(z, lit(0.0), (acc, x) => acc + x))
  }

  /** Convenience: moments → top-r eigen → projected corpus. */
  def pca(df: DataFrame, vecCol: String, dim: Int, r: Int,
          whiten: Boolean = false): (Moments, Eigen, DataFrame) = {
    val m = moments(df, vecCol, dim)
    val e = symEigen(m.cov, r)
    (m, e, project(df, vecCol, m.mean, e, whiten))
  }

  /** Result of [[kmeans]]: the assigned corpus (cluster column added),
    * the final unit-centroid matrix, and the per-round objective
    * Σ(1 − cos(x, c_assigned)) — non-increasing by Lloyd's argument.
    */
  final case class KMeans(assigned: DataFrame, centroids: Seq[Seq[Float]],
                          objective: Seq[Double])

  /** Distributed spherical k-means over an `Array[Float]` embedding
    * column — the semantic-clustering primitive behind topic-balanced
    * mixing and SemDeDup-style cluster-then-dedup curation.
    *
    * Deterministic end to end: seeds are the first `k` unit vectors by
    * `idCol`; assignment is the native codegen'd [[graft.expr.ArgMaxCosine]]
    * over a broadcast centroid literal (a NARROW map — the corpus never
    * joins the centroids); recentering is one (cluster, pos) aggregate
    * per round, the normalized mean of member unit vectors (for unit
    * vectors the mean direction maximizes Σcos, so the objective is
    * monotone). Ties break to the lowest cluster id; an emptied cluster
    * keeps its previous centroid.
    *
    * Per-round cost at 100 TB: one narrow assignment pass + one
    * aggregate whose state is O(k·dim) after the map-side combine; the
    * k×dim matrix round-trips through the driver exactly like the IVF
    * coarse quantizer ([[Similarity.ivfTopK]]) — centroids are model
    * material, not data. Zero-norm vectors are excluded up front
    * (cosine undefined).
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iters: Int = 2): KMeans = {
    require(k > 0 && iters >= 0, s"kmeans: bad k=$k / iters=$iters")
    val spark = df.sparkSession
    graft.expr.GraftFunctions.register(spark)
    val n2 = sqrt(aggregate(
      zip_with(col(vecCol), col(vecCol), (a, b) => a.cast("double") * b),
      lit(0.0), (acc, x) => acc + x))
    val unit = df.withColumn("__n2", n2).filter(col("__n2") > 0)
      .withColumn("__u",
        transform(col(vecCol), x => (x.cast("double") / col("__n2")).cast("float")))
      .persist() // the loop runs iters+1 full passes over this relation

    try {
      var cmat: Seq[Seq[Float]] = unit.orderBy(col(idCol)).limit(k)
        .select(col("__u")).collect().map(_.getSeq[Float](0)).toSeq
      val obj = scala.collection.mutable.ArrayBuffer[Double]()

      def assigned(m: Seq[Seq[Float]]): DataFrame =
        unit.withColumn("cluster", Similarity.argMaxCosine(col("__u"), m))

      // ONE aggregate per round serves BOTH the objective and the
      // recenter: for unit x and unit centroids, Σᵢ cos(xᵢ, c_a(i)) =
      // Σ_c c·s_c where s_c is the member sum vector — so the objective
      // under the matrix that produced the assignment falls out of the
      // same (cluster, pos) sums the next centroids are built from.
      def step(m: Seq[Seq[Float]]): (Double, Map[Int, (Long, Seq[Double])]) = {
        val sums = assigned(m)
          .select(col("cluster"), posexplode(col("__u")).as(Seq("pos", "v")))
          .groupBy(col("cluster"), col("pos"))
          .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
          .groupBy(col("cluster"))
          .agg(array_sort(collect_list(struct(col("pos"), col("s"), col("n"))))
            .as("ps"))
          .select(col("cluster"),
            expr("transform(ps, x -> x.s)").as("sv"),
            expr("ps[0].n").as("n"))
          .collect()
          .map(r => r.getInt(0) -> (r.getLong(2), r.getSeq[Double](1))).toMap
        val nTotal = sums.valuesIterator.map(_._1).sum
        val sumCos = sums.toSeq.sortBy(_._1).map { case (c, (_, sv)) =>
          sv.zip(m(c)).map { case (s, ci) => s * ci }.sum
        }.sum
        (nTotal - sumCos, sums)
      }

      for (_ <- 0 until iters) {
        val (o, sums) = step(cmat)
        obj += o
        cmat = cmat.zipWithIndex.map { case (prev, i) =>
          sums.get(i) match {
            case Some((_, sv)) =>
              val nrm = math.sqrt(sv.map(x => x * x).sum)
              if (nrm > 0) sv.map(x => (x / nrm).toFloat) else prev
            case None => prev // emptied cluster keeps its position
          }
        }
      }
      val (oFinal, _) = step(cmat) // objective of the final matrix
      obj += oFinal
      KMeans(assigned(cmat).drop("__n2"), cmat, obj.toSeq)
    } finally { unit.unpersist(); () }
  }

  /** Johnson–Lindenstrauss sign-matrix random projection: reduce
    * `inDim`-dim vectors to `outDim` dims via y_j = Σᵢ xᵢ·s(i,j) / √outDim
    * with s(i,j) ∈ {±1} — the cheap distance-preserving dim reduction
    * that fronts clustering / ANN when the raw dimension is large
    * (Achlioptas 2003: a ±1 matrix satisfies the JL lemma).
    *
    * The sign matrix is a fixed integer formula of (i, j), not stored
    * state: `s = +1 iff (37·i + 101·j) mod 7 < 4` — deterministic,
    * engine-recomputable (small products, no overflow), identical
    * across retries and partitions. Evaluation is `outDim` codegen'd
    * zip_with folds over the vector — a narrow per-row projection, no
    * shuffle; the long (id, j, y) output keeps the oracle compare to
    * scalar cells. At 100 TB this is a pure map fused into the corpus
    * scan; for dim in the thousands swap the HOF fold for a native
    * Expression (the CosineSimilarity precedent).
    */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
                       inDim: Int, outDim: Int): DataFrame = {
    import graft.Graft.roundz
    val comps = (0 until outDim).map { j =>
      val signs = array((0 until inDim).map { i =>
        lit(if ((37 * i + 101 * j) % 7 < 4) 1.0 else -1.0)
      }: _*)
      roundz(
        aggregate(zip_with(col(vecCol), signs,
            (x, s) => x.cast("double") * s),
          lit(0.0), (acc, x) => acc + x) / math.sqrt(outDim.toDouble), 6)
    }
    df.select(col(idCol), posexplode(array(comps: _*)).as(Seq("j", "y6")))
      .select(col(idCol), col("j").cast("long").as("j"), col("y6"))
  }
}
