package graft

import org.apache.spark.sql.functions._

import graft.ext.Embeddings

/** Pins the distributed moment pass (GramMoments UDAF) and the
  * driver-side Jacobi eigensolve against hand-computable fixtures:
  * known covariance of tiny vector sets, partition-count invariance of
  * the aggregator merge, eigenpair residual/orthogonality at machine
  * precision even with a DEGENERATE spectrum (the case power iteration
  * cannot handle), and the projection/whitening contract (component
  * variance equals the eigenvalue; whitened variance equals 1).
  */
class EmbeddingsSpec extends SparkSpec {

  import spark.implicits._

  private def toDF(vs: Seq[Array[Float]]) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")

  test("moments: known covariance of a 2-D cross (degenerate spectrum)") {
    // (±1, 0), (0, ±1): mean 0, cov = I/2 — both eigenvalues 0.5
    val df = toDF(Seq(Array(1f, 0f), Array(-1f, 0f),
      Array(0f, 1f), Array(0f, -1f)))
    val m = Embeddings.moments(df, "vec", 2)
    assert(m.n === 4)
    assert(m.mean.forall(x => math.abs(x) < 1e-15))
    assert(math.abs(m.cov(0)(0) - 0.5) < 1e-15)
    assert(math.abs(m.cov(1)(1) - 0.5) < 1e-15)
    assert(math.abs(m.cov(0)(1)) < 1e-15)
    // Jacobi handles the EXACTLY degenerate spectrum: residual and
    // orthogonality still at machine precision
    val e = Embeddings.symEigen(m.cov, 2)
    assert(math.abs(e.values(0) - 0.5) < 1e-12 &&
      math.abs(e.values(1) - 0.5) < 1e-12)
    assert(Embeddings.eigenResidual(m.cov, e.values(0), e.vectors(0)) < 1e-12)
    val dot = e.vectors(0).zip(e.vectors(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-12)
  }

  test("moments: non-zero mean is subtracted (anisotropic fixture)") {
    // points along (1,1) around mean (10, 20): cov = s²·[[1,1],[1,1]]/n
    val pts = Seq(-3f, -1f, 1f, 3f).map(t => Array(10f + t, 20f + t))
    val m = Embeddings.moments(toDF(pts), "vec", 2)
    assert(math.abs(m.mean(0) - 10.0) < 1e-12)
    assert(math.abs(m.mean(1) - 20.0) < 1e-12)
    val s2 = (9.0 + 1 + 1 + 9) / 4
    for (i <- 0 to 1; j <- 0 to 1)
      assert(math.abs(m.cov(i)(j) - s2) < 1e-12, s"cov($i)($j)")
    // top eigenvector is (1,1)/√2 with canonical positive sign
    val e = Embeddings.symEigen(m.cov, 2)
    assert(math.abs(e.values(0) - 2 * s2) < 1e-12)
    assert(math.abs(e.values(1)) < 1e-12)
    assert(math.abs(e.vectors(0)(0) - 1 / math.sqrt(2)) < 1e-12)
    assert(math.abs(e.vectors(0)(1) - 1 / math.sqrt(2)) < 1e-12)
  }

  test("GramMoments: partition-count invariant (merge associativity)") {
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val m1 = Embeddings.moments(emb.repartition(1), "embedding", 64)
    val m7 = Embeddings.moments(emb.repartition(7), "embedding", 64)
    assert(m1.n === m7.n)
    val worst = (for (i <- 0 until 64; j <- 0 until 64)
      yield math.abs(m1.cov(i)(j) - m7.cov(i)(j))).max
    assert(worst < 1e-10, s"cov drift across partitionings: $worst")
  }

  test("project: component variance = eigenvalue; whitened variance = 1") {
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val (m, e, projected) = Embeddings.pca(emb, "embedding", 64, r = 2)
    val stats = projected
      .select(element_at(col("proj"), 1).as("p0"),
        element_at(col("proj"), 2).as("p1"))
      .agg(avg(col("p0")).as("m0"), avg(col("p0") * col("p0")).as("s0"),
        avg(col("p1") * col("p1")).as("s1"),
        avg(col("p0") * col("p1")).as("cross"))
      .head()
    // projections are mean-centered → E[p]≈0, E[p²] = λ, E[p0·p1] ≈ 0
    assert(math.abs(stats.getAs[Double]("m0")) < 1e-9)
    assert(math.abs(stats.getAs[Double]("s0") - e.values(0)) < 1e-9 * (1 + e.values(0)))
    assert(math.abs(stats.getAs[Double]("s1") - e.values(1)) < 1e-9 * (1 + e.values(1)))
    assert(math.abs(stats.getAs[Double]("cross")) < 1e-9)
    // whitening rescales each component to unit variance
    val w = Embeddings.project(emb, "embedding", m.mean, e, whiten = true)
      .select(element_at(col("proj"), 1).as("p0"))
      .agg(avg(col("p0") * col("p0")).as("s0")).head().getAs[Double]("s0")
    assert(math.abs(w - 1.0) < 1e-9)
  }

  test("symEigen: residuals at machine precision on the real covariance") {
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val m = Embeddings.moments(emb, "embedding", 64)
    val e = Embeddings.symEigen(m.cov, 4)
    for (k <- 0 until 4) {
      val r = Embeddings.eigenResidual(m.cov, e.values(k), e.vectors(k))
      assert(r < 1e-10 * math.max(1.0, e.values(0)), s"residual($k)=$r")
    }
    // eigenvalue sum bounded by trace; descending order
    assert(e.values.sameElements(e.values.sorted(Ordering[Double].reverse)))
    assert(e.values.sum <= m.trace * (1 + 1e-12))
  }

  test("outlierScores: injected extreme vector dominates; constant dim contributes 0") {
    // 2-D: dim 0 varies ±1, dim 1 is CONSTANT (zero variance — must
    // contribute 0, not NaN); one far outlier at x=9
    val df = toDF(Seq(Array(1f, 5f), Array(-1f, 5f), Array(1f, 5f),
      Array(-1f, 5f), Array(9f, 5f)))
    val got = Embeddings.outlierScores(df, "vec", 2)
      .orderBy(col("id")).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // mean0 = 9/5 = 1.8, var0 = (1+1+1+1+81)/5 - 1.8^2 = 13.76
    val s = math.sqrt(13.76)
    def z(x: Double) = math.pow((x - 1.8) / s, 2)
    assert(math.abs(got(4L) - z(9.0)) < 1e-12)
    assert(math.abs(got(0L) - z(1.0)) < 1e-12)
    assert(got.values.forall(v => !v.isNaN))
    assert(got(4L) > got.filterKeys(_ != 4L).values.max * 5)
  }

  test("kmeans: two separated direction groups recovered, zero-norm dropped") {
    // group A hugs +x, group B hugs +y; seeds (first k by id) land one
    // per group, so 2 rounds must separate them perfectly
    val df = toDF(Seq(
      Array(1f, 0.1f), Array(0.1f, 1f), Array(1f, 0.05f), Array(0.9f, 0f),
      Array(0f, 1f), Array(0.05f, 0.9f), Array(0f, 0f))) // last: zero norm
    val km = Embeddings.kmeans(df, "id", "vec", k = 2, iters = 2)
    val got = km.assigned.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!got.contains(6L)) // zero-norm vector excluded
    assert(got(0L) == got(2L) && got(2L) == got(3L)) // +x group together
    assert(got(1L) == got(4L) && got(4L) == got(5L)) // +y group together
    assert(got(0L) != got(1L))
    // objective is non-increasing and strictly improved from the seeds
    assert(km.objective.zip(km.objective.tail)
      .forall { case (a, b) => b <= a + 1e-12 })
    // centroids are unit vectors
    assert(km.centroids.forall(c =>
      math.abs(c.map(x => x.toDouble * x).sum - 1.0) < 1e-6))
  }

  test("kmeans: emptied cluster keeps its centroid; determinism across runs") {
    // all mass near +x and k=3: at least one seed cluster empties out
    val vs = Seq(Array(1f, 0f), Array(0.99f, 0.01f), Array(0.98f, 0.02f),
      Array(0.97f, 0.03f), Array(0.96f, 0.04f))
    val a = Embeddings.kmeans(toDF(vs), "id", "vec", k = 3, iters = 2)
    val b = Embeddings.kmeans(toDF(vs), "id", "vec", k = 3, iters = 2)
    assert(a.centroids == b.centroids) // deterministic end to end
    assert(a.centroids.length == 3)    // emptied clusters retain positions
    val assigns = a.assigned.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigns == b.assigned.select(col("id"), col("cluster")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap)
  }

  test("randomProjection: hand-computed components and JL norm preservation") {
    def sign(i: Int, j: Int): Double =
      if ((37 * i + 101 * j) % 7 < 4) 1.0 else -1.0
    val v = Array.tabulate(8)(i => (i + 1).toFloat) // 1..8
    val got = Embeddings.randomProjection(toDF(Seq(v)), "id", "vec",
        inDim = 8, outDim = 4)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    (0 until 4).foreach { j =>
      val expect = (0 until 8).map(i => v(i) * sign(i, j)).sum / 2.0
      val rounded = BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(got(j) - rounded) < 1e-9, s"component $j")
    }
    // JL contract on a small batch: squared norms preserved in
    // expectation — the mean ratio stays within a loose band
    val vs = Seq.tabulate(12)(n => Array.tabulate(8)(i =>
      math.sin(n * 8 + i + 1).toFloat))
    val proj = Embeddings.randomProjection(toDF(vs), "id", "vec", 8, 4)
      .groupBy(col("id")).agg(sum(col("y6") * col("y6")).as("pn"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ratios = vs.zipWithIndex.map { case (x, n) =>
      proj(n.toLong) / x.map(a => a.toDouble * a).sum
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.3 && mean < 3.0, s"mean norm ratio $mean")
  }
}
