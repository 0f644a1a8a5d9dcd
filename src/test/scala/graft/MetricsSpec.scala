package graft

import org.apache.spark.sql.functions._

import graft.ext.Metrics

/** Metric-family specs (round 6): each statistic against brute force /
  * closed form on fixtures, plus the PAVA invariants.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("aucROC equals the brute-force pairwise probability (with ties)") {
    val rnd = new scala.util.Random(5)
    val rows = (1 to 300).map { _ =>
      val y = rnd.nextInt(2)
      // overlapping but shifted score distributions, coarse → many ties
      val s = rnd.nextInt(12) + y * rnd.nextInt(4)
      (s.toLong, y)
    }
    val df = rows.toDF("s", "y")
    val auc = Metrics.aucROC(df, col("s"), col("y") === 1)
      .head().getDouble(2)
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val brute = pos.flatMap(p => neg.map(n =>
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0)).sum /
      (pos.size.toDouble * neg.size)
    assert(math.abs(auc - brute) < 1e-12)
    // degenerate anchors
    val sep = Seq((1L, 0), (2L, 0), (10L, 1), (11L, 1)).toDF("s", "y")
    assert(Metrics.aucROC(sep, col("s"), col("y") === 1)
      .head().getDouble(2) == 1.0)
  }

  test("ksTwoSample equals the brute-force ECDF sweep; 0 for identical, " +
      "1 for disjoint samples") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 400).map { _ =>
      val a = rnd.nextBoolean()
      (rnd.nextInt(30) + (if (a) 3 else 0), a)
    }
    val df = rows.map { case (v, a) => (v.toLong, a) }.toDF("v", "a")
    val got = Metrics.ksTwoSample(df, col("v"), col("a")).head()
    val sa = rows.filter(_._2).map(_._1).sorted
    val sb = rows.filterNot(_._2).map(_._1).sorted
    val pool = (sa ++ sb).distinct.sorted
    val brute = pool.map { x =>
      math.abs(sa.count(_ <= x).toDouble / sa.size -
        sb.count(_ <= x).toDouble / sb.size)
    }.max
    assert(math.abs(got.getDouble(2) - brute) < 1e-12)
    val same = Seq((1L, true), (1L, false), (5L, true), (5L, false))
      .toDF("v", "a")
    assert(Metrics.ksTwoSample(same, col("v"), col("a"))
      .head().getDouble(2) == 0.0)
    val disj = Seq((1L, true), (2L, true), (8L, false), (9L, false))
      .toDF("v", "a")
    assert(Metrics.ksTwoSample(disj, col("v"), col("a"))
      .head().getDouble(2) == 1.0)
  }

  test("cohenKappa: 1 on perfect agreement; closed form on a known " +
      "confusion matrix") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"), ("a", "a"))
      .toDF("ra", "rb")
    assert(Metrics.cohenKappa(perfect, col("ra"), col("rb"))
      .head().getDouble(3) == 1.0)
    // the standard worked example: 2×2 with counts a=20 agree-yes,
    // d=15 agree-no, b=5, c=10 → po=0.7, pe=0.5 → kappa=0.4
    val rows = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val got = Metrics.cohenKappa(rows.toDF("ra", "rb"),
      col("ra"), col("rb")).head()
    assert(got.getLong(0) == 50L)
    assert(math.abs(got.getDouble(1) - 0.7) < 1e-12)
    assert(math.abs(got.getDouble(2) - 0.5) < 1e-12)
    assert(math.abs(got.getDouble(3) - 0.4) < 1e-12)
  }

  test("chiSquare: closed form on a 2x2 table, zero for independence, " +
      "zero-observed cells included") {
    // O = [[10, 20], [30, 40]]: N=100, chi2 = N(ad-bc)^2/(r1 r2 c1 c2)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val got = Metrics.chiSquare(rows.toDF("ra", "cb"),
      col("ra"), col("cb")).head()
    val expected = 100.0 * math.pow(10 * 40 - 20 * 30, 2) /
      (30.0 * 70.0 * 40.0 * 60.0)
    assert(got.getLong(0) == 100L && got.getLong(1) == 1L)
    assert(math.abs(got.getDouble(2) - expected) < 1e-9)
    // perfectly proportional table → chi2 == 0
    val ind = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    assert(Metrics.chiSquare(ind.toDF("ra", "cb"), col("ra"), col("cb"))
      .head().getDouble(2) == 0.0)
    // a category pair never observed together still contributes (O=0,E>0)
    val z = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
    val chi = Metrics.chiSquare(z.toDF("ra", "cb"), col("ra"), col("cb"))
      .head().getDouble(2)
    assert(math.abs(chi - 4.0) < 1e-12) // full separation of 2x2 with n=4
  }

  test("bradleyTerry: 2-item closed form (strength ratio = win ratio), " +
      "booleans hold") {
    val pairs = Seq(("x", "y", 30L, 10L)).toDF("ia", "ib", "wa", "wb")
    val got = Metrics.bradleyTerry(pairs, "ia", "ib", "wa", "wb")
      .orderBy("item").collect()
    val (px, py) = (got(0), got(1))
    assert(px.getString(0) == "x" && py.getString(0) == "y")
    assert(px.getLong(1) == 30L && px.getLong(2) == 10L)
    // stationarity for k=2: p_x / p_y = w_xy / w_yx
    assert(math.abs(px.getDouble(3) / py.getDouble(3) - 3.0) < 1e-6)
    assert(math.abs(px.getDouble(3) + py.getDouble(3) - 1.0) < 1e-12)
    assert(px.getBoolean(4) && px.getBoolean(5))
  }

  test("isotonicFit: monotone input unchanged; all-decreasing pools to " +
      "the global mean; PAVA invariants on a random fixture") {
    val mono = Seq(("g", 1L, 1L, 10L), ("g", 2L, 5L, 10L), ("g", 3L, 9L, 10L))
      .toDF("g", "bin", "pos", "n")
    val gotMono = Metrics.isotonicFit(mono, "g", "bin", "pos", "n")
      .orderBy("bin").collect().map(_.getDouble(4)).toSeq
    assert(gotMono == Seq(0.1, 0.5, 0.9))
    val dec = Seq(("g", 1L, 9L, 10L), ("g", 2L, 5L, 10L), ("g", 3L, 1L, 10L))
      .toDF("g", "bin", "pos", "n")
    val gotDec = Metrics.isotonicFit(dec, "g", "bin", "pos", "n")
      .orderBy("bin").collect().map(_.getDouble(4)).toSeq
    assert(gotDec == Seq(0.5, 0.5, 0.5))
    // random multi-group fixture: fitted is non-decreasing per group,
    // and Σ fitted·n = Σ pos within each group (PAVA preserves mass)
    val rnd = new scala.util.Random(3)
    val rows = for (g <- Seq("a", "b", "c"); b <- 1 to 20) yield {
      val n = 1L + rnd.nextInt(9)
      (g, b.toLong, rnd.nextInt(n.toInt + 1).toLong, n)
    }
    val fit = Metrics.isotonicFit(rows.toDF("g", "bin", "pos", "n"),
        "g", "bin", "pos", "n")
      .orderBy("g", "bin")
      .as[(String, Long, Long, Long, Double)].collect()
    fit.groupBy(_._1).values.foreach { grp =>
      val f = grp.sortBy(_._2).map(_._5)
      assert(f.zip(f.tail).forall { case (a, b) => a <= b + 1e-12 })
      val mass = grp.map(r => r._5 * r._4).sum
      assert(math.abs(mass - grp.map(_._3).sum) < 1e-9)
    }
  }

  test("q330 Sinkhorn plan: a valid coupling — nonnegative, unit mass, " +
      "row sums match the source marginal after the final u-step") {
    val rows = SparkEntry.queries("q330_sinkhorn_ot")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.length == 100)
    assert(rows.forall(_._3 >= 0.0))
    val total = rows.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-5, s"plan mass $total")
    // the final half-step scales u to the source marginal a exactly
    // (round-12), so per-i row sums must reproduce the purchase
    // histogram; recompute it independently from the table
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    import org.apache.spark.sql.functions._
    val ev = df.filter(col("event_type").isin("purchase", "click"))
      .select(col("event_type"), round(col("value") * 100, 0)
        .cast("long").as("v"))
    val maxv = ev.agg(max(col("v"))).head().getLong(0)
    val a = ev.filter(col("event_type") === "purchase")
      .groupBy(expr(s"(v * 10) div (${maxv} + 1)").as("bin")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val na = a.values.sum.toDouble
    val rowSums = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    for (i <- 0L to 9L)
      assert(math.abs(rowSums.getOrElse(i, 0.0) -
        a.getOrElse(i, 0L) / na) < 1e-6, s"row $i marginal")
    // cost is a mean |i-j| under the plan: within [0, 9]
    val cost = rows.head._4
    assert(cost >= 0.0 && cost <= 9.0)
  }
}
