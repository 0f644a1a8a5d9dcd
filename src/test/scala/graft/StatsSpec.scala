package graft

import org.apache.spark.sql.functions._

/** Stats-family specs (round 6, q283–q290): each statistic re-derived
  * driver-side with an INDEPENDENT spelling — brute-force pair loops,
  * float textbook formulas, set algebra — against the engine's
  * exact-integer/windowed forms (the AnalyticsSpec convention; the
  * DuckDB oracles share the relational shape by design, so these
  * specs are the shape-independent check).
  */
class StatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q283 Mann-Whitney: 2*U1 equals the brute pairwise count " +
      "(wins*2 + ties) and z matches the textbook float formula") {
    val r = SparkEntry.queries("q283_mann_whitney")(spark, d).head()
    val (n1, n2, twoU1, tsum, z) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))
    val rows = Graft.table(spark, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select((col("event_type") === "purchase").cast("long"),
        round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val g1 = rows.filter(_._1 == 1L).map(_._2)
    val g0 = rows.filter(_._1 == 0L).map(_._2)
    assert(g1.length.toLong == n1 && g0.length.toLong == n2)
    // brute U1: one win = 2, one tie = 1, summed (so it equals 2*U1)
    var brute = 0L
    for (a <- g1; b <- g0)
      brute += (if (a > b) 2L else if (a == b) 1L else 0L)
    assert(brute == twoU1)
    val n = (n1 + n2).toDouble
    val ties = (g1 ++ g0).groupBy(identity).values.map(_.length.toLong)
    assert(ties.map(t => t * t * t - t).sum == tsum)
    val varU = n1 * n2 / 12.0 *
      ((n + 1) - tsum / (n * (n - 1)))
    val zRef = (twoU1 / 2.0 - n1 * n2 / 2.0) / math.sqrt(varU)
    assert(math.abs(z - zRef) < 5e-7)
  }

  test("q284 BH rejected set equals a driver-side run of the step-up " +
      "procedure on independently computed z-scores") {
    val out = SparkEntry.queries("q284_fdr_bh")(spark, d)
      .select(col("bucket"), col("rejected")).collect()
      .map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    val byb = Graft.table(spark, d, "events")
      .groupBy(pmod(col("event_id"), lit(64)).cast("long").as("b"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("k"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val tn = byb.map(_._2).sum
    val tk = byb.map(_._3).sum
    val m = byb.length
    val ps = byb.map { case (b, ni, ki) =>
      val z = (ki * tn - ni * tk).toDouble /
        math.sqrt((ni * tk * (tn - tk)).toDouble)
      b -> 1.0 / (1.0 + z * z)
    }
    val sorted = ps.sortBy { case (b, p) => (p, b) }
    val kmax = sorted.zipWithIndex
      .filter { case ((_, p), i) => p <= (i + 1).toDouble / m }
      .map(_._2 + 1).reduceOption(_ max _).getOrElse(0)
    val expect = sorted.zipWithIndex
      .map { case ((b, _), i) => b -> (i + 1 <= kmax) }.toMap
    assert(out == expect)
    assert(out.values.exists(identity) || kmax == 0) // procedure ran
  }

  test("q285 Kendall tau-b: engine pair counts equal a brute double " +
      "loop over the same hash-capped per-nation sample") {
    val eng = SparkEntry.queries("q285_kendall_tau")(spark, d)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ov = Graft.table(spark, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
    val cust = Graft.table(spark, d, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("b"))
      .join(ov, col("c_custkey") === col("o_custkey"))
      .select(col("c_nationkey").cast("long"), col("c_custkey").cast("long"),
        col("b"), col("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    val byNk = cust.groupBy(_._1).map { case (nk, xs) =>
      val samp = xs.sortBy(x =>
        (math.floorMod(x._2 * 2654435761L, 1000000007L), x._2)).take(120)
      var (c, dd, tb, tv) = (0L, 0L, 0L, 0L)
      for {
        i <- samp.indices; j <- samp.indices
        if samp(i)._2 < samp(j)._2
      } {
        val sb = java.lang.Long.signum(samp(j)._3 - samp(i)._3)
        val sv = java.lang.Long.signum(samp(j)._4 - samp(i)._4)
        if (sb * sv == 1) c += 1
        else if (sb * sv == -1) dd += 1
        if (sb == 0) tb += 1
        if (sv == 0) tv += 1
      }
      nk -> (c, dd, tb, tv)
    }
    assert(eng == byNk)
  }

  test("q286 log-rank matches a driver-side textbook recompute of " +
      "O1/E1/V from the same lifetimes") {
    val r = SparkEntry.queries("q286_log_rank")(spark, d).head()
    val (o1, e1, v, chi2) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val ev = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getString(3)))
    val byU = ev.groupBy(_._1).map { case (u, xs) =>
      val last = xs.maxBy(x => (x._2, x._3))
      val t = (xs.map(_._2).max - xs.map(_._2).min) / 86400000000L
      (u % 2, t, if (last._4 != "view") 1L else 0L)
    }.toSeq
    val days = byU.map(_._2).distinct.sorted
    var (e1s, vs, o1s) = (0.0, 0.0, 0L)
    for (t <- days) {
      val d1 = byU.count(x => x._1 == 0 && x._2 == t && x._3 == 1L)
      val d2 = byU.count(x => x._1 == 1 && x._2 == t && x._3 == 1L)
      val dd = d1 + d2
      val n1t = byU.count(x => x._1 == 0 && x._2 >= t).toDouble
      val n2t = byU.count(x => x._1 == 1 && x._2 >= t).toDouble
      val nn = n1t + n2t
      if (dd > 0) {
        o1s += d1
        e1s += dd * n1t / nn
        if (nn > 1) vs += dd * (n1t / nn) * (n2t / nn) * (nn - dd) / (nn - 1)
      }
    }
    assert(o1 == o1s)
    assert(math.abs(e1 - e1s) < 5e-7)
    assert(math.abs(v - vs) < 5e-7)
    val chiRef = (o1s - e1s) * (o1s - e1s) / vs
    assert(math.abs(chi2 - chiRef) < 1e-5)
  }

  test("q287 Adamic-Adar top-20 equals a brute common-neighbor scan " +
      "over the collected sampled graph") {
    val eng = SparkEntry.queries("q287_adamic_adar")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val li = Graft.table(spark, d, "lineitem")
      .filter(pmod(col("l_orderkey").cast("long") * lit(2654435761L),
        lit(20L)) === 0)
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect().map(x => (x.getLong(0), x.getLong(1)))
    val edges = li.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val wz = adj.map { case (z, nbs) =>
      z -> math.round(1000000.0 / math.log(nbs.size.toDouble))
    }
    val nodes = adj.keys.toSeq.sorted
    val cand = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
      a = nodes(i); b = nodes(j)
      if !edges.contains((a, b))
      common = adj(a).intersect(adj(b))
      if common.nonEmpty
    } yield (a, b, common.size.toLong, common.toSeq.map(wz).sum)
    val expect = cand.sortBy { case (a, b, _, s) => (-s, a, b) }.take(20)
    assert(eng.toSeq == expect)
  }

  test("q288 KMV sketches are mergeable: union of per-half k-minima " +
      "has the same k-th minimum as the whole set") {
    val hs = Graft.table(spark, d, "events")
      .select(col("event_type"),
        pmod(col("user_id") * lit(2654435761L), lit(4294967296L)).as("h"),
        pmod(col("event_id"), lit(2)).as("half"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val k = 16
    for (tpe <- hs.map(_._1).distinct) {
      val whole = hs.filter(_._1 == tpe).map(_._2).distinct.sorted
      val sk0 = hs.filter(x => x._1 == tpe && x._3 == 0L).map(_._2)
        .distinct.sorted.take(k)
      val sk1 = hs.filter(x => x._1 == tpe && x._3 == 1L).map(_._2)
        .distinct.sorted.take(k)
      val merged = (sk0 ++ sk1).distinct.sorted.take(k)
      assert(merged.toSeq == whole.take(k).toSeq,
        s"KMV merge mismatch for $tpe")
    }
    // and the query's hk is the true 16th smallest distinct hash
    val eng = SparkEntry.queries("q288_kmv_sketch")(spark, d).collect()
    for (r <- eng) {
      val whole = hs.filter(_._1 == r.getString(0)).map(_._2)
        .distinct.sorted
      if (whole.length >= k) assert(r.getLong(2) == whole(k - 1))
    }
  }

  test("q289 changepoint maximizes brute two-segment SSE reduction") {
    val r = SparkEntry.queries("q289_changepoint")(spark, d).head()
    val (day, red) = (r.getLong(0), r.getDouble(3))
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val lo = daily.map(_._1).min
    val hi = daily.map(_._1).max
    val m = daily.toMap
    val xs = (lo to hi).map(t => t -> m.getOrElse(t, 0L).toDouble)
    def sse(v: Seq[Double]): Double = {
      val mu = v.sum / v.length
      v.map(x => (x - mu) * (x - mu)).sum
    }
    val total = sse(xs.map(_._2))
    val best = (1 until xs.length).map { i =>
      val (l, rr) = xs.splitAt(i)
      (xs(i - 1)._1, total - sse(l.map(_._2)) - sse(rr.map(_._2)))
    }.maxBy { case (t, g) => (g, -t) }
    assert(day == best._1)
    assert(math.abs(red - best._2) < 1e-4)
  }

  test("q291 ANOVA F matches the textbook mean-centered recompute") {
    val r = SparkEntry.queries("q291_anova_f")(spark, d).head()
    val (ssb, ssw, f) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val rows = Graft.table(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1).toDouble))
    val groups = rows.groupBy(_._1).values.map(_.map(_._2)).toSeq
    val all = rows.map(_._2)
    val gm = all.sum / all.length
    val ssbRef = groups.map { g =>
      val m = g.sum / g.length; g.length * (m - gm) * (m - gm)
    }.sum
    val sswRef = groups.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    val k = groups.size
    val fRef = (ssbRef / (k - 1)) / (sswRef / (all.length - k))
    assert(math.abs(ssb - ssbRef) < 1e-3 * math.abs(ssbRef))
    assert(math.abs(ssw - sswRef) < 1e-3 * math.abs(sswRef))
    assert(math.abs(f - fRef) < 1e-4 * math.abs(fRef) + 1e-6)
  }

  test("q292 Kruskal-Wallis H matches a brute average-rank recompute") {
    val r = SparkEntry.queries("q292_kruskal_wallis")(spark, d).head()
    val (n, hc) = (r.getLong(0), r.getDouble(4))
    val rows = Graft.table(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    assert(rows.length.toLong == n)
    val sorted = rows.map(_._2).sorted
    val avgRank = sorted.zipWithIndex.groupBy(_._1)
      .map { case (v, xs) => v -> xs.map(_._2 + 1).sum.toDouble / xs.length }
    val byG = rows.groupBy(_._1)
    val hRef = 12.0 / (n * (n + 1)) * byG.values.map { g =>
      val rs = g.map(x => avgRank(x._2)).sum
      rs * rs / g.length
    }.sum - 3 * (n + 1)
    val ties = rows.groupBy(_._2).values
      .map(t => math.pow(t.length, 3) - t.length).sum
    val hcRef = hRef / (1.0 - ties / (math.pow(n.toDouble, 3) - n))
    assert(math.abs(hc - hcRef) < 1e-4)
  }

  test("q293 McNemar cells partition the users and chi2 is the " +
      "discordant-cell formula") {
    val r = SparkEntry.queries("q293_mcnemar")(spark, d).head()
    val (n11, n10, n01, n00, chi2) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    val ev = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("event_type") === "purchase").cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val lo = ev.map(_._2).min
    val byU = ev.groupBy(_._1).values.map { xs =>
      val p1 = xs.exists(x => (x._2 - lo) / 15 == 0 && x._3 == 1L)
      val p2 = xs.exists(x => (x._2 - lo) / 15 >= 1 && x._3 == 1L)
      (p1, p2)
    }.toSeq
    assert(n11 == byU.count(x => x._1 && x._2))
    assert(n10 == byU.count(x => x._1 && !x._2))
    assert(n01 == byU.count(x => !x._1 && x._2))
    assert(n00 == byU.count(x => !x._1 && !x._2))
    if (n10 + n01 > 0) {
      val ref = (n10 - n01).toDouble * (n10 - n01) / (n10 + n01)
      assert(math.abs(chi2 - ref) < 5e-7)
    }
  }

  test("q294 Friedman chi2 matches a brute within-block rank recompute") {
    val out = SparkEntry.queries("q294_friedman")(spark, d).collect()
    val chi2 = out.head.getDouble(3)
    val rows = Graft.table(spark, d, "events")
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val types = rows.map(_._2).distinct.sorted
    val k = types.length
    val users = rows.map(_._1).distinct
    val n = users.length
    val rankSums = scala.collection.mutable.Map(
      types.map(_ -> 0.0): _*)
    for (u <- users) {
      val sums = types.map(t =>
        t -> rows.filter(x => x._1 == u && x._2 == t).map(_._3).sum)
      val avgRank = sums.map(_._2).sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) =>
          v -> xs.map(_._2 + 1).sum.toDouble / xs.length }
      for ((t, v) <- sums) rankSums(t) += avgRank(v)
    }
    val chiRef = 12.0 / (n * k * (k + 1)) *
      rankSums.values.map(r => r * r).sum - 3.0 * n * (k + 1)
    assert(math.abs(chi2 - chiRef) < 1e-4)
    // engine 2R_j doubles the brute rank sums
    val engRj = out.map(r => r.getString(0) -> r.getLong(2)).toMap
    for (t <- types)
      assert(engRj(t) == math.round(2 * rankSums(t)))
  }

  test("q295 effect sizes: Cohen's d from sample moments, Cliff's " +
      "delta from a brute pairwise dominance count") {
    val r = SparkEntry.queries("q295_effect_sizes")(spark, d).head()
    val (dEff, delta) = (r.getDouble(2), r.getDouble(3))
    val rows = Graft.table(spark, d, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select((col("event_type") === "purchase").cast("long"),
        round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1).toDouble))
    val g1 = rows.filter(_._1 == 1L).map(_._2)
    val g0 = rows.filter(_._1 == 0L).map(_._2)
    def varS(v: Seq[Double]): Double = {
      val m = v.sum / v.length
      v.map(x => (x - m) * (x - m)).sum / (v.length - 1)
    }
    val sp = math.sqrt(((g1.length - 1) * varS(g1) +
      (g0.length - 1) * varS(g0)) / (g1.length + g0.length - 2))
    val dRef = (g1.sum / g1.length - g0.sum / g0.length) / sp
    assert(math.abs(dEff - dRef) < 1e-5)
    var dom = 0L
    for (a <- g1; b <- g0)
      dom += (if (a > b) 1L else if (a < b) -1L else 0L)
    val deltaRef = dom.toDouble / (g1.length.toLong * g0.length)
    assert(math.abs(delta - deltaRef) < 5e-7)
  }

  test("q296 trigram novelty matches driver-side set algebra") {
    val eng = SparkEntry.queries("q296_ngram_novelty")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val docs = Graft.table(spark, d, "documents")
      .select(col("doc_id"), col("lang"), lower(col("text")))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getString(2)))
    def grams(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val expect = docs.groupBy(_._2).flatMap { case (lang, xs) =>
      val train = xs.filter(x =>
        math.floorMod(x._1 * 2654435761L, 10L) < 8)
        .flatMap(x => grams(x._3)).toSet
      val test = xs.filter(x =>
        math.floorMod(x._1 * 2654435761L, 10L) >= 8)
        .flatMap(x => grams(x._3)).toSet
      if (test.isEmpty) None
      else Some(lang ->
        (test.size.toLong, test.diff(train).size.toLong))
    }
    assert(eng == expect)
  }

  test("q297 Mann-Kendall S and variance match the brute recompute") {
    val r = SparkEntry.queries("q297_mann_kendall")(spark, d).head()
    val (n, sEng, varnum, z) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4))
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val lo = daily.map(_._1).min
    val hi = daily.map(_._1).max
    val m = daily.toMap
    val xs = (lo to hi).map(t => m.getOrElse(t, 0L))
    assert(n == xs.length.toLong)
    var sRef = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sRef += java.lang.Long.signum(xs(j) - xs(i))
    assert(sEng == sRef)
    val nn = xs.length.toLong
    val tie = xs.groupBy(identity).values
      .map(t => t.length.toLong)
      .map(t => t * (t - 1) * (2 * t + 5)).sum
    assert(varnum == nn * (nn - 1) * (2 * nn + 5) - tie)
    if (sRef != 0) {
      val zRef = (sRef - java.lang.Long.signum(sRef)).toDouble /
        math.sqrt(varnum / 18.0)
      assert(math.abs(z - zRef) < 5e-7)
    }
  }

  test("q298 Cochran Q matches the textbook row/column-sum formula " +
      "on the adaptive above-own-mean indicators") {
    val r = SparkEntry.queries("q298_cochran_q")(spark, d).head()
    val (k, q) = (r.getLong(0), r.getDouble(4))
    val raw = Graft.table(spark, d, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val types = raw.map(_._2).distinct.sorted
    assert(k == types.length.toLong)
    // complete blocks: missing (user, type) cells are zero counts
    val cells = for {
      u <- raw.map(_._1).distinct
      t <- types
    } yield (u, t,
      raw.find(x => x._1 == u && x._2 == t).map(_._3).getOrElse(0L))
    val xx = cells.map { case (u, t, c) =>
      val total = cells.filter(_._1 == u).map(_._3).sum
      (u, t, if (c * k > total) 1L else 0L)
    }
    val gj = types.map(t => xx.filter(_._2 == t).map(_._3).sum)
    val li = xx.map(_._1).distinct
      .map(u => xx.filter(_._1 == u).map(_._3).sum)
    val den = k * li.sum - li.map(l => l * l).sum
    if (den > 0) {
      val qRef = (k - 1).toDouble *
        (k * gj.map(g => g * g).sum - math.pow(gj.sum.toDouble, 2)) / den
      assert(math.abs(q - qRef) < 1e-4)
    } else assert(q == 0.0)
  }

  test("q299 Brown-Forsythe equals ANOVA F on median-centered " +
      "absolute deviations") {
    val r = SparkEntry.queries("q299_brown_forsythe")(spark, d).head()
    val f = r.getDouble(2)
    val rows = Graft.table(spark, d, "events")
      .select(col("event_type"), round(col("value") * 100, 0).cast("long"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val devs = rows.groupBy(_._1).values.toSeq.flatMap { g =>
      val sorted = g.map(_._2).sorted
      val med = sorted(((sorted.length + 1) / 2) - 1) // lower median
      g.map(x => math.abs(x._2 - med).toDouble)
    }
    val groups = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      val sorted = g.map(_._2).sorted
      val med = sorted(((sorted.length + 1) / 2) - 1)
      g.map(x => math.abs(x._2 - med).toDouble)
    }
    val all = groups.flatten
    val gm = all.sum / all.length
    val ssb = groups.map { g =>
      val m = g.sum / g.length; g.length * (m - gm) * (m - gm) }.sum
    val ssw = groups.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum }.sum
    val k = groups.length
    val fRef = (ssb / (k - 1)) / (ssw / (all.length - k))
    assert(math.abs(f - fRef) < 1e-3 * math.abs(fRef) + 1e-6)
    assert(devs.length == all.length)
  }

  test("q300 quality monitor: each leg agrees with its standalone " +
      "family member on the same series") {
    val r = SparkEntry.queries("q300_quality_monitor")(spark, d).head()
    val (nDays, mkS, trendDir, cpDay, nAnom) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(6))
    assert(trendDir == java.lang.Long.signum(mkS))
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val lo = daily.map(_._1).min
    val hi = daily.map(_._1).max
    val m = daily.toMap
    val xs = (lo to hi).map(t => t -> m.getOrElse(t, 0L))
    assert(nDays == xs.length.toLong)
    // MK leg
    var sRef = 0L
    for (i <- xs.indices; j <- (i + 1) until xs.length)
      sRef += java.lang.Long.signum(xs(j)._2 - xs(i)._2)
    assert(mkS == sRef)
    // changepoint leg: brute argmax of the exact reduction formula
    val n = xs.length.toLong
    val stot = xs.map(_._2).sum
    var best = (Long.MinValue, Double.MinValue)
    var sl = 0L
    for (i <- 1 until xs.length) {
      sl += xs(i - 1)._2
      val num = (sl * n - stot * i).toDouble
      val red = (num / i) * (num / (n * (n - i)))
      if (red > best._2) best = (xs(i - 1)._1, red)
    }
    assert(cpDay == best._1)
    // MAD leg: recompute with lower medians
    val sorted = xs.map(_._2).sorted
    val med = sorted(((sorted.length + 1) / 2) - 1)
    val ads = xs.map(x => math.abs(x._2 - med)).sorted
    val mad = ads(((ads.length + 1) / 2) - 1)
    val anomRef = xs.count(x =>
      math.abs(x._2 - med).toDouble > 3.0 * 1.4826 * mad.toDouble)
    assert(nAnom == anomRef.toLong)
  }

  test("q301 OLS: normal-equation residual orthogonality holds at " +
      "the fitted coefficients (X'(y - Xb) ~ 0) and R2 is sane") {
    val r = SparkEntry.queries("q301_ols_cramer")(spark, d).head()
    val (b0, b1, b2, r2) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    val rows = Graft.table(spark, d, "lineitem")
      .select(col("l_quantity").cast("long"),
        round(col("l_discount") * 10000, 0).cast("long"),
        round(col("l_extendedprice") * 100, 0).cast("long"))
      .collect()
      .map(x => (x.getLong(0).toDouble, x.getLong(1).toDouble,
        x.getLong(2).toDouble))
    // independent driver-side solve of the normal equations by
    // Gaussian elimination (no Cramer anywhere)
    val n = rows.length.toDouble
    val a = Array.ofDim[Double](3, 4)
    a(0)(0) = n
    a(0)(1) = rows.map(_._1).sum; a(0)(2) = rows.map(_._2).sum
    a(0)(3) = rows.map(_._3).sum
    a(1)(0) = a(0)(1); a(1)(1) = rows.map(r => r._1 * r._1).sum
    a(1)(2) = rows.map(r => r._1 * r._2).sum
    a(1)(3) = rows.map(r => r._1 * r._3).sum
    a(2)(0) = a(0)(2); a(2)(1) = a(1)(2)
    a(2)(2) = rows.map(r => r._2 * r._2).sum
    a(2)(3) = rows.map(r => r._2 * r._3).sum
    for (p <- 0 until 3; i <- (p + 1) until 3) {
      val f = a(i)(p) / a(p)(p)
      for (j <- p until 4) a(i)(j) -= f * a(p)(j)
    }
    val bRef = new Array[Double](3)
    for (i <- 2 to 0 by -1) {
      var s = a(i)(3)
      for (j <- (i + 1) until 3) s -= a(i)(j) * bRef(j)
      bRef(i) = s / a(i)(i)
    }
    assert(math.abs(b0 - bRef(0)) < 1e-3 * (math.abs(bRef(0)) + 1))
    assert(math.abs(b1 - bRef(1)) < 1e-3 * (math.abs(bRef(1)) + 1))
    assert(math.abs(b2 - bRef(2)) < 1e-3 * (math.abs(bRef(2)) + 1))
    assert(r2 >= 0.0 && r2 <= 1.0)
    // this testdata's features are INDEPENDENT of price by
    // construction — near-zero R2 is the correct answer here, and the
    // coefficient agreement above is the real check
  }

  test("q302 logistic contract booleans hold AND a driver-side Newton " +
      "on the same rows converges with the same slope sign") {
    val r = SparkEntry.queries("q302_logistic_newton")(spark, d).head()
    assert(r.getBoolean(2), "engine Newton did not converge")
    assert(r.getBoolean(3), "log-likelihood not monotone")
    assert(r.getBoolean(4), "slope sign mismatch vs covariance")
    val rows = Graft.table(spark, d, "events")
      .select((round(col("value") * 100, 0).cast("long").cast("double") /
        lit(10000.0)).as("x"),
        (col("event_type") === "purchase").cast("double").as("y"))
      .collect().map(x => (x.getDouble(0), x.getDouble(1)))
    var (b0, b1) = (0.0, 0.0)
    for (_ <- 1 to 8) {
      var (g0, g1, h00, h01, h11) = (0.0, 0.0, 0.0, 0.0, 0.0)
      for ((x, y) <- rows) {
        val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
        g0 += y - p; g1 += (y - p) * x
        val w = p * (1 - p)
        h00 += w; h01 += w * x; h11 += w * x * x
      }
      val det = h00 * h11 - h01 * h01
      b0 += (h11 * g0 - h01 * g1) / det
      b1 += (h00 * g1 - h01 * g0) / det
    }
    var (g0, g1) = (0.0, 0.0)
    for ((x, y) <- rows) {
      val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * x)))
      g0 += y - p; g1 += (y - p) * x
    }
    assert(math.abs(g0) + math.abs(g1) < 1e-6 * rows.length)
  }

  test("q303 Shapley: efficiency (sum of phis = v_full - v_empty) and " +
      "agreement with the factorial-weight brute formula") {
    val r = SparkEntry.queries("q303_shapley_channels")(spark, d).head()
    val (pc, pv, ps, vdiff) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(math.abs((pc + pv + ps) - vdiff) < 5e-6) // 6dp rounding slack
    // brute: per-user masks from raw events, v(S) over exact sets,
    // phi via the |S|!(k-|S|-1)!/k! weights
    val ev = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val firstP = ev.filter(_._2 == "purchase").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val users = ev.groupBy(_._1).flatMap { case (u, xs) =>
      val cutoff = firstP.get(u)
      val pre = xs.filter(x => cutoff.forall(x._3 < _))
      if (pre.isEmpty) None
      else {
        val m = (if (pre.exists(_._2 == "click")) 1 else 0) |
          (if (pre.exists(_._2 == "view")) 2 else 0) |
          (if (pre.exists(_._2 == "signup")) 4 else 0)
        Some((m, if (cutoff.isDefined) 1L else 0L))
      }
    }.toSeq
    val nm = (0 to 7).map(m => users.count(_._1 == m).toLong)
    val cm = (0 to 7).map(m => users.filter(_._1 == m).map(_._2).sum)
    def v(m: Int): Double =
      if (nm(m) > 0) cm(m).toDouble / nm(m) else 0.0
    def fact(i: Int): Double = (1 to i).product.toDouble
    def phiBrute(bit: Int): Double = {
      val others = Seq(1, 2, 4).filterNot(_ == bit)
      (for {
        s <- 0 to 3 // subsets of the other two bits, encoded
      } yield {
        val subset = Seq(others.head, others(1)).zipWithIndex
          .filter { case (_, i) => ((s >> i) & 1) == 1 }.map(_._1)
        val mask = subset.sum
        val sz = subset.length
        fact(sz) * fact(3 - sz - 1) / fact(3) * (v(mask | bit) - v(mask))
      }).sum
    }
    assert(math.abs(pc - phiBrute(1)) < 5e-7)
    assert(math.abs(pv - phiBrute(2)) < 5e-7)
    assert(math.abs(ps - phiBrute(4)) < 5e-7)
  }

  test("q304 HITS: L1 normalization holds and a driver-side recompute " +
      "of the unrolled rounds matches exactly") {
    val out = SparkEntry.queries("q304_hits")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-6)
    assert(math.abs(out.map(_._3).sum - 1.0) < 1e-6)
    assert(out.forall(x => x._2 >= 0 && x._3 >= 0))
    val ev = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    val edges = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._4)
      s.zip(s.drop(1)).filter(p => p._1 != p._2)
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var hub = nodes.map(_ -> r12(1.0 / nodes.length)).toMap
    var auth = nodes.map(_ -> r12(1.0 / nodes.length)).toMap
    for (_ <- 1 to 2) {
      val ar = nodes.map(v =>
        v -> edges.filter(_._2 == v).toSeq.map(e => hub(e._1)).sum).toMap
      val as = ar.values.sum
      auth = ar.map { case (k, x) => k -> r12(x / as) }
      val hr = nodes.map(u =>
        u -> edges.filter(_._1 == u).toSeq.map(e => auth(e._2)).sum).toMap
      val hs = hr.values.sum
      hub = hr.map { case (k, x) => k -> r12(x / hs) }
    }
    for ((id, h8, a8) <- out) {
      assert(math.abs(h8 - hub(id)) < 5e-8, s"hub mismatch node $id")
      assert(math.abs(a8 - auth(id)) < 5e-8, s"auth mismatch node $id")
    }
  }

  test("q305 embedding drift matches a driver-side recompute of " +
      "per-dim means, shifts, and the mean-vector cosine") {
    val r = SparkEntry.queries("q305_embedding_drift")(spark, d).head()
    val (nd, ns, cos, mx) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val rows = Graft.table(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(x => (x.getLong(0),
        x.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = rows.head._2.length
    assert(nd == dims.toLong)
    def mean(h: Long, i: Int): Double = {
      val vs = rows.filter(_._1 % 2 == h).map(_._2(i))
      val m = vs.sum / vs.length
      BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ma = (0 until dims).map(mean(0, _))
    val mb = (0 until dims).map(mean(1, _))
    val shifts = ma.zip(mb).map { case (a, b) =>
      BigDecimal(b - a).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble }
    assert(ns == shifts.count(s => math.abs(s) > 0.02).toLong)
    assert(math.abs(mx - shifts.map(math.abs).max) < 1e-9)
    val dot = ma.zip(mb).map { case (a, b) => a * b }.sum
    val cosRef = dot / (math.sqrt(ma.map(a => a * a).sum) *
      math.sqrt(mb.map(b => b * b).sum))
    assert(math.abs(cos - cosRef) < 1e-5)
  }

  test("q306 trigram LM: per-token probabilities are valid and the " +
      "held-out log-likelihood matches a driver recompute") {
    val r = SparkEntry.queries("q306_trigram_lm")(spark, d).head()
    val (ntok, v, ll, ppl) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    assert(ppl > 1.0)
    val docs = Graft.table(spark, d, "documents")
      .select(col("doc_id"), lower(col("text")))
      .collect().map(x => (x.getLong(0), x.getString(1).split(" ", -1)))
    val (train, test) = docs.partition(x =>
      math.floorMod(x._1 * 2654435761L, 10L) < 8)
    val uni = scala.collection.mutable.Map[String, Long]()
    val big = scala.collection.mutable.Map[(String, String), Long]()
    val tri = scala.collection.mutable.Map[(String, String, String), Long]()
    for ((_, t) <- train) {
      t.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1)
      t.zip(t.drop(1)).foreach(p => big(p) = big.getOrElse(p, 0L) + 1)
      t.zip(t.drop(1)).zip(t.drop(2)).foreach { case ((a, b), c) =>
        tri((a, b, c)) = tri.getOrElse((a, b, c), 0L) + 1 }
    }
    val nn = uni.values.sum.toDouble
    val vv = uni.size.toDouble
    var llRef = 0.0
    var cnt = 0L
    for ((_, t) <- test; i <- 2 until t.length) {
      val (w1, w2, w3) = (t(i - 2), t(i - 1), t(i))
      val p3 = big.get((w1, w2)).flatMap(c2 =>
        tri.get((w1, w2, w3)).map(_.toDouble / c2)).getOrElse(0.0)
      val p2 = uni.get(w2).flatMap(c1 =>
        big.get((w2, w3)).map(_.toDouble / c1)).getOrElse(0.0)
      val p1 = uni.get(w3).map(_.toDouble / nn).getOrElse(0.0)
      val p = 0.5 * p3 + 0.3 * p2 + 0.15 * p1 + 0.05 / (vv + 1)
      assert(p > 0 && p <= 1.000001)
      llRef += math.log(p)
      cnt += 1
    }
    assert(ntok == cnt)
    assert(v == uni.size.toLong)
    assert(math.abs(ll - llRef) < 1e-3)
  }

  test("q307 conformal: qhat is the exact order statistic and " +
      "coverage counts test residuals under it") {
    val r = SparkEntry.queries("q307_conformal")(spark, d).head()
    val (nCal, nTest, qhat, nCov) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).sortBy(_._1)
    val lo = daily.map(_._1).min; val hi = daily.map(_._1).max
    val m = daily.toMap
    val xs = (lo to hi).map(t => t -> m.getOrElse(t, 0L))
    val pred = xs.indices.drop(7).map { i =>
      val s7 = (i - 7 until i).map(j => xs(j)._2).sum
      val res = math.abs(xs(i)._2.toDouble - s7.toDouble / 7.0)
      (xs(i)._1, res)
    }
    val cal = pred.filter(_._1 % 2 == 1).sortBy(p => (p._2, p._1))
    val test = pred.filter(_._1 % 2 == 0)
    assert(nCal == cal.length.toLong && nTest == test.length.toLong)
    val rkSel = ((cal.length + 1) * 9 + 9) / 10
    val qRef = cal(rkSel - 1)._2
    assert(math.abs(qhat - BigDecimal(qRef).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(nCov == test.count(_._2 <= qRef).toLong)
  }

  test("q308 Hill estimator matches the brute top-k recompute and " +
      "alpha is its reciprocal") {
    val r = SparkEntry.queries("q308_hill_tail")(spark, d).head()
    val (k, xk, hill, alpha) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val xs = Graft.table(spark, d, "orders")
      .select(round(col("o_totalprice") * 100, 0).cast("long"),
        col("o_orderkey").cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .sortBy(x => (-x._1, x._2)).take(k.toInt).map(_._1)
    assert(xk == xs.last)
    val hRef = xs.init.map(x => math.log(x.toDouble / xs.last)).sum /
      (k - 1)
    assert(math.abs(hill - hRef) < 1e-5)
    assert(math.abs(alpha - 1.0 / hRef) < 1e-3)
  }

  test("q309 stratified ATE: cells partition users and the cumulative " +
      "weighted combine ends at the stratified estimate") {
    val out = SparkEntry.queries("q309_stratified_ate")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    val users = Graft.table(spark, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("act"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      .collect().map(x => (x.getLong(0) % 2,
        math.min(x.getLong(1) / 20, 7L), x.getLong(2)))
    assert(out.map(x => x._2 + x._4).sum == users.length.toLong)
    val ntot = users.length.toDouble
    var cum = 0.0
    for ((st, n1, c1, n0, c0, ateS, ateCum) <- out) {
      assert(n1 == users.count(u => u._1 == 1 && u._2 == st).toLong)
      assert(c1 == users.filter(u => u._1 == 1 && u._2 == st)
        .map(_._3).sum)
      assert(n0 == users.count(u => u._1 == 0 && u._2 == st).toLong)
      assert(c0 == users.filter(u => u._1 == 0 && u._2 == st)
        .map(_._3).sum)
      val ref = if (n1 > 0 && n0 > 0)
        c1.toDouble / n1 - c0.toDouble / n0 else 0.0
      assert(math.abs(ateS - ref) < 5e-7)
      cum += (n1 + n0) / ntot * ref
      assert(math.abs(ateCum - cum) < 1e-5)
    }
  }

  test("q310 IPF raking converges toward uniform margins and matches " +
      "a driver-side unrolled recompute") {
    val out = SparkEntry.queries("q310_ipf_raking")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    val cells = Graft.table(spark, d, "events")
      .groupBy(col("event_type"), pmod(col("user_id"), lit(2)))
      .agg(count(lit(1)).as("n"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val ntot = cells.map(_._3).sum.toDouble
    val gs = cells.map(_._1).distinct.sorted
    val ps = cells.map(_._2).distinct.sorted
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = cells.map(c => (c._1, c._2) -> c._3.toDouble).toMap
    for (_ <- 1 to 3) {
      val rowSum = gs.map(g =>
        g -> ps.map(p => w.getOrElse((g, p), 0.0)).sum).toMap
      w = w.map { case ((g, p), x) =>
        (g, p) -> r12(x * (ntot / gs.length) / rowSum(g)) }
      val colSum = ps.map(p =>
        p -> gs.map(g => w.getOrElse((g, p), 0.0)).sum).toMap
      w = w.map { case ((g, p), x) =>
        (g, p) -> r12(x * (ntot / ps.length) / colSum(p)) }
    }
    for ((g, p, _, w8) <- out)
      assert(math.abs(w8 - w((g, p))) < 5e-8, s"IPF mismatch ($g,$p)")
    // margins after 3 rounds: columns exact (last step), rows near
    for (p <- ps) {
      val cm = out.filter(_._2 == p).map(_._4).sum
      assert(math.abs(cm - ntot / ps.length) < 1e-4 * ntot)
    }
    for (g <- gs) {
      val rm = out.filter(_._1 == g).map(_._4).sum
      assert(math.abs(rm - ntot / gs.length) < 0.05 * ntot / gs.length)
    }
  }

  test("q311 linear-time MMD2 matches a brute quadruple recompute " +
      "and is ~0 for identically-distributed halves") {
    val r = SparkEntry.queries("q311_mmd_linear")(spark, d).head()
    val (np, mmd2) = (r.getLong(0), r.getDouble(1))
    val rows = Graft.table(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .collect().map(x => (x.getLong(0),
        x.getSeq[Float](1).map(_.toDouble).toArray))
    val ev = rows.filter(_._1 % 2 == 0).sortBy(_._1).map(_._2)
    val od = rows.filter(_._1 % 2 == 1).sortBy(_._1).map(_._2)
    val nmin = math.min(ev.length, od.length)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val hs = (0 until nmin / 2).map { j =>
      val (x0, x1) = (ev(2 * j), ev(2 * j + 1))
      val (y0, y1) = (od(2 * j), od(2 * j + 1))
      dot(x0, x1) + dot(y0, y1) - dot(x0, y1) - dot(x1, y0)
    }
    assert(np == hs.length.toLong)
    val ref = hs.sum / hs.length
    assert(math.abs(mmd2 - ref) < 1e-4)
    // parity halves of one distribution: MMD2 should be small
    // relative to the typical per-pair magnitude
    val scaleH = hs.map(math.abs).max
    assert(math.abs(mmd2) < scaleH)
  }

  test("q290 preference pairs: chosen/rejected are the per-group " +
      "argmax/argmin by (token count, doc_id)") {
    val eng = SparkEntry.queries("q290_preference_pairs")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(6))).toMap
    val docs = Graft.table(spark, d, "documents")
      .select(col("lang"), col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("sc"))
      .collect().map(x => (x.getString(0), x.getString(1), x.getLong(2),
        x.getLong(3)))
    val expect = docs.groupBy(x => (x._1, x._2)).flatMap { case (g, xs) =>
      val chosen = xs.minBy(x => (-x._4, x._3))
      val rejected = xs.minBy(x => (x._4, -x._3))
      val margin = chosen._4 - rejected._4
      if (margin >= 5 && chosen._3 != rejected._3)
        Some(g -> (chosen._3, rejected._3, margin))
      else None
    }
    assert(eng == expect)
  }
}
