package graft

import org.apache.spark.sql.functions._

/** Analytics-family specs (round 6): each q263+ statistic re-derived
  * driver-side with an INDEPENDENT spelling (float formulas, brute
  * scans) against the engine's exact-integer/ordered-window forms —
  * the spec-level complement of the DuckDB oracles, which share the
  * relational shape by design.
  */
class AnalyticsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("q263 Spearman equals Pearson correlation of the rank vectors") {
    val r = SparkEntry.queries("q263_spearman")(spark, d).head()
    val rho = r.getDouble(2)
    // independent spelling: collect (rev, bal) pairs, rank in Scala,
    // Pearson over the rank vectors (no 1−6Σd² identity anywhere)
    val rev = Graft.table(spark, d, "lineitem")
      .groupBy(col("l_suppkey").cast("long").as("sk"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rev"))
    val bal = Graft.table(spark, d, "supplier")
      .select(col("s_suppkey").cast("long").as("sk"),
        round(col("s_acctbal") * 100, 0).cast("long").as("bal"))
    val pairs = rev.join(bal, Seq("sk"))
      .select(col("sk"), col("rev"), col("bal"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    def ranks(key: ((Long, Long, Long)) => (Long, Long)): Map[Long, Int] =
      pairs.sortBy(key).zipWithIndex.map { case (p, i) => p._1 -> (i + 1) }
        .toMap
    val ra = ranks(p => (p._2, p._1))
    val rb = ranks(p => (p._3, p._1))
    val xs = pairs.map(p => ra(p._1).toDouble)
    val ys = pairs.map(p => rb(p._1).toDouble)
    val n = xs.length
    val mx = xs.sum / n
    val my = ys.sum / n
    val pearson = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
      math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(rho - pearson) < 5e-7) // rho is rounded to 6 dp
  }

  test("q265 integer-lift ACF equals the classic float mean-centered " +
      "formula on the same daily series") {
    val acf = SparkEntry.queries("q265_acf")(spark, d)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = daily.keys.min to daily.keys.max
    val xs = days.map(t => daily.getOrElse(t, 0L).toDouble).toArray
    val mean = xs.sum / xs.length
    val den = xs.map(x => (x - mean) * (x - mean)).sum
    for (l <- 1 to 7) {
      val num = (0 until xs.length - l)
        .map(t => (xs(t) - mean) * (xs(t + l) - mean)).sum
      assert(math.abs(acf(l) - num / den) < 5e-7,
        s"lag $l: ${acf(l)} vs ${num / den}")
    }
  }

  test("q266 CUSUM argmax matches a brute driver scan and the magnitude " +
      "is the max |running mean-centered sum|") {
    val r = SparkEntry.queries("q266_cusum")(spark, d).head()
    val (nDays, cpDay, mag) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val daily = Graft.normalizeTs(Graft.table(spark, d, "events"))
      .filter(col("event_type") === "purchase")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val days = (daily.keys.min to daily.keys.max).toArray
    assert(nDays == days.length)
    val xs = days.map(t => daily.getOrElse(t, 0L).toDouble)
    val mean = xs.sum / xs.length
    var run = 0.0
    var best = 0.0
    var bestDay = days.head
    for ((t, i) <- days.zipWithIndex) {
      run += xs(i) - mean
      if (math.abs(run) > best + 1e-9) { best = math.abs(run); bestDay = t }
    }
    assert(cpDay == bestDay)
    assert(math.abs(mag - best / 100.0) < 5e-4) // rounded to 4 dp (cents→$)
  }

  test("q267 NDCG is in [0,1] with 1.0 exactly when the revenue order " +
      "already sorts relevance descending") {
    val rows = SparkEntry.queries("q267_ndcg")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ndcg = r.getDouble(3)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-9, s"nk=${r.getLong(0)}: $ndcg")
    }
    // flat-grade pools (every supplier the same rel) are ideal under
    // ANY order → ndcg exactly 1.0; such nations exist at sf0.001
    val flat = rows.filter(r => r.getDouble(3) == 1.0 && r.getDouble(2) > 0.0)
    assert(flat.nonEmpty || rows.forall(_.getDouble(3) < 1.0))
  }

  test("q275 retention is monotone in k and bounded by 1 for every " +
      "(label,k) rollup; q276 encodings satisfy enc·n_oof == S−s exactly") {
    val m = SparkEntry.queries("q275_matryoshka_eval")(spark, d).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(4), r.getDouble(5))).toMap
    m.keys.map(_._1).foreach { label =>
      val (mn8, mx8) = m((label, 8))
      val (mn16, mx16) = m((label, 16))
      val (mn32, mx32) = m((label, 32))
      assert(mn8 <= mn16 + 1e-9 && mn16 <= mn32 + 1e-9,
        s"label $label min retention not monotone")
      assert(mx32 <= 1.0 + 1e-9 && mx8 <= mx16 + 1e-9 && mx16 <= mx32 + 1e-9,
        s"label $label max retention not monotone/bounded")
    }
    // target encoding: the rounded mean times its denominator recovers
    // the out-of-fold integer sum to rounding tolerance
    val enc = SparkEntry.queries("q276_target_encoding")(spark, d).collect()
    val per = Graft.table(spark, d, "events")
      .groupBy(col("event_type"), (col("user_id") % 5).as("fold"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("s"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val totals = per.groupBy(_._1._1).map { case (t, xs) =>
      t -> (xs.values.map(_._1).sum, xs.values.map(_._2).sum)
    }
    enc.foreach { r =>
      val (t, f) = (r.getString(0), r.getLong(1))
      val nOof = r.getLong(3)
      val e6 = r.getDouble(4)
      val (nc, sc) = totals(t)
      val (nf, sf) = per((t, f))
      assert(nOof == nc - nf)
      assert(math.abs(e6 * nOof - (sc - sf)) <= 0.5e-6 * nOof + 1e-6,
        s"($t,$f): $e6 * $nOof vs ${sc - sf}")
    }
  }

  test("q347 extremaSupportView: a group whose post-batch fact set is " +
      "empty vanishes from the view (ADVICE-r9); insert-moved extrema " +
      "never rescan; support-exhausting deletes do") {
    import spark.implicits._
    // group A: insert raises the max (pure fold, no rescan);
    // group B: ALL rows deleted — trigger fires, scratch has no row,
    //          the group must vanish (not emit NULL extrema);
    // group C: delete exhausts the support at max only — max rescans
    //          from the survivors, min folds.
    val base = Seq(("A", 10L), ("A", 20L), ("B", 5L), ("B", 7L),
      ("C", 1L), ("C", 9L), ("C", 9L), ("C", 4L)).toDF("g", "cents")
    val ins = Seq(("A", 30L)).toDF("g", "cents")
    val del = Seq(("B", 5L), ("B", 7L), ("C", 9L), ("C", 9L))
      .toDF("g", "cents")
    val post = Seq(("A", 10L), ("A", 20L), ("A", 30L),
      ("C", 1L), ("C", 4L)).toDF("g", "cents")
    val got = graft.queries.Advanced.extremaSupportView(
        base, ins, del, post)
      .orderBy(col("g")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("A", 30L, 10L, false, false),
      ("C", 4L, 1L, true, false)),
      s"got ${got.toSeq}")
  }
}
