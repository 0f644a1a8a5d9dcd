package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Graft.{roundz, table}

/** Hypothesis-testing / inferential statistics family (round 6,
  * SURVEY.md §2.14 EXT): Mann–Whitney U, Benjamini–Hochberg FDR,
  * Kendall tau-b, and the log-rank test — the classical
  * nonparametric-inference layer that complements the descriptive
  * Analytics family (q263–q272) and the evaluation Metrics family
  * (q224–q228, q257–q258).
  *
  * Determinism conventions (SURVEY §5, the Analytics preamble): every
  * statistic is reduced to exact BIGINT counts/rank-sums first; each
  * float division/sqrt/ln happens once in an identical spelling on
  * both engines; any float SUM whose accumulation order could differ
  * is either avoided (integer-scaled) or run as an ORDERED window
  * cumsum (the q175/q257 argument). `roundz` normalizes signed zero.
  *
  * 100 TB design notes per query are inline; the common theme is that
  * each statistic aggregates to a domain-bounded relation (distinct
  * cent values, hypothesis buckets, survival days, fixed-size per-group
  * samples) before any single-partition window runs, so the wide stage
  * is O(domain), not O(rows).
  */
object Stats {

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  private def events(s: SparkSession, d: String): DataFrame =
    graft.Graft.normalizeTs(table(s, d, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Mann–Whitney U (Wilcoxon rank-sum) comparing the `value`
    // distribution of 'purchase' vs 'click' events, with full tie
    // handling. Everything up to the final z is exact integer
    // arithmetic: for each distinct cent value v with t ties of which
    // n1v are group-1, the doubled average rank is 2c+t+1 (c = count
    // of strictly smaller rows), so 2·R1 = Σ n1v·(2c+t+1) is a BIGINT;
    // 2·U1 = 2·R1 − n1(n1+1); the tie correction Σ(t³−t) is a BIGINT.
    // One float spelling at the end, with the tie term pre-divided by
    // N(N−1) in DOUBLE so no BIGINT cubes are ever formed:
    //   z = (2U1 − n1n2) / sqrt(n1·n2·((N+1) − T/(N(N−1))) / 3).
    // Scale: the groupBy collapses the fact table to distinct cent
    // values (domain-bounded: value ∈ [0,500] → ≤50k rows), so the
    // single-partition rank window is O(domain) regardless of SF.
    // Long headroom: the largest integer products are n1·n2 ≤ N²/4 and
    // N(N−1) — safe to N ≈ 3×10⁹ ranked rows (vs 2×10⁶ for the naive
    // (N+1)N(N−1) cube, which wraps on Spark while DuckDB's HUGEINT
    // does not — a silent one-engine divergence this spelling closes).
    "q283_mann_whitney" -> ((s, d) => {
      val e = table(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select((col("event_type") === "purchase").cast("long").as("g"),
          cents(col("value")).as("v"))
      val byv = e.groupBy(col("v"))
        .agg(count(lit(1)).as("t"), sum(col("g")).as("n1v"))
      val w = Window.orderBy(col("v"))
      val ranked = byv.withColumn("c",
        coalesce(sum(col("t")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      val tot = ranked.agg(
        sum(col("t")).as("n"),
        sum(col("n1v")).as("n1"),
        sum(col("n1v") * (lit(2L) * col("c") + col("t") + 1)).as("two_r1"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      tot.select(
          col("n1"), (col("n") - col("n1")).as("n2"),
          (col("two_r1") - col("n1") * (col("n1") + 1)).as("two_u1"),
          col("tsum"), col("n"))
        .select(col("n1"), col("n2"), col("two_u1"), col("tsum"),
          roundz((col("two_u1") - col("n1") * col("n2")).cast("double") /
            sqrt((col("n1") * col("n2")).cast("double") *
              ((col("n") + 1).cast("double") -
                col("tsum").cast("double") /
                  (col("n") * (col("n") - 1)).cast("double")) /
              lit(3.0)), 6)
            .as("z6"))
    }),

    // Benjamini–Hochberg FDR over m=64 simultaneous two-proportion
    // tests (purchase rate of each event_id%64 bucket vs the pooled
    // rate). The per-bucket z has an exact integer numerator
    // (kᵢN − nᵢK) and one sqrt; the monotone p-surrogate 1/(1+z²)
    // preserves the BH ordering without needing erf on either engine.
    // The BH step-up is pure windowing: rank p ascending, keep where
    // p ≤ r/m, kmax = max kept rank, reject rank ≤ kmax.
    // Scale: one groupBy to 64 rows; every window after that is over
    // m rows — O(hypotheses), never O(events). Long headroom:
    // nᵢ·K·(N−K) needs N ≲ 5×10⁶; past that, pre-divide by N in
    // double (z spelling change on both sides).
    "q284_fdr_bh" -> ((s, d) => {
      val byb = table(s, d, "events")
        .groupBy(pmod(col("event_id"), lit(64)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum((col("event_type") === "purchase").cast("long")).as("k"))
      val wAll = Window.partitionBy()
      val t = byb
        .withColumn("tn", sum(col("n")).over(wAll))
        .withColumn("tk", sum(col("k")).over(wAll))
        .withColumn("m", count(lit(1)).over(wAll))
        .withColumn("z",
          (col("k") * col("tn") - col("n") * col("tk")).cast("double") /
            sqrt((col("n") * col("tk") * (col("tn") - col("tk")))
              .cast("double")))
        .withColumn("p", lit(1.0) / (lit(1.0) + col("z") * col("z")))
      val r = t.withColumn("r",
        row_number().over(Window.orderBy(col("p"), col("bucket")))
          .cast("long"))
        .withColumn("keep",
          col("p") <= col("r").cast("double") / col("m").cast("double"))
      r.withColumn("kmax",
          coalesce(max(when(col("keep"), col("r"))).over(wAll), lit(0L)))
        .select(col("bucket"), col("n"), col("k"),
          roundz(col("z"), 6).as("z6"), roundz(col("p"), 6).as("p6"),
          col("r"), (col("r") <= col("kmax")).as("rejected"))
        .orderBy(col("bucket"))
    }),

    // Kendall tau-b per nation between customer account balance and
    // total order value, on a FIXED-SIZE deterministic per-nation
    // sample (hash-ranked top-120): concordant/discordant/tie pair
    // counts are exact integers from a within-group self-join; tau-b's
    // two sqrt factors are the only floats. Scale: the cap makes the
    // pair join O(groups · k²) — constant per group at any SF (the
    // estimator-error trade is O(1/√k), documented; the uncapped exact
    // tau would be O(n²) per group and is the reason inversion-count
    // merges exist). The sample is keyed by a multiplicative hash of
    // the custkey so it is stable across engines and partitionings.
    "q285_kendall_tau" -> ((s, d) => {
      val ov = table(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("v"))
      val cust = table(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          cents(col("c_acctbal")).as("b"))
        .join(ov, col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").cast("long").as("nk"),
          col("c_custkey").cast("long").as("ck"), col("b"), col("v"))
      val wk = Window.partitionBy(col("nk"))
        .orderBy(pmod(col("ck") * lit(2654435761L), lit(1000000007L)),
          col("ck"))
      val samp = cust.withColumn("rn", row_number().over(wk))
        .filter(col("rn") <= 120).drop("rn")
      val a = samp.select(col("nk"), col("ck").as("cka"),
        col("b").as("ba"), col("v").as("va"))
      val b = samp.select(col("nk"), col("ck").as("ckb"),
        col("b").as("bb"), col("v").as("vb"))
      val pairs = a.join(b, Seq("nk")).filter(col("cka") < col("ckb"))
        .withColumn("sb", signum(col("bb") - col("ba")).cast("long"))
        .withColumn("sv", signum(col("vb") - col("va")).cast("long"))
      val g = pairs.groupBy(col("nk")).agg(
        count(lit(1)).as("pairs"),
        sum((col("sb") * col("sv") === 1).cast("long")).as("conc"),
        sum((col("sb") * col("sv") === -1).cast("long")).as("disc"),
        sum((col("sb") === 0).cast("long")).as("tb"),
        sum((col("sv") === 0).cast("long")).as("tv"))
      g.select(col("nk"), col("pairs"), col("conc"), col("disc"),
          col("tb"), col("tv"),
          roundz((col("conc") - col("disc")).cast("double") /
            (sqrt((col("pairs") - col("tb")).cast("double")) *
              sqrt((col("pairs") - col("tv")).cast("double"))), 6)
            .as("tau6"))
        .orderBy(col("nk"))
    }),

    // Log-rank test comparing survival (user lifetime in days, q257's
    // censoring convention: censored iff the last event is a 'view')
    // between the user_id-parity cohorts. Per death-day: d₁, d₂ exact
    // integers; at-risk n₁, n₂ via reverse cumsum windows; the
    // E₁ = Σ d·n₁/n and V = Σ d·(n₁/n)(n₂/n)(n−d)/(n−1) float sums run
    // as ORDERED window cumsums over day (identical fold order on both
    // engines — the q257 argument); χ² = (O₁−E₁)²/V once at the end.
    // Scale: the survival relation is O(users) after one groupBy, then
    // O(distinct days) for the windows — both domain-bounded.
    "q286_log_rank" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val lifet = ev.groupBy(col("user_id"))
        .agg(min(col("us")).as("f"), max(col("us")).as("l"),
          max(struct(col("us"), col("event_id"), col("event_type")))
            .as("lw"))
        .select(pmod(col("user_id"), lit(2)).cast("long").as("g"),
          expr("(l - f) div 86400000000").as("t"),
          (col("lw.event_type") =!= "view").cast("long").as("ev"))
      val byT = lifet.groupBy(col("t")).agg(
        sum(when(col("g") === 0, 1L).otherwise(0L)).as("a1"),
        sum(when(col("g") === 1, 1L).otherwise(0L)).as("a2"),
        sum(when(col("g") === 0, col("ev")).otherwise(0L)).as("d1"),
        sum(when(col("g") === 1, col("ev")).otherwise(0L)).as("d2"))
      val w = Window.orderBy(col("t"))
      val risk = byT
        .withColumn("n1", sum(col("a1")).over(
          w.rowsBetween(0, Window.unboundedFollowing)))
        .withColumn("n2", sum(col("a2")).over(
          w.rowsBetween(0, Window.unboundedFollowing)))
        .withColumn("dd", col("d1") + col("d2"))
        .withColumn("nn", col("n1") + col("n2"))
        .filter(col("dd") > 0)
      val contrib = risk
        .withColumn("e1c",
          col("dd").cast("double") * col("n1").cast("double") /
            col("nn").cast("double"))
        .withColumn("vc",
          when(col("nn") > 1,
            col("dd").cast("double") *
              (col("n1").cast("double") / col("nn").cast("double")) *
              (col("n2").cast("double") / col("nn").cast("double")) *
              ((col("nn") - col("dd")).cast("double") /
                (col("nn") - 1).cast("double")))
            .otherwise(lit(0.0)))
      val cum = contrib
        .withColumn("o1", sum(col("d1")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("e1", sum(col("e1c")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("v", sum(col("vc")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(Window.orderBy(col("t").desc)))
        .filter(col("rn") === 1)
      cum.select(col("o1"), roundz(col("e1"), 6).as("e1_6"),
        roundz(col("v"), 6).as("v6"),
        roundz((col("o1").cast("double") - col("e1")) *
          (col("o1").cast("double") - col("e1")) / col("v"), 6)
          .as("chi2_6"))
    }),

    // Adamic–Adar link prediction on the basket co-occurrence part
    // graph (parts appearing in the same order), over a 5%
    // deterministic hash-sample of orders. For every non-adjacent
    // 2-hop pair, AA = Σ_z 1/ln(deg z) over common neighbors z — the
    // per-neighbor weight is fixed-point rounded to round(10⁶/ln deg)
    // BEFORE summing so the score aggregation is an exact BIGINT sum
    // in any order (the unordered-float-SUM trap, Analytics preamble).
    // Scale: baskets are ≤7 lines → ≤21 pair instances per sampled
    // order; with a constant sample rate, orders ∝ SF and parts ∝ SF
    // keep mean degree CONSTANT, so wedge work Σ deg² = O(|parts|·d̄²)
    // grows linearly with SF. The top-20 limit makes the final sort a
    // TakeOrdered, not a global sort.
    "q287_adamic_adar" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .filter(pmod(col("l_orderkey").cast("long") * lit(2654435761L),
          lit(20L)) === 0)
        .select(col("l_orderkey").cast("long").as("ok"),
          col("l_partkey").cast("long").as("pk")).distinct()
      val e = li.as("x").join(li.as("y"), col("x.ok") === col("y.ok"))
        .filter(col("x.pk") < col("y.pk"))
        .select(col("x.pk").as("a"), col("y.pk").as("b")).distinct()
      val deg = e.select(col("a").as("z")).unionAll(e.select(col("b")))
        .groupBy(col("z")).agg(count(lit(1)).as("deg"))
      // deg > 1: wedge centers have degree >= 2 by construction, so the
      // filter is semantically free — and it keeps ln(deg)=0 (deg=1)
      // out of the weight division, where Spark would silently emit an
      // unjoinable huge value but DuckDB's BIGINT cast of inf errors.
      val w = deg.filter(col("deg") > 1).withColumn("wz",
        round(lit(1000000.0) / log(col("deg").cast("double")), 0)
          .cast("long"))
      val half = e.select(col("a").as("z"), col("b").as("nb"))
        .unionAll(e.select(col("b"), col("a")))
      val wedges = half.as("l")
        .join(half.as("r"), col("l.z") === col("r.z"))
        .filter(col("l.nb") < col("r.nb"))
        .select(col("l.nb").as("a"), col("r.nb").as("b"), col("l.z"))
      val cand = wedges.join(e, Seq("a", "b"), "left_anti")
        .join(w.select(col("z"), col("wz")), Seq("z"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("common"), sum(col("wz")).as("aa_score"))
      cand.orderBy(col("aa_score").desc, col("a"), col("b")).limit(20)
    }),

    // KMV (k-minimum-values) distinct-count sketch per event type,
    // k=16: hash user_id with the odd multiplier 2654435761 mod 2³²
    // (a BIJECTION on [0,2³²), so distinct hashes = distinct users and
    // the sketch is collision-free by construction — PRECONDITION:
    // user_id < 2³², which the testdata generator guarantees; 64-bit
    // ids would alias mod 2³² and the sketch would count distinct
    // hashes, not users — switch the modulus to 2⁶¹−1 with a 64-bit
    // odd multiplier if ids ever widen), keep the k
    // smallest, estimate distinct = (k−1)·2³²/h_k. The estimate and
    // the exact count are emitted side by side. Mergeability (union of
    // per-half sketches = whole-set sketch) is pinned in StatsSpec.
    // Scale: the groupBy collapses to distinct (type, hash); the rank
    // window runs per type over distinct users only. At 100 TB the
    // k-smallest per type would run as a partial top-k aggregate
    // (mergeable min-heaps) — the q68 TopKByScore UDAF is exactly that
    // shape if the per-type distinct set ever stops fitting a window.
    "q288_kmv_sketch" -> ((s, d) => {
      val h = table(s, d, "events")
        .select(col("event_type"),
          pmod(col("user_id") * lit(2654435761L), lit(4294967296L))
            .as("h"))
        .distinct()
      val wk = Window.partitionBy(col("event_type")).orderBy(col("h"))
      val ranked = h.withColumn("rk", row_number().over(wk).cast("long"))
      val kth = ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).as("exact_distinct"),
          max(when(col("rk") === 16, col("h"))).as("hk"))
      kth.select(col("event_type"), col("exact_distinct"),
          col("hk"),
          when(col("hk").isNotNull,
            roundz(lit(15.0) * lit(4294967296.0) /
              col("hk").cast("double"), 2))
            .otherwise(col("exact_distinct").cast("double")).as("kmv_est2"))
        .orderBy(col("event_type"))
    }),

    // Binary-segmentation changepoint on the gap-filled daily purchase
    // count series: the between-segment SSE reduction at split t is
    // (S_L·n − S·n_L)² / (n·n_L·n_R) — numerator exact BIGINT from
    // prefix sums, then the overflow-safe double factoring
    // (num/n_L)·(num/(n·n_R)) (q300's spelling: num can reach
    // ~totalCount·days, so num² would silently wrap BIGINT on Spark
    // while DuckDB raises — the factored form never squares the
    // BIGINT). Argmax by (reduction desc, day) is deterministic
    // because both engines compute bit-identical doubles from
    // identical integer operands and identical IEEE op order.
    // Complements q266 (CUSUM criterion) with the variance-reduction
    // criterion. Scale: O(days) rows after one groupBy — the window
    // is calendar-bounded.
    "q289_changepoint" -> ((s, d) => {
      val daily = events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val f = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      val w = Window.orderBy(col("day"))
      val wAll = Window.partitionBy()
      val c = f
        .withColumn("nl", row_number().over(w).cast("long"))
        .withColumn("sl", sum(col("x")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("stot", sum(col("x")).over(wAll))
        .filter(col("nl") < col("n")) // split must leave a right segment
      val g = c
        .withColumn("num", col("sl") * col("n") - col("stot") * col("nl"))
        .withColumn("red",
          (col("num").cast("double") / col("nl").cast("double")) *
            (col("num").cast("double") /
              (col("n") * (col("n") - col("nl"))).cast("double")))
      g.select(col("day").as("split_day"), col("nl").as("n_left"),
          (col("n") - col("nl")).as("n_right"),
          roundz(col("red"), 6).as("reduction6"),
          roundz(col("sl").cast("double") / col("nl").cast("double"), 4)
            .as("mean_left4"),
          roundz((col("stot") - col("sl")).cast("double") /
            (col("n") - col("nl")).cast("double"), 4).as("mean_right4"))
        .orderBy(col("reduction6").desc, col("split_day")).limit(1)
    }),

    // DPO-style preference-pair construction over documents: within
    // each (lang, source) prompt-cluster proxy, pair the
    // highest-scoring document (chosen) with the lowest (rejected) by
    // an integer quality score (whitespace token count), keep pairs
    // with margin ≥ 5. Ties break on doc_id so the pairing is total.
    // Scale: two rank windows per cluster, one shuffle on the cluster
    // key; emitted pairs are O(clusters). The integer score keeps the
    // margin exact.
    "q290_preference_pairs" -> ((s, d) => {
      val sc = table(s, d, "documents")
        .select(col("lang"), col("source"), col("doc_id"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("score"))
      val wTop = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      val wBot = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("score"), col("doc_id").desc)
      val ranked = sc
        .withColumn("rt", row_number().over(wTop))
        .withColumn("rb", row_number().over(wBot))
      val top = ranked.filter(col("rt") === 1)
        .select(col("lang"), col("source"), col("doc_id").as("chosen_id"),
          col("score").as("chosen_score"))
      val bot = ranked.filter(col("rb") === 1)
        .select(col("lang"), col("source"),
          col("doc_id").as("rejected_id"), col("score").as("rejected_score"))
      top.join(bot, Seq("lang", "source"))
        .withColumn("margin", col("chosen_score") - col("rejected_score"))
        .filter(col("margin") >= 5 && col("chosen_id") =!= col("rejected_id"))
        .select(col("lang"), col("source"), col("chosen_id"),
          col("rejected_id"), col("chosen_score"), col("rejected_score"),
          col("margin"))
        .orderBy(col("lang"), col("source"))
    }),

    // One-way ANOVA F across the five event types on value cents.
    // Group sums S_g, squared sums Q_g are exact BIGINTs; the
    // between-group term Σ S_g²/n_g runs as an ORDERED cumsum over the
    // (tiny) group dimension with S_g squared in DOUBLE (BIGINT S_g²
    // would overflow at ~SF1 — the double spelling is identical on
    // both engines, so determinism survives where headroom wouldn't).
    // Scale: one partial-aggregating groupBy; the window is O(k).
    "q291_anova_f" -> ((s, d) => {
      val g = table(s, d, "events")
        .select(col("event_type").as("g"), cents(col("value")).as("x"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"),
          sum(col("x") * col("x")).as("qg"))
      val w = Window.orderBy(col("g"))
      val wAll = Window.partitionBy()
      val c = g
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("n", sum(col("ng")).over(wAll))
        .withColumn("stot", sum(col("sg")).over(wAll))
        .withColumn("qtot", sum(col("qg")).over(wAll))
        .withColumn("cum",
          sum(col("sg").cast("double") * col("sg").cast("double") /
            col("ng").cast("double")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
        .filter(col("rn") === 1)
      val ssb = col("cum") - col("stot").cast("double") *
        col("stot").cast("double") / col("n").cast("double")
      val ssw = col("qtot").cast("double") - col("cum")
      c.select(col("k"), col("n"),
        roundz(ssb, 6).as("ssb6"), roundz(ssw, 6).as("ssw6"),
        roundz((ssb / (col("k") - 1).cast("double")) /
          (ssw / (col("n") - col("k")).cast("double")), 6).as("f6"))
    }),

    // Kruskal–Wallis H across all five event types: q283's doubled
    // average-rank machinery generalized — per distinct cent value v,
    // 2·avg-rank = 2c+t+1 exactly; per-group doubled rank sums 2R_g
    // are BIGINTs; Σ(2R_g)²/n_g runs as an ordered cumsum over the k=5
    // group rows (squares in DOUBLE for headroom); tie-corrected
    // H_c = H / (1 − (T/(N(N−1)))/(N+1)) — the tie fraction factored
    // through N(N−1) then N+1 in DOUBLE so no BIGINT cube N³−N is ever
    // formed (same headroom fix as q283: safe to N ≈ 3×10⁹ vs 2×10⁶).
    // Scale: rank window over DISTINCT cents (domain-bounded).
    "q292_kruskal_wallis" -> ((s, d) => {
      val e = table(s, d, "events")
        .select(col("event_type").as("g"), cents(col("value")).as("v"))
      val byv = e.groupBy(col("v")).agg(count(lit(1)).as("t"))
      val wv = Window.orderBy(col("v"))
      val ranked = byv.withColumn("c",
        coalesce(sum(col("t")).over(wv.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      val byvg = e.groupBy(col("v"), col("g")).agg(count(lit(1)).as("ngv"))
        .join(ranked, Seq("v"))
      val byg = byvg.groupBy(col("g"))
        .agg(sum(col("ngv")).as("ng"),
          sum(col("ngv") * (lit(2L) * col("c") + col("t") + 1))
            .as("tworg"))
      val ties = ranked.agg(sum(col("t")).as("n"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
      val wg = Window.orderBy(col("g"))
      val wAll = Window.partitionBy()
      val c = byg.crossJoin(broadcast(ties))
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("srg",
          sum(col("tworg").cast("double") * col("tworg").cast("double") /
            col("ng").cast("double")).over(
            wg.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
        .filter(col("rn") === 1)
      val h = lit(3.0) * col("srg") /
        (col("n") * (col("n") + 1)).cast("double") -
        lit(3.0) * (col("n") + 1).cast("double")
      c.select(col("n"), col("k"), col("tsum"),
        roundz(h, 6).as("h6"),
        roundz(h / (lit(1.0) - (col("tsum").cast("double") /
          (col("n") * (col("n") - 1)).cast("double")) /
          (col("n") + 1).cast("double")), 6)
          .as("hc6"))
    }),

    // McNemar's paired test: did each user purchase in the first vs
    // second half of the observation window (day-15 split from the
    // data's own min day)? The discordant cells b=n10, c=n01 drive
    // χ² = (b−c)²/(b+c) and the continuity-corrected variant — exact
    // integers, two final divisions. Scale: one groupBy to users, one
    // to a single row.
    "q293_mcnemar" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          (col("event_type") === "purchase").cast("long").as("pur"))
      val lo = ev.agg(min(col("day")).as("lo"))
      val per = ev.crossJoin(broadcast(lo))
        .withColumn("p", least(expr("(day - lo) div 15"), lit(1L)))
      val u = per.groupBy(col("user_id"))
        .agg(max(when(col("p") === 0, col("pur")).otherwise(0L)).as("p1"),
          max(when(col("p") === 1, col("pur")).otherwise(0L)).as("p2"))
      val cells = u.agg(
        sum((col("p1") === 1 && col("p2") === 1).cast("long")).as("n11"),
        sum((col("p1") === 1 && col("p2") === 0).cast("long")).as("n10"),
        sum((col("p1") === 0 && col("p2") === 1).cast("long")).as("n01"),
        sum((col("p1") === 0 && col("p2") === 0).cast("long")).as("n00"))
      val disc = col("n10") + col("n01")
      cells.select(col("n11"), col("n10"), col("n01"), col("n00"),
        roundz(when(disc > 0,
          ((col("n10") - col("n01")) * (col("n10") - col("n01")))
            .cast("double") / disc.cast("double")).otherwise(lit(0.0)), 6)
          .as("chi2_6"),
        roundz(when(disc > 0,
          ((abs(col("n10") - col("n01")) - 1) *
           (abs(col("n10") - col("n01")) - 1)).cast("double") /
            disc.cast("double")).otherwise(lit(0.0)), 6).as("chi2cc6"))
    }),

    // Friedman test: blocks = users, treatments = the five event
    // types, response = per-(user,type) cents sum (0 for absent pairs
    // via the user×type spine). Within-block average ranks use the
    // 2c+t+1 integer trick per user; doubled treatment rank sums 2R_j
    // are exact BIGINTs; χ²_F = 3·Σ(2R_j)²/(n·k·(k+1)) − 3n(k+1) with
    // the Σ as an ordered cumsum over k rows (plain Friedman — no tie
    // correction, documented). Emits one row per treatment (2R_j) with
    // the replicated summary (the q258 shape). Scale: the rank window
    // partitions BY USER over k=5 rows each — fully parallel.
    "q294_friedman" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type").as("g"),
          cents(col("value")).as("x"))
      val types = ev.select(col("g")).distinct()
      val spine = ev.select(col("user_id")).distinct().crossJoin(types)
      val cell = spine.join(
          ev.groupBy(col("user_id"), col("g")).agg(sum(col("x")).as("v")),
          Seq("user_id", "g"), "left")
        .select(col("user_id"), col("g"), coalesce(col("v"), lit(0L)).as("v"))
      val byuv = cell.groupBy(col("user_id"), col("v"))
        .agg(count(lit(1)).as("t"))
      val wu = Window.partitionBy(col("user_id")).orderBy(col("v"))
      val ranked = byuv.withColumn("c",
        coalesce(sum(col("t")).over(wu.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      val tworj = cell.join(ranked, Seq("user_id", "v"))
        .groupBy(col("g"))
        .agg(sum(lit(2L) * col("c") + col("t") + 1).as("two_rj"),
          count(lit(1)).as("nu"))
      val wAll = Window.partitionBy()
      // (2R_j)² fits BIGINT comfortably (2R_j ≤ users·(2k+1)), so the
      // cross-treatment Σ is EXACT and frame-order-free — no ordered
      // cumsum needed here, unlike q291/q292 where squares overflow.
      val c = tworj
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("srj", sum(col("two_rj") * col("two_rj")).over(wAll))
      c.select(col("g"), col("nu").as("n_users"), col("two_rj"),
          roundz(lit(3.0) * col("srj").cast("double") /
            (col("nu") * col("k") * (col("k") + 1)).cast("double") -
            lit(3.0) * (col("nu") * (col("k") + 1)).cast("double"), 6)
            .as("chi2f6"))
        .orderBy(col("g"))
    }),

    // Effect sizes for the q283 comparison (purchase vs click cents):
    // Cohen's d from exact (n, S, Q) per group — variances spelled
    // fully in DOUBLE ((nQ−S²)/(n(n−1)) would overflow BIGINT at ~SF1)
    // — and Cliff's delta = (2U₁ − n₁n₂)/(n₁n₂), whose numerator
    // reuses q283's exact doubled rank-sum identity (wins − losses =
    // 2U₁ − n₁n₂). Scale: same domain-bounded rank window as q283.
    "q295_effect_sizes" -> ((s, d) => {
      val e = table(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .select((col("event_type") === "purchase").cast("long").as("g"),
          cents(col("value")).as("v"))
      val byv = e.groupBy(col("v"))
        .agg(count(lit(1)).as("t"), sum(col("g")).as("n1v"))
      val w = Window.orderBy(col("v"))
      val ranked = byv.withColumn("c",
        coalesce(sum(col("t")).over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      val rk = ranked.agg(sum(col("t")).as("n"), sum(col("n1v")).as("n1"),
        sum(col("n1v") * (lit(2L) * col("c") + col("t") + 1)).as("two_r1"))
      val mom = e.groupBy(col("g"))
        .agg(count(lit(1)).as("ng"), sum(col("v")).as("sg"),
          sum(col("v") * col("v")).as("qg"))
      val m1 = mom.filter(col("g") === 1)
        .select(col("ng").as("na"), col("sg").as("sa"), col("qg").as("qa"))
      val m0 = mom.filter(col("g") === 0)
        .select(col("ng").as("nb"), col("sg").as("sb"), col("qg").as("qb"))
      val j = rk.crossJoin(broadcast(m1)).crossJoin(broadcast(m0))
        .withColumn("two_u1",
          col("two_r1") - col("n1") * (col("n1") + 1))
        .withColumn("var1",
          (col("na").cast("double") * col("qa").cast("double") -
            col("sa").cast("double") * col("sa").cast("double")) /
            (col("na").cast("double") * (col("na") - 1).cast("double")))
        .withColumn("var0",
          (col("nb").cast("double") * col("qb").cast("double") -
            col("sb").cast("double") * col("sb").cast("double")) /
            (col("nb").cast("double") * (col("nb") - 1).cast("double")))
        .withColumn("sp", sqrt(
          ((col("na") - 1).cast("double") * col("var1") +
           (col("nb") - 1).cast("double") * col("var0")) /
          (col("na") + col("nb") - 2).cast("double")))
      j.select(col("na").as("n1"), col("nb").as("n2"),
        roundz((col("sa").cast("double") / col("na").cast("double") -
          col("sb").cast("double") / col("nb").cast("double")) / col("sp"),
          6).as("cohens_d6"),
        roundz((col("two_u1") - col("na") * col("nb")).cast("double") /
          (col("na") * col("nb")).cast("double"), 6).as("cliffs_delta6"))
    }),

    // Token-trigram novelty: split documents 80/20 train/test by the
    // deterministic doc_id hash, then per language measure the share
    // of DISTINCT test trigrams never seen in that language's train
    // split — the classic memorization/novelty eval metric. Grams via
    // the q38 sliding-slice spelling; one distinct-gram relation per
    // split, one hash anti-join per language. Scale: distinct (lang,
    // gram) collapses before any join; at 100 TB the gram key becomes
    // xxhash64 (the q160 span-family convention) and the train side
    // stays a semi-join probe — never a row-wise corpus shuffle.
    "q296_ngram_novelty" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          split(lower(col("text")), " ").as("toks"),
          (pmod(col("doc_id") * lit(2654435761L), lit(10L)) < 8)
            .as("is_train"))
        .filter(size(col("toks")) >= 3)
      val grams = docs.select(col("lang"), col("is_train"),
        explode(expr(
          "transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', slice(toks, i, 3)))")).as("gram"))
      val train = grams.filter(col("is_train"))
        .select(col("lang"), col("gram")).distinct()
      val test = grams.filter(!col("is_train"))
        .select(col("lang"), col("gram")).distinct()
      val novel = test.join(train, Seq("lang", "gram"), "left_anti")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_novel"))
      test.groupBy(col("lang")).agg(count(lit(1)).as("n_test_grams"))
        .join(novel, Seq("lang"), "left")
        .select(col("lang"), col("n_test_grams"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          roundz(coalesce(col("n_novel"), lit(0L)).cast("double") /
            col("n_test_grams").cast("double"), 6).as("novelty6"))
        .orderBy(col("lang"))
    }),

    // Mann–Kendall trend test on gap-filled daily event counts:
    // S = Σ_{i<j} sgn(x_j − x_i) from a calendar-bounded pair join
    // (O(days²) — bounded by the time window, never by data volume);
    // Var(S) = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 with the tie term
    // exact; z uses the ±1 continuity correction. Everything is an
    // exact BIGINT until the single /18.0 and the sqrt. The
    // nonparametric complement of q270's Theil–Sen slope.
    "q297_mann_kendall" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val f = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      val pairs = f.as("a").join(f.as("b"), col("a.day") < col("b.day"))
        .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("s"))
      val ties = f.groupBy(col("x")).agg(count(lit(1)).as("t"))
        .agg(sum(col("t")).as("n"),
          sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5))
            .as("tie_term"))
      val j = pairs.crossJoin(broadcast(ties))
        .withColumn("varnum",
          col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5) -
            col("tie_term"))
      j.select(col("n"), col("s"), col("varnum"),
        roundz(col("s").cast("double") /
          ((col("n") * (col("n") - 1)).cast("double") / lit(2.0)), 6)
          .as("tau_mk6"),
        roundz(when(col("s") =!= 0,
          (col("s") - signum(col("s")).cast("long")).cast("double") /
            sqrt(col("varnum").cast("double") / lit(18.0)))
          .otherwise(lit(0.0)), 6).as("z6"))
    }),

    // Cochran's Q test: k binary "treatments" paired by user — the
    // indicator is SF-ADAPTIVE ("did the user log MORE of this type
    // than their own per-type mean", the integer compare cnt·k >
    // total_u), so within-block variation survives any scale (a fixed
    // absolute threshold saturates: at sf0.001 every cell passes ≥5
    // and the Q denominator is exactly 0). Q = (k−1)·[k·ΣG_j² −
    // (ΣG_j)²] / (k·ΣL_i − ΣL_i²) — G_j column sums, L_i row sums,
    // ENTIRELY exact integers except the guarded final division.
    // Generalizes q293's McNemar to k treatments. Scale: a users×types
    // spine (k=5 wide), then narrow aggregates only.
    "q298_cochran_q" -> ((s, d) => {
      val ev = table(s, d, "events")
        .select(col("user_id"), col("event_type"))
      val types = ev.select(col("event_type")).distinct()
      val cnt = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      val spine = ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(types))
      val cells = spine.join(cnt, Seq("user_id", "event_type"), "left")
        .select(col("user_id"), col("event_type"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
      val wu = Window.partitionBy(col("user_id"))
      val ut = cells
        .withColumn("total", sum(col("cnt")).over(wu))
        .withColumn("k", count(lit(1)).over(wu))
        .withColumn("xx", (col("cnt") * col("k") > col("total"))
          .cast("long"))
      val gj = ut.groupBy(col("event_type")).agg(sum(col("xx")).as("g"))
        .agg(count(lit(1)).as("k"), sum(col("g")).as("sg"),
          sum(col("g") * col("g")).as("sg2"))
      val li = ut.groupBy(col("user_id")).agg(sum(col("xx")).as("l"))
        .agg(count(lit(1)).as("n_users"), sum(col("l")).as("sl"),
          sum(col("l") * col("l")).as("sl2"))
      val den = col("k") * col("sl") - col("sl2")
      gj.crossJoin(broadcast(li))
        .select(col("k"), col("n_users"), col("sg"), col("sl"),
          roundz(when(den > 0, ((col("k") - 1) *
            (col("k") * col("sg2") - col("sg") * col("sg"))).cast("double") /
            den.cast("double")).otherwise(lit(0.0)), 6)
            .as("q6"))
    }),

    // Brown–Forsythe homogeneity-of-variance test: one-way ANOVA F on
    // |x − median_g| with the per-group LOWER median (the value at
    // row_number (n+1) div 2 — a deterministic order statistic, no
    // even-n averaging ambiguity across engines). Deviations are exact
    // integers; the F stage reuses q291's ordered-cumsum spelling.
    // Scale: one rank window per group + the O(k) F fold.
    "q299_brown_forsythe" -> ((s, d) => {
      val e = table(s, d, "events")
        .select(col("event_type").as("g"), cents(col("value")).as("x"))
      val wg = Window.partitionBy(col("g")).orderBy(col("x"))
      val wgAll = Window.partitionBy(col("g"))
      val med = e
        .withColumn("rn", row_number().over(wg).cast("long"))
        .withColumn("ng", count(lit(1)).over(wgAll))
        .filter(col("rn") === expr("(ng + 1) div 2"))
        .select(col("g"), col("x").as("med"))
      val z = e.join(med, Seq("g"))
        .select(col("g"), abs(col("x") - col("med")).as("z"))
      val byg = z.groupBy(col("g"))
        .agg(count(lit(1)).as("ng"), sum(col("z")).as("sg"),
          sum(col("z") * col("z")).as("qg"))
      val w = Window.orderBy(col("g"))
      val wAll = Window.partitionBy()
      val c = byg
        .withColumn("k", count(lit(1)).over(wAll))
        .withColumn("n", sum(col("ng")).over(wAll))
        .withColumn("stot", sum(col("sg")).over(wAll))
        .withColumn("qtot", sum(col("qg")).over(wAll))
        .withColumn("cum",
          sum(col("sg").cast("double") * col("sg").cast("double") /
            col("ng").cast("double")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(Window.orderBy(col("g").desc)))
        .filter(col("rn") === 1)
      val ssb = col("cum") - col("stot").cast("double") *
        col("stot").cast("double") / col("n").cast("double")
      val ssw = col("qtot").cast("double") - col("cum")
      c.select(col("k"), col("n"),
        roundz((ssb / (col("k") - 1).cast("double")) /
          (ssw / (col("n") - col("k")).cast("double")), 6).as("bf_f6"))
    }),

    // q300: the composed statistical quality-monitoring pipeline —
    // ONE pass over the daily purchase-cents series emits the
    // monitoring dashboard row: Mann–Kendall trend direction (q297's
    // S), the binary-segmentation changepoint (q289's criterion),
    // first-half/second-half PSI drift (q264's ±-half smoothing), and
    // the MAD anomaly-day count (q169's 3σ-equivalent screen with the
    // deterministic lower median). Every sub-statistic keeps its
    // family's exactness discipline; the composition shares the single
    // gap-filled spine. Scale: all four legs are O(days) after the one
    // fact-table groupBy — the monitoring layer costs one scan.
    "q300_quality_monitor" -> ((s, d) => {
      val daily = events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val f = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      // leg 1: Mann–Kendall S (trend direction)
      val mk = f.as("a").join(f.as("b"), col("a.day") < col("b.day"))
        .agg(sum(signum(col("b.x") - col("a.x")).cast("long")).as("mk_s"))
      // leg 2: changepoint by max SSE reduction (q289)
      val w = Window.orderBy(col("day"))
      val wAll = Window.partitionBy()
      val cp = f
        .withColumn("nl", row_number().over(w).cast("long"))
        .withColumn("sl", sum(col("x")).over(
          w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("stot", sum(col("x")).over(wAll))
        .filter(col("nl") < col("n"))
        .withColumn("num", col("sl") * col("n") - col("stot") * col("nl"))
        .withColumn("red",
          (col("num").cast("double") / col("nl").cast("double")) *
            (col("num").cast("double") /
              (col("n") * (col("n") - col("nl"))).cast("double")))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("red").desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("day").as("cp_day"), roundz(col("red"), 4).as("cp_red4"),
          col("n"))
      // leg 3: PSI of the value distribution, first half vs second
      val half = f.crossJoin(broadcast(
          f.agg(expr("(max(day) + min(day) + 1) div 2").as("mid"),
            max(col("x")).as("maxx"))))
        .withColumn("p", (col("day") >= col("mid")).cast("long"))
        .withColumn("bin", expr("(x * 10) div (maxx + 1)"))
      val gbin = half.groupBy(col("bin"))
        .agg(sum(when(col("p") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("p") === 1, 1L).otherwise(0L)).as("cb"))
      val binSpine = half.agg(lit(0).as("__d"))
        .select(explode(sequence(lit(0L), lit(9L))).as("bin"))
        .join(gbin, Seq("bin"), "left")
        .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      val wb = Window.orderBy(col("bin"))
      val psi = binSpine
        .withColumn("na", sum(col("ca")).over(wAll))
        .withColumn("nb", sum(col("cb")).over(wAll))
        .withColumn("contrib",
          ((col("ca") + 1).cast("double") / (col("na") + 10).cast("double") -
           (col("cb") + 1).cast("double") / (col("nb") + 10).cast("double")) *
          log(((col("ca") + 1).cast("double") /
            (col("na") + 10).cast("double")) /
            ((col("cb") + 1).cast("double") /
              (col("nb") + 10).cast("double"))))
        .withColumn("cum", sum(col("contrib")).over(
          wb.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rk", row_number().over(Window.orderBy(col("bin").desc)))
        .filter(col("rk") === 1)
        .select(roundz(col("cum"), 6).as("psi6"))
      // leg 4: MAD anomaly days (lower medians, 3·1.4826 screen)
      val wf = Window.orderBy(col("x"))
      val medX = f
        .withColumn("rn", row_number().over(wf).cast("long"))
        .withColumn("nn", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("x").as("med"))
      val dev = f.crossJoin(broadcast(medX))
        .withColumn("ad", abs(col("x") - col("med")))
      val wad = Window.orderBy(col("ad"))
      val mad = dev
        .withColumn("rn", row_number().over(wad).cast("long"))
        .withColumn("nn", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(nn + 1) div 2"))
        .select(col("ad").as("mad"), col("med"))
      val anom = f.crossJoin(broadcast(mad))
        .agg(sum((abs(col("x") - col("med")).cast("double") >
          lit(3.0) * lit(1.4826) * col("mad").cast("double")).cast("long"))
          .as("n_anomalies"))
      mk.crossJoin(cp).crossJoin(psi).crossJoin(anom)
        .select(col("n").as("n_days"), col("mk_s"),
          signum(col("mk_s")).cast("long").as("trend_dir"),
          col("cp_day"), col("cp_red4"), col("psi6"), col("n_anomalies"))
    }),

    // Multi-feature OLS by normal equations + Cramer's rule: predict
    // lineitem price cents from (quantity, discount basis points) with
    // intercept. The ten moment sums are EXACT from one aggregate
    // pass — the five second-order moments accumulate in
    // decimal(38,0) because their BIGINT sums overflow as the fact
    // table grows (caught by the r9 sf0.1 sweep: SUM(y²) = 2.2e19 >
    // Long.Max at 600k rows — Spark wrapped silently while DuckDB's
    // HUGEINT stayed exact, the ADVICE-r5 class; per-row products
    // still fit a long, only the SUM widens). The 3×3 determinants
    // are then a FIXED double expression tree (exact sums cast once;
    // decimal→double and HUGEINT→double both round-to-nearest, so the
    // identical-spelling argument carries determinism). R² from the
    // fitted-coefficient identity. This is distributed linear-model
    // training in one shuffle-free scan + an O(1) solve — the
    // closed-form counterpart of q302's iterative trainer. Scale:
    // nothing but the scan.
    "q301_ols_cramer" -> ((s, d) => {
      val li = table(s, d, "lineitem").select(
        col("l_quantity").cast("long").as("x1"),
        round(col("l_discount") * 10000, 0).cast("long").as("x2"),
        cents(col("l_extendedprice")).as("y"))
      def wide(c: Column): Column = c.cast("decimal(38,0)")
      val m = li.agg(
        count(lit(1)).as("n"), sum(col("x1")).as("s1"),
        sum(col("x2")).as("s2"),
        sum(wide(col("x1") * col("x1"))).as("s11"),
        sum(wide(col("x2") * col("x2"))).as("s22"),
        sum(wide(col("x1") * col("x2"))).as("s12"),
        sum(col("y")).as("sy"),
        sum(wide(col("x1") * col("y"))).as("s1y"),
        sum(wide(col("x2") * col("y"))).as("s2y"),
        sum(wide(col("y") * col("y"))).as("syy"))
      def D(c: Column): Column = c.cast("double")
      val (n, s1, s2, s11, s22, s12, sy, s1y, s2y, syy) =
        (D(col("n")), D(col("s1")), D(col("s2")), D(col("s11")),
          D(col("s22")), D(col("s12")), D(col("sy")), D(col("s1y")),
          D(col("s2y")), D(col("syy")))
      val det = n * (s11 * s22 - s12 * s12) -
        s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
      val det0 = sy * (s11 * s22 - s12 * s12) -
        s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
      val det1 = n * (s1y * s22 - s12 * s2y) -
        sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
      val det2 = n * (s11 * s2y - s1y * s12) -
        s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
      val b0 = det0 / det
      val b1 = det1 / det
      val b2 = det2 / det
      val sst = syy - sy * sy / n
      val sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
      m.select(col("n"), roundz(b0, 6).as("b0_6"),
        roundz(b1, 6).as("b1_6"), roundz(b2, 6).as("b2_6"),
        roundz(lit(1.0) - sse / sst, 6).as("r2_6"))
    }),

    // Distributed logistic regression by Newton–Raphson (IRLS):
    // classify purchase events from the scaled value with an
    // intercept. Eight driver-side Newton rounds, each ONE aggregate
    // pass computing the exact gradient/Hessian sums (the q153 k-means
    // loop discipline: O(1) driver state, scans bounded by the
    // iteration count). The float sums are partition-order dependent,
    // so the oracle is the q153-style CONTRACT: exact row/label counts
    // plus convergence booleans (gradient vanished, log-likelihood
    // monotone, slope sign = exact-integer covariance sign) that any
    // correct trainer satisfies regardless of summation order.
    "q302_logistic_newton" -> ((s, d) => {
      import s.implicits._
      val ev = table(s, d, "events")
        .select((cents(col("value")).cast("double") / lit(10000.0))
          .as("x"),
          (col("event_type") === "purchase").cast("double").as("y"))
        .cache()
      val base = ev.agg(count(lit(1)).as("n"),
        sum(col("y")).cast("long").as("np"),
        sum(col("x")).as("sx"),
        sum(col("x") * (col("y") * 2 - 1)).as("sxy_pm"))
      val b = base.head()
      val nRows = b.getLong(0)
      var (b0, b1) = (0.0, 0.0)
      var lastLoss = Double.NegativeInfinity
      var monotone = true
      var g0, g1 = 0.0
      for (_ <- 1 to 8) {
        val eta = col("x") * b1 + b0
        val p = lit(1.0) / (lit(1.0) + exp(-eta))
        val r = ev.agg(
          sum(col("y") - p).as("g0"),
          sum((col("y") - p) * col("x")).as("g1"),
          sum(p * (lit(1.0) - p)).as("h00"),
          sum(p * (lit(1.0) - p) * col("x")).as("h01"),
          sum(p * (lit(1.0) - p) * col("x") * col("x")).as("h11"),
          sum(col("y") * eta - log(lit(1.0) + exp(eta))).as("ll"))
          .head()
        g0 = r.getDouble(0); g1 = r.getDouble(1)
        val (h00, h01, h11, ll) =
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
        // n-RELATIVE tolerance (r11, caught by the ~sf1 stress
        // rehearsal): ll is an O(n) sum, so partition-order float
        // noise grows with n while an absolute 1e-9 does not — at 1M
        // rows the flag flipped on a mathematically monotone run
        // (replicated data scales every ll by exactly the factor, so
        // the Newton iterates are identical to the small-sf run's).
        // 1e-12·n is ~5000× the ε·n summation error bound and still
        // far below any genuine Newton overshoot, which moves ll by
        // O(n)·Δ. Floored at the prior absolute 1e-9 (ADVICE-r11): the
        // relative bound may only ever RELAX the old contract — below
        // n=1000 the pure 1e-12·n form was tighter than what every
        // small-sf run had been green against.
        if (ll < lastLoss - math.max(1e-9, 1e-12 * nRows)) monotone = false
        lastLoss = ll
        val det = h00 * h11 - h01 * h01
        b0 += (h11 * g0 - h01 * g1) / det
        b1 += (h00 * g1 - h01 * g0) / det
      }
      ev.unpersist()
      // slope sign must match the exact-integer covariance sign:
      // sign(n·Σxy − Σx·Σy) over cents (y ∈ {0,1} → integer sums)
      val cov = table(s, d, "events")
        .select(cents(col("value")).as("c"),
          (col("event_type") === "purchase").cast("long").as("y"))
        .agg((count(lit(1)) * sum(col("c") * col("y")) -
          sum(col("c")) * sum(col("y"))).as("covnum")).head().getLong(0)
      Seq((nRows, b.getLong(1),
          math.abs(g0) + math.abs(g1) < 1e-6 * nRows, monotone,
          java.lang.Long.signum(cov) == math.signum(b1).toLong))
        .toDF("n", "n_pos", "converged", "ll_monotone", "slope_sign_ok")
    }),

    // Exact Shapley-value channel attribution over the three
    // non-purchase touch channels (click/view/signup): per user, the
    // exposure coalition is the set of channels seen BEFORE the first
    // purchase (all events when the user never converts); v(S) =
    // conversion rate among users with coalition exactly S, from exact
    // integer counts over the 8 masks. With k=3 the Shapley sum
    // collapses to φ_i = [2(v_i−v_∅) + Σ_pairs + 2(v_full−v_full∖i)]/6
    // — ONE division by 6, every v a single guarded division.
    // Efficiency (Σφ = v_full − v_∅) is pinned in StatsSpec. Scale:
    // one groupBy to users, one to 8 mask rows.
    "q303_shapley_channels" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("us")).as("pus"))
      val expo = ev.join(broadcast(firstP), Seq("user_id"), "left")
        .filter(col("pus").isNull || col("us") < col("pus"))
        .groupBy(col("user_id"))
        .agg(
          max((col("event_type") === "click").cast("long")).as("hc"),
          max((col("event_type") === "view").cast("long")).as("hv"),
          max((col("event_type") === "signup").cast("long")).as("hs"))
        .join(firstP.select(col("user_id"), lit(1L).as("conv")),
          Seq("user_id"), "left")
        .select(
          (col("hc") + col("hv") * 2 + col("hs") * 4).as("mask"),
          coalesce(col("conv"), lit(0L)).as("conv"))
      val byMask = expo.groupBy(col("mask"))
        .agg(count(lit(1)).as("nm"), sum(col("conv")).as("cm"))
      val spine = byMask.agg(lit(0).as("__d"))
        .select(explode(sequence(lit(0L), lit(7L))).as("mask"))
        .join(byMask, Seq("mask"), "left")
        .select(col("mask"), coalesce(col("nm"), lit(0L)).as("nm"),
          coalesce(col("cm"), lit(0L)).as("cm"))
      val piv = spine.groupBy().pivot("mask", 0 to 7)
        .agg(first(col("nm")).as("n"), first(col("cm")).as("c"))
      def v(m: Int): Column = {
        val n = col(s"${m}_n"); val c = col(s"${m}_c")
        when(n > 0, c.cast("double") / n.cast("double")).otherwise(lit(0.0))
      }
      def phi(bit: Int, others: (Int, Int)): Column = {
        val (o1, o2) = others
        (lit(2.0) * (v(bit) - v(0)) +
          (v(bit | o1) - v(o1)) + (v(bit | o2) - v(o2)) +
          lit(2.0) * (v(7) - v(7 & ~bit))) / lit(6.0)
      }
      val nTot = (0 to 7).map(m => col(s"${m}_n")).reduce(_ + _)
      piv.select(nTot.as("n_users"),
        roundz(phi(1, (2, 4)), 6).as("phi_click6"),
        roundz(phi(2, (1, 4)), 6).as("phi_view6"),
        roundz(phi(4, (1, 2)), 6).as("phi_signup6"),
        roundz(v(7) - v(0), 6).as("v_full_minus_empty6"))
    }),

    // HITS hubs & authorities on q113's event-transition graph — the
    // second link-analysis algorithm beside PageRank, and the second
    // use of the cross-engine iterative-float discipline: L1-normalize
    // and round to 12 dp each half-step so both engines re-align
    // before the next round (q113's oracle convention, unrolled twice
    // in SQL). Scale: O(|E|) per round, two equi-joins + two scalar
    // normalizations.
    "q304_hits" -> ((s, d) => {
      val ev = events(s, d)
      val edges = graft.ext.Graph.transitionEdges(ev, col("user_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long"),
        unix_micros(col("ts")), col("event_id"))
      graft.ext.Graph.hits(edges, "src", "dst", iters = 2)
        .select(col("id"), round(col("hub"), 8).as("hub8"),
          round(col("auth"), 8).as("auth8"))
        .orderBy(col("id"))
    }),

    // Embedding distribution drift between the vec_id-parity halves:
    // per-dimension mean shift (rounded to 6 dp — the q42 float-sum
    // mitigation: coordinate sums are partition-order dependent, the
    // rounding re-aligns engines), the count of dimensions shifted
    // beyond 0.02, and the cosine between the two ROUNDED mean vectors
    // accumulated as an ordered cumsum over the 64 dims (identical
    // fold order). The monitoring-layer screen for "did my embedding
    // space move" — one narrow explode + an O(dims) window.
    "q305_embedding_drift" -> ((s, d) => {
      val f = table(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "v")))
        .select(pmod(col("vec_id"), lit(2)).as("h"), col("i"),
          col("v").cast("double").as("v"))
      val byDim = f.groupBy(col("i")).agg(
        roundz(avg(when(col("h") === 0, col("v"))), 6).as("ma"),
        roundz(avg(when(col("h") === 1, col("v"))), 6).as("mb"))
      val wAll = Window.partitionBy()
      val wi = Window.orderBy(col("i"))
      val acc = byDim
        .withColumn("shift6", roundz(col("mb") - col("ma"), 6))
        .withColumn("ndims", count(lit(1)).over(wAll))
        .withColumn("nshift",
          sum((abs(col("shift6")) > 0.02).cast("long")).over(wAll))
        .withColumn("dot", sum(col("ma") * col("mb")).over(
          wi.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("na", sum(col("ma") * col("ma")).over(
          wi.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nb", sum(col("mb") * col("mb")).over(
          wi.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("mx", max(abs(col("shift6"))).over(wAll))
        .withColumn("rn", row_number().over(Window.orderBy(col("i").desc)))
        .filter(col("rn") === 1)
      acc.select(col("ndims").as("n_dims"), col("nshift").as("n_shifted"),
        roundz(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
          .as("mean_cos6"),
        roundz(col("mx"), 6).as("max_abs_shift6"))
    }),

    // Interpolated trigram language model with held-out perplexity —
    // completes the LM ladder (q105 bigram): train counts from the
    // 80/20 hash split, per-token probability 0.5·p₃ + 0.3·p₂ +
    // 0.15·p₁ + 0.05·1/(V+1) (the uniform floor keeps ln finite for
    // unseen words), log-likelihood folded TWO-LEVEL — per-doc ordered
    // cumsum (parallel across docs) then a doc-ordered O(docs) fold —
    // so the float recursion is identical on both engines at any
    // parallelism (the q175 argument, scaled). All count joins are
    // keyed on the gram; at 100 TB grams key on xxhash64.
    "q306_trigram_lm" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"),
          (pmod(col("doc_id") * lit(2654435761L), lit(10L)) < 8)
            .as("is_train"))
      val toks = docs
        .select(col("doc_id"), col("is_train"),
          posexplode(col("toks")).as(Seq("i", "tok")))
      val wd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val ctx = toks
        .withColumn("w2", lag(col("tok"), 1).over(wd))
        .withColumn("w1", lag(col("tok"), 2).over(wd))
      val train = ctx.filter(col("is_train"))
      val uni = train.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
      val totals = uni.agg(sum(col("c1")).as("nn"),
        count(lit(1)).as("vv"))
      val big = train.filter(col("w2").isNotNull)
        .groupBy(col("w2"), col("tok")).agg(count(lit(1)).as("c2"))
      val tri = train.filter(col("w1").isNotNull)
        .groupBy(col("w1"), col("w2"), col("tok"))
        .agg(count(lit(1)).as("c3"))
      val test = ctx.filter(!col("is_train") && col("w1").isNotNull)
      val scored = test
        .join(tri, Seq("w1", "w2", "tok"), "left")
        .join(big.withColumnRenamed("c2", "c2b"), Seq("w2", "tok"), "left")
        .join(big.select(col("w2").as("w1"), col("tok").as("w2"),
          col("c2").as("c2ctx")), Seq("w1", "w2"), "left")
        .join(uni.select(col("tok").as("w2"), col("c1").as("c1ctx")),
          Seq("w2"), "left")
        .join(uni.select(col("tok"), col("c1").as("c1w")), Seq("tok"),
          "left")
        .crossJoin(broadcast(totals))
        .withColumn("p",
          lit(0.5) * when(col("c2ctx").isNotNull && col("c3").isNotNull,
            col("c3").cast("double") / col("c2ctx").cast("double"))
            .otherwise(lit(0.0)) +
          lit(0.3) * when(col("c1ctx").isNotNull && col("c2b").isNotNull,
            col("c2b").cast("double") / col("c1ctx").cast("double"))
            .otherwise(lit(0.0)) +
          lit(0.15) * coalesce(
            col("c1w").cast("double") / col("nn").cast("double"),
            lit(0.0)) +
          lit(0.05) / (col("vv") + 1).cast("double"))
      val wdoc = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val perDoc = scored
        .withColumn("cll", sum(log(col("p"))).over(
          wdoc.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("cnt", count(lit(1)).over(
          Window.partitionBy(col("doc_id"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("i").desc)))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cll"), col("cnt"), col("vv"))
      val wdid = Window.orderBy(col("doc_id"))
      val tot = perDoc
        .withColumn("ll", sum(col("cll")).over(
          wdid.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("ntok", sum(col("cnt")).over(
          Window.partitionBy()))
        .withColumn("rn2", row_number().over(
          Window.orderBy(col("doc_id").desc)))
        .filter(col("rn2") === 1)
      tot.select(col("ntok").as("n_test_tokens"), col("vv").as("v_train"),
        roundz(col("ll"), 4).as("ll4"),
        roundz(exp(-col("ll") / col("ntok").cast("double")), 4).as("ppl4"))
    }),

    // Split-conformal prediction interval for daily event counts: the
    // predictor is the trailing-7-day mean (one float division from
    // exact sums), calibration = odd days, test = even days; q̂ is the
    // ⌈(n_cal+1)·0.9⌉-th smallest calibration residual — an ORDER
    // STATISTIC (rank selection with a day tie-break), not an
    // interpolated quantile, so both engines pick the identical
    // element. Coverage on test days is then an exact count. The
    // distribution-free uncertainty layer for the forecasting family
    // (q233/q260). Scale: O(days) everywhere.
    "q307_conformal" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val f = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      val w = Window.orderBy(col("day"))
      val pred = f
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("s7", sum(col("x")).over(w.rowsBetween(-7, -1)))
        .filter(col("rn") > 7)
        .withColumn("res",
          abs(col("x").cast("double") -
            col("s7").cast("double") / lit(7.0)))
        .withColumn("grp", pmod(col("day"), lit(2)))
      val cal = pred.filter(col("grp") === 1)
      val ncal = cal.agg(count(lit(1)).as("n_cal"))
      val qhat = cal.crossJoin(broadcast(ncal))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("res"), col("day"))).cast("long"))
        // ⌈(n+1)·0.9⌉ spelled in EXACT integers: ((n+1)·9 + 9) div 10 —
        // a decimal-vs-double ceil at an integral product would
        // otherwise pick different ranks on the two engines
        .filter(col("rk") === expr("((n_cal + 1) * 9 + 9) div 10"))
        .select(col("res").as("qhat"), col("n_cal"))
      val test = pred.filter(col("grp") === 0)
      test.crossJoin(broadcast(qhat))
        .agg(max(col("n_cal")).as("n_cal"),
          count(lit(1)).as("n_test"),
          max(roundz(col("qhat"), 6)).as("qhat6"),
          sum((col("res") <= col("qhat")).cast("long")).as("n_covered"))
        .select(col("n_cal"), col("n_test"), col("qhat6"),
          col("n_covered"),
          roundz(col("n_covered").cast("double") /
            col("n_test").cast("double"), 6).as("coverage6"))
    }),

    // Hill estimator of the heavy-tail index over order totals: the
    // k=500 largest cents values via a rank window (WindowGroupLimit
    // pushes the k-bound into the sort — O(k) after the scan), then
    // H = (1/(k−1))·Σ ln(x₍ᵢ₎/x₍ₖ₎) as an ordered-by-rank cumsum (the
    // q175 fold) and α̂ = 1/H. Tail-index monitoring tells a pipeline
    // whether a metric even HAS a finite variance before anyone trusts
    // a mean on it. Ranks are total (cents, then orderkey).
    "q308_hill_tail" -> ((s, d) => {
      val o = table(s, d, "orders")
        .select(cents(col("o_totalprice")).as("x"),
          col("o_orderkey").cast("long").as("ok"))
      val wr = Window.orderBy(col("x").desc, col("ok"))
      val k = 500
      val top = o.withColumn("rk", row_number().over(wr).cast("long"))
        .filter(col("rk") <= k)
      val xk = top.filter(col("rk") === k).select(col("x").as("xk"))
      val cum = top.filter(col("rk") < k).crossJoin(broadcast(xk))
        .withColumn("lnterm",
          log(col("x").cast("double") / col("xk").cast("double")))
        .withColumn("cll", sum(col("lnterm")).over(
          Window.orderBy(col("rk"))
            .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("rn", row_number().over(
          Window.orderBy(col("rk").desc)))
        .filter(col("rn") === 1)
      cum.select(lit(k.toLong).as("k"), col("xk"),
        roundz(col("cll") / lit((k - 1).toDouble), 6).as("hill6"),
        roundz(lit((k - 1).toDouble) / col("cll"), 6).as("alpha6"))
    }),

    // Stratified average-treatment-effect estimate: treatment =
    // user-id parity (q258's A/B convention), outcome = converted,
    // strata = activity buckets (total event count div 20, capped) —
    // the covariate-adjustment layer over q258's raw two-proportion
    // test. Per-stratum cell counts are exact; ATE_s is two divisions;
    // the N-weighted combine runs as an ordered cumsum over the ≤8
    // stratum rows (replicated-summary output, the q258 shape).
    "q309_stratified_ate" -> ((s, d) => {
      val users = table(s, d, "events")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("act"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"))
        .select(pmod(col("user_id"), lit(2)).as("t"),
          least(expr("act div 20"), lit(7L)).as("stratum"), col("conv"))
      val cells = users.groupBy(col("stratum")).agg(
        sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("t") === 1, col("conv")).otherwise(0L)).as("c1"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("t") === 0, col("conv")).otherwise(0L)).as("c0"))
      val wAll = Window.partitionBy()
      val ws = Window.orderBy(col("stratum"))
      val r = cells
        .withColumn("ntot", sum(col("n1") + col("n0")).over(wAll))
        .withColumn("ate_s",
          when(col("n1") > 0 && col("n0") > 0,
            col("c1").cast("double") / col("n1").cast("double") -
              col("c0").cast("double") / col("n0").cast("double"))
            .otherwise(lit(0.0)))
        .withColumn("ate_cum",
          sum((col("n1") + col("n0")).cast("double") /
            col("ntot").cast("double") * col("ate_s")).over(
            ws.rowsBetween(Window.unboundedPreceding, 0)))
      r.select(col("stratum"), col("n1"), col("c1"), col("n0"), col("c0"),
          roundz(col("ate_s"), 6).as("ate_s6"),
          roundz(col("ate_cum"), 6).as("ate_cum6"))
        .orderBy(col("stratum"))
    }),

    // Iterative proportional fitting (raking) of the event_type ×
    // user-parity contingency table to UNIFORM target margins — the
    // survey-weighting / panel-calibration primitive. Three unrolled
    // rounds, each a row-margin scaling then a column-margin scaling
    // (two partition windows over the 10-cell relation), weights
    // rounded to 12 dp between half-steps (the q113/q304 iterative-
    // float discipline). Margin convergence is pinned in StatsSpec.
    // Scale: the table is O(types × groups) after one fact aggregate —
    // IPF never touches rows again.
    "q310_ipf_raking" -> ((s, d) => {
      val cells = table(s, d, "events")
        .groupBy(col("event_type").as("g"),
          pmod(col("user_id"), lit(2)).as("p"))
        .agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy()
      val wg = Window.partitionBy(col("g"))
      val wp = Window.partitionBy(col("p"))
      val base = cells
        .withColumn("ntot", sum(col("n")).over(wAll))
        .withColumn("nc", size(collect_set(col("p")).over(wAll)))
        .withColumn("ng", size(collect_set(col("g")).over(wAll)))
      var w: org.apache.spark.sql.DataFrame = base
        .withColumn("w", col("n").cast("double"))
      for (_ <- 1 to 3) {
        w = w.withColumn("w",
          round(col("w") *
            (col("ntot").cast("double") / col("ng").cast("double")) /
            sum(col("w")).over(wg), 12))
        w = w.withColumn("w",
          round(col("w") *
            (col("ntot").cast("double") / col("nc").cast("double")) /
            sum(col("w")).over(wp), 12))
      }
      w.select(col("g"), col("p"), col("n"), round(col("w"), 8).as("w8"))
        .orderBy(col("g"), col("p"))
    }),

    // Linear-time MMD² between the vec_id-parity embedding halves
    // (linear kernel): quadruples (x₂ⱼ,x₂ⱼ₊₁,y₂ⱼ,y₂ⱼ₊₁) paired by
    // rank, h_j = ⟨x₀,x₁⟩+⟨y₀,y₁⟩−⟨x₀,y₁⟩−⟨x₁,y₀⟩ with each dot an
    // exploded-coordinate sum rounded to 6 dp (the q39/q42 float
    // mitigation), then an ordered cumsum over j for the mean — the
    // O(n) two-sample test that makes all-pairs kernel MMD tractable,
    // beside q225's KS (1-D) and q305's mean-shift screens.
    "q311_mmd_linear" -> ((s, d) => {
      val ranked = table(s, d, "embeddings")
        .select(col("vec_id"), pmod(col("vec_id"), lit(2)).as("h"),
          col("embedding"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("h")).orderBy(col("vec_id")))
          .cast("long"))
      val nmin = ranked.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .agg(min(col("c")).as("nmin"))
      val paired = ranked.crossJoin(broadcast(nmin))
        .filter(col("rn") <= col("nmin"))
        .withColumn("j", expr("(rn - 1) div 2"))
        .withColumn("s", pmod(col("rn") - 1, lit(2)))
      val quad = paired
        .select(col("j"), col("h"), col("s"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("j"), col("i"), col("h"), col("s"),
          col("v").cast("double").as("v"))
        .groupBy(col("j"), col("i"))
        .agg(
          sum(when(col("h") === 0 && col("s") === 0, col("v"))).as("x0"),
          sum(when(col("h") === 0 && col("s") === 1, col("v"))).as("x1"),
          sum(when(col("h") === 1 && col("s") === 0, col("v"))).as("y0"),
          sum(when(col("h") === 1 && col("s") === 1, col("v"))).as("y1"))
        .filter(col("x0").isNotNull && col("x1").isNotNull &&
          col("y0").isNotNull && col("y1").isNotNull)
      val hPerPair = quad.groupBy(col("j"))
        .agg(roundz(sum(col("x0") * col("x1") + col("y0") * col("y1") -
          col("x0") * col("y1") - col("x1") * col("y0")), 6).as("h6"))
      val wj = Window.orderBy(col("j"))
      val acc = hPerPair
        .withColumn("cum", sum(col("h6")).over(
          wj.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("np", count(lit(1)).over(Window.partitionBy()))
        .withColumn("rn", row_number().over(Window.orderBy(col("j").desc)))
        .filter(col("rn") === 1)
      acc.select(col("np").as("n_pairs"),
        roundz(col("cum") / col("np").cast("double"), 6).as("mmd2_6"))
    }),

    // Wald–Wolfowitz runs test (r7) — randomness audit of the daily
    // purchase-count series against its own median (the "is this
    // metric serially dependent" gate BEFORE trusting q269's iid
    // subsample CIs): days above/below the exact interpolated median
    // (Spark `percentile` ≡ DuckDB `quantile_cont`, the q169
    // equivalence), median-ties excluded (the standard rule), runs
    // counted by one lag comparison. μ = 1 + 2n₁n₀/n and
    // σ² = 2n₁n₀(2n₁n₀−n)/(n²(n−1)) are exact-integer products (n =
    // days, calendar-bounded, so n⁴ headroom is trivial) with ONE
    // division + sqrt in an identical spelling. Scale: O(days) after
    // one groupBy — the q289 shape.
    "q319_runs_test" -> ((s, d) => {
      val daily = events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val f = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      val med = f.agg(expr("percentile(x, 0.5)").as("med"))
      val signs = f.crossJoin(broadcast(med))
        .filter(col("x") =!= col("med"))
        .select(col("day"), (col("x") > col("med")).cast("long").as("s"))
      val w = Window.orderBy(col("day"))
      val runs = signs
        .withColumn("chg",
          when(lag(col("s"), 1).over(w).isNull ||
            lag(col("s"), 1).over(w) =!= col("s"), 1L).otherwise(0L))
        .agg(count(lit(1)).as("n"), sum(col("s")).as("n1"),
          sum(col("chg")).as("r"))
      runs.select(col("n"), col("n1"), (col("n") - col("n1")).as("n0"),
        col("r").as("runs"),
        roundz((col("r").cast("double") - (lit(1.0) +
          (lit(2L) * col("n1") * (col("n") - col("n1"))).cast("double") /
            col("n").cast("double"))) /
          sqrt((lit(2L) * col("n1") * (col("n") - col("n1")) *
            (lit(2L) * col("n1") * (col("n") - col("n1")) - col("n")))
            .cast("double") /
            (col("n") * col("n") * (col("n") - 1)).cast("double")), 6)
          .as("z6"))
    }),

    // Jonckheere–Terpstra ordered-trend test (r7) — "does purchase
    // value trend UP across weeks": k=4 ORDERED groups (capped week
    // index), J = Σ_{i<j} U_ij, more powerful than Kruskal–Wallis
    // (q292) when the alternative is monotone. Doubled-exact core:
    // 2J = Σ_v n_iv·(2·gt_j(v) + n_jv) over the (distinct cents ×
    // week) grid — per-week suffix counts from one partitioned cumsum,
    // the pair term a keyed self-join on v (wi < wj), every term
    // BIGINT. Normal approx (no-ties spelling, documented): E[2J] =
    // (N²−Σn²)/2 exact-integer-even; Var[2J] has an N³ term, so the
    // cube lives in DOUBLE with the ≤4 per-group terms folded in week
    // order (q283's headroom discipline — no BIGINT cubes). Scale: the
    // grid is (domain × k)-bounded; the only row-scale work is the
    // first groupBy.
    "q325_jonckheere" -> ((s, d) => {
      val ev = events(s, d).filter(col("event_type") === "purchase")
        .select(expr("unix_micros(ts) div 86400000000").as("day"),
          cents(col("value")).as("v"))
      val lo = ev.agg(min(col("day")).as("lo"))
      val g = ev.crossJoin(broadcast(lo))
        .select(least(expr("(day - lo) div 7"), lit(3L)).as("w"), col("v"))
      val byv = g.groupBy(col("w"), col("v")).agg(count(lit(1)).as("c"))
      val spine = byv.select(col("v")).distinct()
        .crossJoin(broadcast(byv.select(col("w")).distinct()))
      val grid = spine.join(byv, Seq("w", "v"), "left")
        .select(col("w"), col("v"), coalesce(col("c"), lit(0L)).as("c"))
      val wW = Window.partitionBy(col("w")).orderBy(col("v"))
      val cum = grid
        .withColumn("cle", sum(col("c")).over(
          wW.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nw", sum(col("c")).over(Window.partitionBy(col("w"))))
        .select(col("w"), col("v"), col("c"),
          (col("nw") - col("cle")).as("gt"), col("nw"))
      val j2 = cum.filter(col("c") > 0)
        .select(col("w").as("wi"), col("v"), col("c").as("ci"))
        .join(cum.select(col("w").as("wj"), col("v"), col("c").as("cj"),
          col("gt").as("gtj")), Seq("v"))
        .filter(col("wi") < col("wj"))
        .agg(sum(col("ci") * (lit(2L) * col("gtj") + col("cj"))).as("j2"))
      val wOrd = Window.orderBy(col("w"))
      val gstats = cum.groupBy(col("w")).agg(max(col("nw")).as("n_w"))
        .withColumn("term",
          col("n_w").cast("double") * col("n_w").cast("double") *
            (lit(2.0) * col("n_w").cast("double") + lit(3.0)))
        .withColumn("cumt", sum(col("term")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", count(lit(1)).over(Window.partitionBy()))
        .withColumn("nn", sum(col("n_w")).over(Window.partitionBy()))
        .withColumn("sn2", sum(col("n_w") * col("n_w"))
          .over(Window.partitionBy()))
        .withColumn("rn", row_number().over(Window.orderBy(col("w").desc)))
        .filter(col("rn") === 1)
      j2.crossJoin(broadcast(gstats))
        .select(col("k"), col("nn"), col("j2"),
          roundz((col("j2").cast("double") -
            (col("nn").cast("double") * col("nn").cast("double") -
              col("sn2").cast("double")) / lit(2.0)) /
            sqrt((col("nn").cast("double") * col("nn").cast("double") *
              (lit(2.0) * col("nn").cast("double") + lit(3.0)) -
              col("cumt")) / lit(18.0)), 6).as("z6"))
    }),

    // Two-sided 10% trimmed AND winsorized mean of order totals (r7) —
    // the robust-location pair completing q169's MAD scale estimator:
    // trim drops the g = n div 10 smallest/largest, winsorize CLAMPS
    // them to the surviving boundary values. Rank = row_number on
    // (exact cents, key) — fully deterministic incl. ties; boundary
    // values are conditional aggregates of exact ints; one division
    // per mean at the end. Scale: the rank window is the one wide
    // stage — at 100 TB this runs as the q94 distributed ranking
    // (range-partitioned rank + broadcast offsets), swapped in without
    // changing the statistic.
    "q324_trimmed_mean" -> ((s, d) => {
      val o = table(s, d, "orders")
        .select(col("o_orderkey").cast("long").as("ok"),
          cents(col("o_totalprice")).as("v"))
      val w = Window.orderBy(col("v"), col("ok"))
      val wAll = Window.partitionBy()
      val r = o.withColumn("r", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("g", expr("n div 10"))
      val t = r.agg(
        max(col("n")).as("n"), max(col("g")).as("g"),
        sum(when(col("r") > col("g") && col("r") <= col("n") - col("g"),
          col("v")).otherwise(0L)).as("s_kept"),
        sum(when(col("r") > col("g") && col("r") <= col("n") - col("g"),
          1L).otherwise(0L)).as("n_kept"),
        max(when(col("r") === col("g") + 1, col("v"))).as("lo_v"),
        max(when(col("r") === col("n") - col("g"), col("v"))).as("hi_v"))
      t.select(col("n"), col("g"), col("lo_v"), col("hi_v"),
        roundz(col("s_kept").cast("double") / col("n_kept").cast("double")
          / lit(100.0), 4).as("trimmed4"),
        roundz((col("s_kept") + col("g") * (col("lo_v") + col("hi_v")))
          .cast("double") / col("n").cast("double") / lit(100.0), 4)
          .as("winsorized4"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q319_runs_test" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         sp AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         f AS (
           SELECT sp.day, COALESCE(daily.x, 0) AS x
           FROM sp LEFT JOIN daily ON daily.day = sp.day),
         med AS (SELECT quantile_cont(x, 0.5) AS med FROM f),
         signs AS (
           SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS s
           FROM f, med WHERE x <> med),
         chg AS (
           SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
             OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS c
           FROM signs),
         t AS (
           SELECT COUNT(*) AS n, SUM(s) AS n1, SUM(c) AS r FROM chg)
         SELECT CAST(n AS BIGINT) AS n, CAST(n1 AS BIGINT) AS n1,
           CAST(n - n1 AS BIGINT) AS n0, CAST(r AS BIGINT) AS runs,
           round((CAST(r AS DOUBLE) - (1.0 +
             CAST(2*n1*(n - n1) AS DOUBLE) / CAST(n AS DOUBLE))) /
             sqrt(CAST(2*n1*(n - n1) * (2*n1*(n - n1) - n) AS DOUBLE) /
               CAST(n*n*(n - 1) AS DOUBLE)), 6) + 0.0 AS z6
         FROM t""",
    "q325_jonckheere" ->
      """WITH ev AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             CAST(round(value*100) AS BIGINT) AS v
           FROM events WHERE event_type = 'purchase'),
         lo AS (SELECT MIN(day) AS lo FROM ev),
         g AS (
           SELECT least((day - lo) // 7, 3) AS w, v FROM ev, lo),
         byv AS (
           SELECT w, v, COUNT(*) AS c FROM g GROUP BY w, v),
         spine AS (
           SELECT ws.w, vs.v
           FROM (SELECT DISTINCT v FROM byv) vs
           CROSS JOIN (SELECT DISTINCT w FROM byv) ws),
         grid AS (
           SELECT spine.w, spine.v, COALESCE(byv.c, 0) AS c
           FROM spine LEFT JOIN byv
             ON byv.w = spine.w AND byv.v = spine.v),
         cum AS (
           SELECT w, v, c,
             SUM(c) OVER (PARTITION BY w) -
               SUM(c) OVER (PARTITION BY w ORDER BY v
                 ROWS UNBOUNDED PRECEDING) AS gt,
             SUM(c) OVER (PARTITION BY w) AS nw
           FROM grid),
         j2 AS (
           SELECT SUM(i.c * (2 * j.gt + j.c)) AS j2
           FROM (SELECT w AS wi, v, c FROM cum WHERE c > 0) i
           JOIN (SELECT w AS wj, v, c, gt FROM cum) j ON i.v = j.v
           WHERE i.wi < j.wj),
         gs AS (
           SELECT w, MAX(nw) AS n_w FROM cum GROUP BY w),
         fold AS (
           SELECT w,
             SUM(CAST(n_w AS DOUBLE) * CAST(n_w AS DOUBLE) *
               (2.0 * CAST(n_w AS DOUBLE) + 3.0))
               OVER (ORDER BY w ROWS UNBOUNDED PRECEDING) AS cumt,
             COUNT(*) OVER () AS k, SUM(n_w) OVER () AS nn,
             SUM(n_w * n_w) OVER () AS sn2,
             ROW_NUMBER() OVER (ORDER BY w DESC) AS rn
           FROM gs)
         SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS nn,
           CAST(j2 AS BIGINT) AS j2,
           round((CAST(j2 AS DOUBLE) -
             (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) -
              CAST(sn2 AS DOUBLE)) / 2.0) /
             sqrt((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) *
               (2.0 * CAST(nn AS DOUBLE) + 3.0) - cumt) / 18.0), 6)
             + 0.0 AS z6
         FROM j2, fold WHERE rn = 1""",
    "q324_trimmed_mean" ->
      """WITH o AS (
           SELECT CAST(o_orderkey AS BIGINT) AS ok,
             CAST(round(o_totalprice*100) AS BIGINT) AS v
           FROM orders),
         r AS (
           SELECT v,
             CAST(ROW_NUMBER() OVER (ORDER BY v, ok) AS BIGINT) AS r,
             COUNT(*) OVER () AS n
           FROM o),
         g AS (SELECT v, r, n, n // 10 AS g FROM r),
         t AS (
           SELECT MAX(n) AS n, MAX(g) AS g,
             SUM(CASE WHEN r > g AND r <= n - g THEN v ELSE 0 END)
               AS s_kept,
             SUM(CASE WHEN r > g AND r <= n - g THEN 1 ELSE 0 END)
               AS n_kept,
             MAX(CASE WHEN r = g + 1 THEN v END) AS lo_v,
             MAX(CASE WHEN r = n - g THEN v END) AS hi_v
           FROM g)
         SELECT CAST(n AS BIGINT) AS n, CAST(g AS BIGINT) AS g,
           CAST(lo_v AS BIGINT) AS lo_v, CAST(hi_v AS BIGINT) AS hi_v,
           round(CAST(s_kept AS DOUBLE) / CAST(n_kept AS DOUBLE)
             / 100.0, 4) + 0.0 AS trimmed4,
           round(CAST(s_kept + g * (lo_v + hi_v) AS DOUBLE)
             / CAST(n AS DOUBLE) / 100.0, 4) + 0.0 AS winsorized4
         FROM t""",
    "q283_mann_whitney" ->
      """WITH e AS (
           SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
             CAST(round(value*100) AS BIGINT) AS v
           FROM events WHERE event_type IN ('click', 'purchase')),
         byv AS (
           SELECT v, COUNT(*) AS t, SUM(g) AS n1v FROM e GROUP BY v),
         ranked AS (
           SELECT v, t, n1v,
             COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
           FROM byv),
         tot AS (
           SELECT SUM(t) AS n, SUM(n1v) AS n1,
             SUM(n1v * (2*c + t + 1)) AS two_r1,
             SUM(t*t*t - t) AS tsum
           FROM ranked)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(n - n1 AS BIGINT) AS n2,
           CAST(two_r1 - n1*(n1+1) AS BIGINT) AS two_u1,
           CAST(tsum AS BIGINT) AS tsum,
           round(CAST(two_r1 - n1*(n1+1) - n1*(n - n1) AS DOUBLE) /
             sqrt(CAST(n1*(n - n1) AS DOUBLE) *
               (CAST(n+1 AS DOUBLE) -
                 CAST(tsum AS DOUBLE) / CAST(n*(n-1) AS DOUBLE)) /
               3.0), 6) + 0.0 AS z6
         FROM tot""",
    "q284_fdr_bh" ->
      """WITH byb AS (
           SELECT CAST(event_id % 64 AS BIGINT) AS bucket, COUNT(*) AS n,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
           FROM events GROUP BY 1),
         t AS (
           SELECT bucket, n, k,
             SUM(n) OVER () AS tn, SUM(k) OVER () AS tk,
             COUNT(*) OVER () AS m
           FROM byb),
         z AS (
           SELECT bucket, n, k, m,
             CAST(k*tn - n*tk AS DOUBLE) /
               sqrt(CAST(n*tk*(tn-tk) AS DOUBLE)) AS z
           FROM t),
         p AS (
           SELECT bucket, n, k, m, z, 1.0/(1.0 + z*z) AS p FROM z),
         r AS (
           SELECT bucket, n, k, m, z, p,
             CAST(ROW_NUMBER() OVER (ORDER BY p, bucket) AS BIGINT) AS r
           FROM p),
         kp AS (
           SELECT bucket, n, k, z, p, r,
             p <= CAST(r AS DOUBLE)/CAST(m AS DOUBLE) AS keep
           FROM r),
         km AS (
           SELECT bucket, n, k, z, p, r,
             COALESCE(MAX(CASE WHEN keep THEN r END) OVER (), 0) AS kmax
           FROM kp)
         SELECT bucket, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           round(z, 6) + 0.0 AS z6, round(p, 6) + 0.0 AS p6,
           r, r <= kmax AS rejected
         FROM km ORDER BY bucket""",
    "q285_kendall_tau" ->
      """WITH ov AS (
           SELECT o_custkey,
             SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS v
           FROM orders GROUP BY 1),
         cust AS (
           SELECT CAST(c_nationkey AS BIGINT) AS nk,
             CAST(c_custkey AS BIGINT) AS ck,
             CAST(round(c_acctbal*100) AS BIGINT) AS b, v
           FROM customer JOIN ov ON c_custkey = o_custkey),
         samp AS (
           SELECT nk, ck, b, v FROM (
             SELECT nk, ck, b, v,
               ROW_NUMBER() OVER (PARTITION BY nk
                 ORDER BY (ck * 2654435761) % 1000000007, ck) AS rn
             FROM cust) WHERE rn <= 120),
         pairs AS (
           SELECT a.nk,
             CAST(sign(b.b - a.b) AS BIGINT) AS sb,
             CAST(sign(b.v - a.v) AS BIGINT) AS sv
           FROM samp a JOIN samp b ON a.nk = b.nk AND a.ck < b.ck),
         g AS (
           SELECT nk, COUNT(*) AS pairs,
             SUM(CASE WHEN sb*sv = 1 THEN 1 ELSE 0 END) AS conc,
             SUM(CASE WHEN sb*sv = -1 THEN 1 ELSE 0 END) AS disc,
             SUM(CASE WHEN sb = 0 THEN 1 ELSE 0 END) AS tb,
             SUM(CASE WHEN sv = 0 THEN 1 ELSE 0 END) AS tv
           FROM pairs GROUP BY nk)
         SELECT nk, CAST(pairs AS BIGINT) AS pairs,
           CAST(conc AS BIGINT) AS conc, CAST(disc AS BIGINT) AS disc,
           CAST(tb AS BIGINT) AS tb, CAST(tv AS BIGINT) AS tv,
           round(CAST(conc - disc AS DOUBLE) /
             (sqrt(CAST(pairs - tb AS DOUBLE)) *
              sqrt(CAST(pairs - tv AS DOUBLE))), 6) + 0.0 AS tau6
         FROM g ORDER BY nk""",
    "q286_log_rank" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         lw AS (SELECT user_id, MIN(us) AS f, MAX(us) AS l
                FROM e GROUP BY user_id),
         last_t AS (
           SELECT user_id, event_type FROM (
             SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY us DESC, event_id DESC) AS rn
             FROM e)
           WHERE rn = 1),
         lifet AS (
           SELECT CAST(lw.user_id % 2 AS BIGINT) AS g,
             (lw.l - lw.f) // 86400000000 AS t,
             CASE WHEN last_t.event_type <> 'view' THEN 1 ELSE 0 END AS ev
           FROM lw JOIN last_t ON last_t.user_id = lw.user_id),
         byt AS (
           SELECT t,
             SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS a1,
             SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS a2,
             SUM(CASE WHEN g = 0 THEN ev ELSE 0 END) AS d1,
             SUM(CASE WHEN g = 1 THEN ev ELSE 0 END) AS d2
           FROM lifet GROUP BY t),
         risk AS (
           SELECT t, d1, d2, d1 + d2 AS dd,
             SUM(a1) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n1,
             SUM(a2) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n2
           FROM byt),
         fl AS (SELECT * FROM risk WHERE dd > 0),
         contrib AS (
           SELECT t, d1, dd, n1, n2, n1 + n2 AS nn,
             CAST(dd AS DOUBLE) * CAST(n1 AS DOUBLE) /
               CAST(n1 + n2 AS DOUBLE) AS e1c,
             CASE WHEN n1 + n2 > 1 THEN
               CAST(dd AS DOUBLE) *
               (CAST(n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
               (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
               (CAST(n1 + n2 - dd AS DOUBLE) /
                CAST(n1 + n2 - 1 AS DOUBLE))
             ELSE 0.0 END AS vc
           FROM fl),
         cum AS (
           SELECT t,
             SUM(d1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS o1,
             SUM(e1c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS e1,
             SUM(vc) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS v,
             ROW_NUMBER() OVER (ORDER BY t DESC) AS rn
           FROM contrib)
         SELECT CAST(o1 AS BIGINT) AS o1, round(e1, 6) + 0.0 AS e1_6,
           round(v, 6) + 0.0 AS v6,
           round((CAST(o1 AS DOUBLE) - e1) * (CAST(o1 AS DOUBLE) - e1) / v,
             6) + 0.0 AS chi2_6
         FROM cum WHERE rn = 1""",
    "q287_adamic_adar" ->
      """WITH li AS (
           SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS ok,
             CAST(l_partkey AS BIGINT) AS pk
           FROM lineitem
           WHERE (CAST(l_orderkey AS BIGINT) * 2654435761) % 20 = 0),
         e AS (
           SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
         deg AS (
           SELECT z, COUNT(*) AS deg FROM (
             SELECT a AS z FROM e UNION ALL SELECT b FROM e)
           GROUP BY z),
         w AS (
           SELECT z,
             CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT)
               AS wz
           FROM deg WHERE deg > 1),
         half AS (
           SELECT a AS z, b AS nb FROM e
           UNION ALL SELECT b, a FROM e),
         wedges AS (
           SELECT l.nb AS a, r.nb AS b, l.z
           FROM half l JOIN half r ON l.z = r.z AND l.nb < r.nb),
         cand AS (
           SELECT wd.a, wd.b, wd.z FROM wedges wd
           WHERE NOT EXISTS (SELECT 1 FROM e
             WHERE e.a = wd.a AND e.b = wd.b))
         SELECT cand.a, cand.b, COUNT(*) AS common,
           CAST(SUM(w.wz) AS BIGINT) AS aa_score
         FROM cand JOIN w ON w.z = cand.z
         GROUP BY cand.a, cand.b
         ORDER BY aa_score DESC, a, b LIMIT 20""",
    "q288_kmv_sketch" ->
      """WITH h AS (
           SELECT DISTINCT event_type,
             (user_id * 2654435761) % 4294967296 AS h
           FROM events),
         ranked AS (
           SELECT event_type, h,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY h) AS BIGINT) AS rk
           FROM h),
         kth AS (
           SELECT event_type, COUNT(*) AS exact_distinct,
             MAX(CASE WHEN rk = 16 THEN h END) AS hk
           FROM ranked GROUP BY event_type)
         SELECT event_type, CAST(exact_distinct AS BIGINT)
             AS exact_distinct,
           CAST(hk AS BIGINT) AS hk,
           CASE WHEN hk IS NOT NULL
             THEN round(15.0 * 4294967296.0 / CAST(hk AS DOUBLE), 2) + 0.0
             ELSE CAST(exact_distinct AS DOUBLE) END AS kmv_est2
         FROM kth ORDER BY event_type""",
    "q289_changepoint" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         sp AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         f AS (
           SELECT sp.day, COALESCE(daily.x, 0) AS x
           FROM sp LEFT JOIN daily ON daily.day = sp.day),
         c AS (
           SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS nl,
             SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sl,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS stot
           FROM f),
         g AS (
           SELECT day, nl, n, sl, stot,
             CAST(sl*n - stot*nl AS BIGINT) AS num
           FROM c WHERE nl < n)
         SELECT day AS split_day, nl AS n_left,
           CAST(n - nl AS BIGINT) AS n_right,
           round((CAST(num AS DOUBLE) / CAST(nl AS DOUBLE)) *
             (CAST(num AS DOUBLE) / CAST(n*(n - nl) AS DOUBLE)), 6)
             + 0.0 AS reduction6,
           round(CAST(sl AS DOUBLE) / CAST(nl AS DOUBLE), 4) + 0.0
             AS mean_left4,
           round(CAST(stot - sl AS DOUBLE) / CAST(n - nl AS DOUBLE), 4)
             + 0.0 AS mean_right4
         FROM g ORDER BY reduction6 DESC, split_day LIMIT 1""",
    "q290_preference_pairs" ->
      """WITH sc AS (
           SELECT lang, source, doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+'))
               AS BIGINT) AS score
           FROM documents),
         ranked AS (
           SELECT lang, source, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY lang, source
               ORDER BY score DESC, doc_id) AS rt,
             ROW_NUMBER() OVER (PARTITION BY lang, source
               ORDER BY score, doc_id DESC) AS rb
           FROM sc),
         top AS (
           SELECT lang, source, doc_id AS chosen_id,
             score AS chosen_score FROM ranked WHERE rt = 1),
         bot AS (
           SELECT lang, source, doc_id AS rejected_id,
             score AS rejected_score FROM ranked WHERE rb = 1)
         SELECT top.lang, top.source, chosen_id, rejected_id,
           chosen_score, rejected_score,
           chosen_score - rejected_score AS margin
         FROM top JOIN bot
           ON top.lang = bot.lang AND top.source = bot.source
         WHERE chosen_score - rejected_score >= 5
           AND chosen_id <> rejected_id
         ORDER BY top.lang, top.source""",
    "q291_anova_f" ->
      """WITH g AS (
           SELECT event_type AS g, COUNT(*) AS ng,
             SUM(CAST(round(value*100) AS BIGINT)) AS sg,
             SUM(CAST(round(value*100) AS BIGINT)
               * CAST(round(value*100) AS BIGINT)) AS qg
           FROM events GROUP BY 1),
         c AS (
           SELECT g, ng, sg, qg,
             COUNT(*) OVER () AS k, SUM(ng) OVER () AS n,
             SUM(sg) OVER () AS stot, SUM(qg) OVER () AS qtot,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
               / CAST(ng AS DOUBLE))
               OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
           FROM g),
         f AS (
           SELECT k, n,
             cum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
               / CAST(n AS DOUBLE) AS ssb,
             CAST(qtot AS DOUBLE) - cum AS ssw
           FROM c WHERE rn = 1)
         SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round(ssb, 6) + 0.0 AS ssb6, round(ssw, 6) + 0.0 AS ssw6,
           round((ssb / CAST(k - 1 AS DOUBLE)) /
                 (ssw / CAST(n - k AS DOUBLE)), 6) + 0.0 AS f6
         FROM f""",
    "q292_kruskal_wallis" ->
      """WITH e AS (
           SELECT event_type AS g,
             CAST(round(value*100) AS BIGINT) AS v
           FROM events),
         byv AS (SELECT v, COUNT(*) AS t FROM e GROUP BY v),
         ranked AS (
           SELECT v, t,
             COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
           FROM byv),
         byvg AS (
           SELECT e.g, e.v, COUNT(*) AS ngv FROM e GROUP BY e.g, e.v),
         byg AS (
           SELECT byvg.g, SUM(ngv) AS ng,
             SUM(ngv * (2*ranked.c + ranked.t + 1)) AS tworg
           FROM byvg JOIN ranked ON ranked.v = byvg.v
           GROUP BY byvg.g),
         ties AS (
           SELECT SUM(t) AS n, SUM(t*t*t - t) AS tsum FROM ranked),
         c AS (
           SELECT g, ng, tworg, n, tsum,
             COUNT(*) OVER () AS k,
             SUM(CAST(tworg AS DOUBLE) * CAST(tworg AS DOUBLE)
               / CAST(ng AS DOUBLE))
               OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS srg,
             ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
           FROM byg, ties),
         h AS (
           SELECT n, k, tsum, srg,
             3.0 * srg / CAST(n * (n + 1) AS DOUBLE)
               - 3.0 * CAST(n + 1 AS DOUBLE) AS h
           FROM c WHERE rn = 1)
         SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
           CAST(tsum AS BIGINT) AS tsum, round(h, 6) + 0.0 AS h6,
           round(h / (1.0 - (CAST(tsum AS DOUBLE)
             / CAST(n*(n-1) AS DOUBLE)) / CAST(n+1 AS DOUBLE)), 6)
             + 0.0 AS hc6
         FROM h""",
    "q293_mcnemar" ->
      """WITH ev AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pur
           FROM events),
         lo AS (SELECT MIN(day) AS lo FROM ev),
         per AS (
           SELECT user_id, least((day - lo) // 15, 1) AS p, pur
           FROM ev, lo),
         u AS (
           SELECT user_id,
             MAX(CASE WHEN p = 0 THEN pur ELSE 0 END) AS p1,
             MAX(CASE WHEN p = 1 THEN pur ELSE 0 END) AS p2
           FROM per GROUP BY user_id),
         cells AS (
           SELECT
             SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS n11,
             SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS n10,
             SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS n01,
             SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS n00
           FROM u)
         SELECT CAST(n11 AS BIGINT) AS n11, CAST(n10 AS BIGINT) AS n10,
           CAST(n01 AS BIGINT) AS n01, CAST(n00 AS BIGINT) AS n00,
           round(CASE WHEN n10 + n01 > 0 THEN
             CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
               / CAST(n10 + n01 AS DOUBLE) ELSE 0.0 END, 6) + 0.0
             AS chi2_6,
           round(CASE WHEN n10 + n01 > 0 THEN
             CAST((abs(n10 - n01) - 1) * (abs(n10 - n01) - 1) AS DOUBLE)
               / CAST(n10 + n01 AS DOUBLE) ELSE 0.0 END, 6) + 0.0
             AS chi2cc6
         FROM cells""",
    "q294_friedman" ->
      """WITH ev AS (
           SELECT user_id, event_type AS g,
             CAST(round(value*100) AS BIGINT) AS x
           FROM events),
         types AS (SELECT DISTINCT g FROM ev),
         users AS (SELECT DISTINCT user_id FROM ev),
         cell AS (
           SELECT users.user_id, types.g,
             COALESCE(agg.v, 0) AS v
           FROM users CROSS JOIN types
           LEFT JOIN (SELECT user_id, g, SUM(x) AS v
                      FROM ev GROUP BY user_id, g) agg
             ON agg.user_id = users.user_id AND agg.g = types.g),
         byuv AS (
           SELECT user_id, v, COUNT(*) AS t FROM cell
           GROUP BY user_id, v),
         ranked AS (
           SELECT user_id, v, t,
             COALESCE(SUM(t) OVER (PARTITION BY user_id ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
           FROM byuv),
         tworj AS (
           SELECT cell.g,
             SUM(2*ranked.c + ranked.t + 1) AS two_rj,
             COUNT(*) AS nu
           FROM cell JOIN ranked
             ON ranked.user_id = cell.user_id AND ranked.v = cell.v
           GROUP BY cell.g),
         c AS (
           SELECT g, nu, two_rj,
             COUNT(*) OVER () AS k,
             SUM(two_rj * two_rj) OVER () AS srj
           FROM tworj)
         SELECT g, CAST(nu AS BIGINT) AS n_users,
           CAST(two_rj AS BIGINT) AS two_rj,
           round(3.0 * CAST(srj AS DOUBLE)
               / CAST(nu * k * (k + 1) AS DOUBLE)
             - 3.0 * CAST(nu * (k + 1) AS DOUBLE), 6) + 0.0 AS chi2f6
         FROM c ORDER BY g""",
    "q295_effect_sizes" ->
      """WITH e AS (
           SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             AS g, CAST(round(value*100) AS BIGINT) AS v
           FROM events WHERE event_type IN ('click', 'purchase')),
         byv AS (
           SELECT v, COUNT(*) AS t, SUM(g) AS n1v FROM e GROUP BY v),
         ranked AS (
           SELECT v, t, n1v,
             COALESCE(SUM(t) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
           FROM byv),
         rk AS (
           SELECT SUM(t) AS n, SUM(n1v) AS n1,
             SUM(n1v * (2*c + t + 1)) AS two_r1
           FROM ranked),
         m1 AS (
           SELECT COUNT(*) AS na, SUM(v) AS sa, SUM(v*v) AS qa
           FROM e WHERE g = 1),
         m0 AS (
           SELECT COUNT(*) AS nb, SUM(v) AS sb, SUM(v*v) AS qb
           FROM e WHERE g = 0),
         j AS (
           SELECT na, nb, sa, sb,
             two_r1 - n1*(n1+1) AS two_u1,
             (CAST(na AS DOUBLE) * CAST(qa AS DOUBLE)
               - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
               / (CAST(na AS DOUBLE) * CAST(na - 1 AS DOUBLE)) AS var1,
             (CAST(nb AS DOUBLE) * CAST(qb AS DOUBLE)
               - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))
               / (CAST(nb AS DOUBLE) * CAST(nb - 1 AS DOUBLE)) AS var0
           FROM rk, m1, m0),
         sp AS (
           SELECT na, nb, sa, sb, two_u1,
             sqrt((CAST(na - 1 AS DOUBLE) * var1
                 + CAST(nb - 1 AS DOUBLE) * var0)
               / CAST(na + nb - 2 AS DOUBLE)) AS sp
           FROM j)
         SELECT CAST(na AS BIGINT) AS n1, CAST(nb AS BIGINT) AS n2,
           round((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
             - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) / sp, 6) + 0.0
             AS cohens_d6,
           round(CAST(two_u1 - na*nb AS DOUBLE)
             / CAST(na*nb AS DOUBLE), 6) + 0.0 AS cliffs_delta6
         FROM sp""",
    "q296_ngram_novelty" ->
      """WITH docs AS (
           SELECT doc_id, lang, string_split(lower(text), ' ') AS toks,
             (doc_id * 2654435761) % 10 < 8 AS is_train
           FROM documents
           WHERE len(string_split(lower(text), ' ')) >= 3),
         grams AS (
           SELECT lang, is_train,
             unnest([array_to_string(toks[i:i+2], ' ')
                     for i in generate_series(1, len(toks)-2)]) AS gram
           FROM docs),
         train AS (
           SELECT DISTINCT lang, gram FROM grams WHERE is_train),
         test AS (
           SELECT DISTINCT lang, gram FROM grams WHERE NOT is_train),
         novel AS (
           SELECT lang, COUNT(*) AS n_novel FROM test
           WHERE NOT EXISTS (SELECT 1 FROM train
             WHERE train.lang = test.lang AND train.gram = test.gram)
           GROUP BY lang),
         tot AS (
           SELECT lang, COUNT(*) AS n_test_grams FROM test GROUP BY lang)
         SELECT tot.lang, tot.n_test_grams,
           CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
           round(CAST(COALESCE(novel.n_novel, 0) AS DOUBLE)
             / CAST(tot.n_test_grams AS DOUBLE), 6) + 0.0 AS novelty6
         FROM tot LEFT JOIN novel ON novel.lang = tot.lang
         ORDER BY tot.lang""",
    "q297_mann_kendall" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
           FROM events GROUP BY 1),
         sp AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         f AS (
           SELECT sp.day, COALESCE(daily.x, 0) AS x
           FROM sp LEFT JOIN daily ON daily.day = sp.day),
         pairs AS (
           SELECT CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT)
             AS s
           FROM f a JOIN f b ON a.day < b.day),
         ties AS (
           SELECT SUM(t) AS n,
             SUM(t * (t - 1) * (2*t + 5)) AS tie_term
           FROM (SELECT x, COUNT(*) AS t FROM f GROUP BY x)),
         j AS (
           SELECT s, n,
             n * (n - 1) * (2*n + 5) - tie_term AS varnum
           FROM pairs, ties)
         SELECT CAST(n AS BIGINT) AS n, s,
           CAST(varnum AS BIGINT) AS varnum,
           round(CAST(s AS DOUBLE)
             / (CAST(n * (n - 1) AS DOUBLE) / 2.0), 6) + 0.0 AS tau_mk6,
           round(CASE WHEN s <> 0 THEN
             CAST(s - CAST(sign(s) AS BIGINT) AS DOUBLE)
               / sqrt(CAST(varnum AS DOUBLE) / 18.0)
             ELSE 0.0 END, 6) + 0.0 AS z6
         FROM j""",
    "q298_cochran_q" ->
      """WITH ev AS (SELECT user_id, event_type FROM events),
         types AS (SELECT DISTINCT event_type FROM ev),
         users AS (SELECT DISTINCT user_id FROM ev),
         cnt AS (
           SELECT user_id, event_type, COUNT(*) AS cnt
           FROM ev GROUP BY 1, 2),
         cells AS (
           SELECT users.user_id, types.event_type,
             COALESCE(cnt.cnt, 0) AS cnt
           FROM users CROSS JOIN types
           LEFT JOIN cnt ON cnt.user_id = users.user_id
             AND cnt.event_type = types.event_type),
         ut AS (
           SELECT user_id, event_type,
             CASE WHEN cnt * (COUNT(*) OVER (PARTITION BY user_id)) >
               SUM(cnt) OVER (PARTITION BY user_id)
             THEN 1 ELSE 0 END AS xx
           FROM cells),
         gj AS (
           SELECT COUNT(*) AS k, SUM(g) AS sg, SUM(g*g) AS sg2 FROM
             (SELECT event_type, SUM(xx) AS g FROM ut GROUP BY 1)),
         li AS (
           SELECT COUNT(*) AS n_users, SUM(l) AS sl, SUM(l*l) AS sl2
           FROM (SELECT user_id, SUM(xx) AS l FROM ut GROUP BY 1))
         SELECT CAST(k AS BIGINT) AS k,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(sg AS BIGINT) AS sg, CAST(sl AS BIGINT) AS sl,
           round(CASE WHEN k * sl - sl2 > 0 THEN
             CAST((k - 1) * (k * sg2 - sg * sg) AS DOUBLE)
               / CAST(k * sl - sl2 AS DOUBLE) ELSE 0.0 END, 6) + 0.0
             AS q6
         FROM gj, li""",
    "q299_brown_forsythe" ->
      """WITH e AS (
           SELECT event_type AS g,
             CAST(round(value*100) AS BIGINT) AS x
           FROM events),
         med AS (
           SELECT g, x AS med FROM (
             SELECT g, x,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY x) AS rn,
               COUNT(*) OVER (PARTITION BY g) AS ng
             FROM e)
           WHERE rn = (ng + 1) // 2),
         z AS (
           SELECT e.g, abs(e.x - med.med) AS z
           FROM e JOIN med ON med.g = e.g),
         byg AS (
           SELECT g, COUNT(*) AS ng, SUM(z) AS sg, SUM(z*z) AS qg
           FROM z GROUP BY g),
         c AS (
           SELECT g, ng, sg, qg,
             COUNT(*) OVER () AS k, SUM(ng) OVER () AS n,
             SUM(sg) OVER () AS stot, SUM(qg) OVER () AS qtot,
             SUM(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
               / CAST(ng AS DOUBLE))
               OVER (ORDER BY g ROWS UNBOUNDED PRECEDING) AS cum,
             ROW_NUMBER() OVER (ORDER BY g DESC) AS rn
           FROM byg),
         f AS (
           SELECT k, n,
             cum - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)
               / CAST(n AS DOUBLE) AS ssb,
             CAST(qtot AS DOUBLE) - cum AS ssw
           FROM c WHERE rn = 1)
         SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
           round((ssb / CAST(k - 1 AS DOUBLE)) /
                 (ssw / CAST(n - k AS DOUBLE)), 6) + 0.0 AS bf_f6
         FROM f""",
    "q300_quality_monitor" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day,
             SUM(CAST(round(value*100) AS BIGINT)) AS x
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         sp AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         f AS (
           SELECT sp.day, COALESCE(daily.x, 0) AS x
           FROM sp LEFT JOIN daily ON daily.day = sp.day),
         mk AS (
           SELECT CAST(SUM(CAST(sign(b.x - a.x) AS BIGINT)) AS BIGINT)
             AS mk_s
           FROM f a JOIN f b ON a.day < b.day),
         cpre AS (
           SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS nl,
             SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS sl,
             COUNT(*) OVER () AS n, SUM(x) OVER () AS stot
           FROM f),
         cg AS (
           SELECT day, nl, n,
             CAST(sl*n - stot*nl AS BIGINT) AS num
           FROM cpre WHERE nl < n),
         cred AS (
           SELECT day, n,
             (CAST(num AS DOUBLE) / CAST(nl AS DOUBLE)) *
             (CAST(num AS DOUBLE) / CAST(n * (n - nl) AS DOUBLE)) AS red
           FROM cg),
         cp AS (
           SELECT day AS cp_day, round(red, 4) + 0.0 AS cp_red4,
             CAST(n AS BIGINT) AS n
           FROM cred ORDER BY red DESC, day LIMIT 1),
         lim AS (
           SELECT (MAX(day) + MIN(day) + 1) // 2 AS mid,
             MAX(x) AS maxx FROM f),
         half AS (
           SELECT CASE WHEN f.day >= lim.mid THEN 1 ELSE 0 END AS p,
             (f.x * 10) // (lim.maxx + 1) AS bin
           FROM f, lim),
         gbin AS (
           SELECT bin,
             SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS ca,
             SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS cb
           FROM half GROUP BY bin),
         bsp AS (SELECT unnest(generate_series(0, 9)) AS bin),
         grid AS (
           SELECT bsp.bin, COALESCE(gbin.ca, 0) AS ca,
             COALESCE(gbin.cb, 0) AS cb
           FROM bsp LEFT JOIN gbin ON gbin.bin = bsp.bin),
         pc AS (
           SELECT bin, ca, cb, SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb
           FROM grid),
         psic AS (
           SELECT bin,
             (CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)
               - CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)) *
             ln((CAST(ca + 1 AS DOUBLE) / CAST(na + 10 AS DOUBLE)) /
                (CAST(cb + 1 AS DOUBLE) / CAST(nb + 10 AS DOUBLE)))
               AS contrib
           FROM pc),
         psi AS (
           SELECT round(cum, 6) + 0.0 AS psi6 FROM (
             SELECT SUM(contrib) OVER (ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS cum,
               ROW_NUMBER() OVER (ORDER BY bin DESC) AS rk
             FROM psic)
           WHERE rk = 1),
         medx AS (
           SELECT x AS med FROM (
             SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x) AS BIGINT)
               AS rn, COUNT(*) OVER () AS nn
             FROM f)
           WHERE rn = (nn + 1) // 2),
         madq AS (
           SELECT ad AS mad, med FROM (
             SELECT abs(f.x - medx.med) AS ad, medx.med,
               CAST(ROW_NUMBER() OVER (ORDER BY abs(f.x - medx.med))
                 AS BIGINT) AS rn,
               COUNT(*) OVER () AS nn
             FROM f, medx)
           WHERE rn = (nn + 1) // 2),
         anom AS (
           SELECT CAST(SUM(CASE WHEN
               CAST(abs(f.x - madq.med) AS DOUBLE) >
                 CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE)
                   * CAST(madq.mad AS DOUBLE)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
           FROM f, madq)
         SELECT cp.n AS n_days, mk.mk_s,
           CAST(sign(mk.mk_s) AS BIGINT) AS trend_dir,
           cp.cp_day, cp.cp_red4, psi.psi6, anom.n_anomalies
         FROM mk, cp, psi, anom""",
    "q301_ols_cramer" ->
      """WITH li AS (
           SELECT CAST(l_quantity AS BIGINT) AS x1,
             CAST(round(l_discount * 10000) AS BIGINT) AS x2,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS y
           FROM lineitem),
         m AS (
           SELECT COUNT(*) AS n, SUM(x1) AS s1, SUM(x2) AS s2,
             SUM(x1*x1) AS s11, SUM(x2*x2) AS s22, SUM(x1*x2) AS s12,
             SUM(y) AS sy, SUM(x1*y) AS s1y, SUM(x2*y) AS s2y,
             SUM(y*y) AS syy
           FROM li),
         dd AS (
           SELECT CAST(n AS DOUBLE) AS n, CAST(s1 AS DOUBLE) AS s1,
             CAST(s2 AS DOUBLE) AS s2, CAST(s11 AS DOUBLE) AS s11,
             CAST(s22 AS DOUBLE) AS s22, CAST(s12 AS DOUBLE) AS s12,
             CAST(sy AS DOUBLE) AS sy, CAST(s1y AS DOUBLE) AS s1y,
             CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy,
             CAST(n AS BIGINT) AS n_out
           FROM m),
         dets AS (
           SELECT n_out, sy, s1y, s2y, syy, n,
             n * (s11*s22 - s12*s12) - s1 * (s1*s22 - s12*s2)
               + s2 * (s1*s12 - s11*s2) AS det,
             sy * (s11*s22 - s12*s12) - s1 * (s1y*s22 - s12*s2y)
               + s2 * (s1y*s12 - s11*s2y) AS det0,
             n * (s1y*s22 - s12*s2y) - sy * (s1*s22 - s12*s2)
               + s2 * (s1*s2y - s1y*s2) AS det1,
             n * (s11*s2y - s1y*s12) - s1 * (s1*s2y - s1y*s2)
               + sy * (s1*s12 - s11*s2) AS det2
           FROM dd),
         co AS (
           SELECT n_out, sy, s1y, s2y, syy, n,
             det0/det AS b0, det1/det AS b1, det2/det AS b2
           FROM dets)
         SELECT n_out AS n,
           round(b0, 6) + 0.0 AS b0_6, round(b1, 6) + 0.0 AS b1_6,
           round(b2, 6) + 0.0 AS b2_6,
           round(1.0 - (syy - (b0*sy + b1*s1y + b2*s2y))
             / (syy - sy*sy/n), 6) + 0.0 AS r2_6
         FROM co""",
    "q302_logistic_newton" ->
      """SELECT (SELECT COUNT(*) FROM events) AS n,
           (SELECT COUNT(*) FROM events WHERE event_type = 'purchase')
             AS n_pos,
           TRUE AS converged, TRUE AS ll_monotone,
           TRUE AS slope_sign_ok""",
    "q303_shapley_channels" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         firstp AS (
           SELECT user_id, MIN(us) AS pus FROM ev
           WHERE event_type = 'purchase' GROUP BY user_id),
         expo AS (
           SELECT ev.user_id,
             MAX(CASE WHEN ev.event_type = 'click' THEN 1 ELSE 0 END)
               AS hc,
             MAX(CASE WHEN ev.event_type = 'view' THEN 1 ELSE 0 END)
               AS hv,
             MAX(CASE WHEN ev.event_type = 'signup' THEN 1 ELSE 0 END)
               AS hs
           FROM ev LEFT JOIN firstp ON firstp.user_id = ev.user_id
           WHERE firstp.pus IS NULL OR ev.us < firstp.pus
           GROUP BY ev.user_id),
         masked AS (
           SELECT expo.hc + expo.hv * 2 + expo.hs * 4 AS mask,
             CASE WHEN firstp.user_id IS NULL THEN 0 ELSE 1 END AS conv
           FROM expo LEFT JOIN firstp ON firstp.user_id = expo.user_id),
         bym AS (
           SELECT mask, COUNT(*) AS nm, SUM(conv) AS cm
           FROM masked GROUP BY mask),
         sp AS (SELECT unnest(generate_series(0, 7)) AS mask),
         grid AS (
           SELECT sp.mask, COALESCE(bym.nm, 0) AS nm,
             COALESCE(bym.cm, 0) AS cm
           FROM sp LEFT JOIN bym ON bym.mask = sp.mask),
         piv AS (
           SELECT
             SUM(nm) AS n_users,
             MAX(CASE WHEN mask=0 THEN nm END) AS n0,
             MAX(CASE WHEN mask=0 THEN cm END) AS c0,
             MAX(CASE WHEN mask=1 THEN nm END) AS n1,
             MAX(CASE WHEN mask=1 THEN cm END) AS c1,
             MAX(CASE WHEN mask=2 THEN nm END) AS n2,
             MAX(CASE WHEN mask=2 THEN cm END) AS c2,
             MAX(CASE WHEN mask=3 THEN nm END) AS n3,
             MAX(CASE WHEN mask=3 THEN cm END) AS c3,
             MAX(CASE WHEN mask=4 THEN nm END) AS n4,
             MAX(CASE WHEN mask=4 THEN cm END) AS c4,
             MAX(CASE WHEN mask=5 THEN nm END) AS n5,
             MAX(CASE WHEN mask=5 THEN cm END) AS c5,
             MAX(CASE WHEN mask=6 THEN nm END) AS n6,
             MAX(CASE WHEN mask=6 THEN cm END) AS c6,
             MAX(CASE WHEN mask=7 THEN nm END) AS n7,
             MAX(CASE WHEN mask=7 THEN cm END) AS c7
           FROM grid),
         vv AS (
           SELECT n_users,
             CASE WHEN n0 > 0 THEN CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE)
               ELSE 0.0 END AS v0,
             CASE WHEN n1 > 0 THEN CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE)
               ELSE 0.0 END AS v1,
             CASE WHEN n2 > 0 THEN CAST(c2 AS DOUBLE)/CAST(n2 AS DOUBLE)
               ELSE 0.0 END AS v2,
             CASE WHEN n3 > 0 THEN CAST(c3 AS DOUBLE)/CAST(n3 AS DOUBLE)
               ELSE 0.0 END AS v3,
             CASE WHEN n4 > 0 THEN CAST(c4 AS DOUBLE)/CAST(n4 AS DOUBLE)
               ELSE 0.0 END AS v4,
             CASE WHEN n5 > 0 THEN CAST(c5 AS DOUBLE)/CAST(n5 AS DOUBLE)
               ELSE 0.0 END AS v5,
             CASE WHEN n6 > 0 THEN CAST(c6 AS DOUBLE)/CAST(n6 AS DOUBLE)
               ELSE 0.0 END AS v6,
             CASE WHEN n7 > 0 THEN CAST(c7 AS DOUBLE)/CAST(n7 AS DOUBLE)
               ELSE 0.0 END AS v7
           FROM piv)
         SELECT CAST(n_users AS BIGINT) AS n_users,
           round((2.0*(v1 - v0) + (v3 - v2) + (v5 - v4)
             + 2.0*(v7 - v6)) / 6.0, 6) + 0.0 AS phi_click6,
           round((2.0*(v2 - v0) + (v3 - v1) + (v6 - v4)
             + 2.0*(v7 - v5)) / 6.0, 6) + 0.0 AS phi_view6,
           round((2.0*(v4 - v0) + (v5 - v1) + (v6 - v2)
             + 2.0*(v7 - v3)) / 6.0, 6) + 0.0 AS phi_signup6,
           round(v7 - v0, 6) + 0.0 AS v_full_minus_empty6
         FROM vv""",
    "q304_hits" ->
      """WITH seq AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS node
           FROM events),
         tr AS (
           SELECT node AS dst,
             lag(node) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS src
           FROM seq),
         e AS (
           SELECT DISTINCT src, dst FROM tr
           WHERE src IS NOT NULL AND src <> dst),
         nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
         nn AS (SELECT COUNT(*) * 1.0 AS n FROM nodes),
         s0 AS (
           SELECT id, round(1.0 / n, 12) AS hub,
             round(1.0 / n, 12) AS auth
           FROM nodes, nn),
         a1r AS (
           SELECT e.dst AS id, SUM(s.hub) AS ar
           FROM e JOIN s0 s ON s.id = e.src GROUP BY 1),
         a1s AS (SELECT SUM(ar) AS asum FROM a1r),
         a1 AS (
           SELECT n.id,
             round(COALESCE(a1r.ar, 0) / a1s.asum, 12) AS auth
           FROM nodes n CROSS JOIN a1s
           LEFT JOIN a1r ON a1r.id = n.id),
         h1r AS (
           SELECT e.src AS id, SUM(a.auth) AS hr
           FROM e JOIN a1 a ON a.id = e.dst GROUP BY 1),
         h1s AS (SELECT SUM(hr) AS hsum FROM h1r),
         h1 AS (
           SELECT n.id,
             round(COALESCE(h1r.hr, 0) / h1s.hsum, 12) AS hub
           FROM nodes n CROSS JOIN h1s
           LEFT JOIN h1r ON h1r.id = n.id),
         a2r AS (
           SELECT e.dst AS id, SUM(h.hub) AS ar
           FROM e JOIN h1 h ON h.id = e.src GROUP BY 1),
         a2s AS (SELECT SUM(ar) AS asum FROM a2r),
         a2 AS (
           SELECT n.id,
             round(COALESCE(a2r.ar, 0) / a2s.asum, 12) AS auth
           FROM nodes n CROSS JOIN a2s
           LEFT JOIN a2r ON a2r.id = n.id),
         h2r AS (
           SELECT e.src AS id, SUM(a.auth) AS hr
           FROM e JOIN a2 a ON a.id = e.dst GROUP BY 1),
         h2s AS (SELECT SUM(hr) AS hsum FROM h2r),
         h2 AS (
           SELECT n.id,
             round(COALESCE(h2r.hr, 0) / h2s.hsum, 12) AS hub
           FROM nodes n CROSS JOIN h2s
           LEFT JOIN h2r ON h2r.id = n.id)
         SELECT h2.id, round(h2.hub, 8) + 0.0 AS hub8,
           round(a2.auth, 8) + 0.0 AS auth8
         FROM h2 JOIN a2 ON a2.id = h2.id
         ORDER BY h2.id""",
    "q305_embedding_drift" ->
      """WITH f AS (
           SELECT vec_id % 2 AS h,
             generate_subscripts(embedding, 1) - 1 AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         bydim AS (
           SELECT i,
             round(avg(CASE WHEN h = 0 THEN v END), 6) + 0.0 AS ma,
             round(avg(CASE WHEN h = 1 THEN v END), 6) + 0.0 AS mb
           FROM f GROUP BY i),
         acc AS (
           SELECT i, round(mb - ma, 6) + 0.0 AS shift6, ma, mb,
             COUNT(*) OVER () AS ndims,
             SUM(ma * mb) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
               AS dot,
             SUM(ma * ma) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
               AS na,
             SUM(mb * mb) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
               AS nb,
             ROW_NUMBER() OVER (ORDER BY i DESC) AS rn
           FROM bydim),
         agg2 AS (
           SELECT SUM(CASE WHEN abs(round(mb - ma, 6) + 0.0) > 0.02
               THEN 1 ELSE 0 END) AS nshift,
             MAX(abs(round(mb - ma, 6) + 0.0)) AS mx
           FROM bydim)
         SELECT CAST(acc.ndims AS BIGINT) AS n_dims,
           CAST(agg2.nshift AS BIGINT) AS n_shifted,
           round(acc.dot / (sqrt(acc.na) * sqrt(acc.nb)), 6) + 0.0
             AS mean_cos6,
           round(agg2.mx, 6) + 0.0 AS max_abs_shift6
         FROM acc, agg2 WHERE acc.rn = 1""",
    "q306_trigram_lm" ->
      """WITH docs AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks,
             (doc_id * 2654435761) % 10 < 8 AS is_train
           FROM documents),
         toks AS (
           SELECT doc_id, is_train,
             generate_subscripts(toks, 1) - 1 AS i,
             unnest(toks) AS tok
           FROM docs),
         ctx AS (
           SELECT doc_id, is_train, i, tok,
             lag(tok, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
             lag(tok, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w1
           FROM toks),
         train AS (SELECT * FROM ctx WHERE is_train),
         uni AS (SELECT tok, COUNT(*) AS c1 FROM train GROUP BY tok),
         totals AS (SELECT SUM(c1) AS nn, COUNT(*) AS vv FROM uni),
         big AS (
           SELECT w2, tok, COUNT(*) AS c2 FROM train
           WHERE w2 IS NOT NULL GROUP BY w2, tok),
         tri AS (
           SELECT w1, w2, tok, COUNT(*) AS c3 FROM train
           WHERE w1 IS NOT NULL GROUP BY w1, w2, tok),
         test AS (
           SELECT * FROM ctx WHERE NOT is_train AND w1 IS NOT NULL),
         scored AS (
           SELECT test.doc_id, test.i,
             CAST(0.5 AS DOUBLE) * (CASE
               WHEN bctx.c2 IS NOT NULL AND tri.c3 IS NOT NULL
               THEN CAST(tri.c3 AS DOUBLE) / CAST(bctx.c2 AS DOUBLE)
               ELSE 0.0 END) +
             CAST(0.3 AS DOUBLE) * (CASE
               WHEN uctx.c1 IS NOT NULL AND bg.c2 IS NOT NULL
               THEN CAST(bg.c2 AS DOUBLE) / CAST(uctx.c1 AS DOUBLE)
               ELSE 0.0 END) +
             CAST(0.15 AS DOUBLE) * COALESCE(
               CAST(uw.c1 AS DOUBLE) / CAST(totals.nn AS DOUBLE), 0.0) +
             CAST(0.05 AS DOUBLE) / CAST(totals.vv + 1 AS DOUBLE) AS p
           FROM test
           LEFT JOIN tri ON tri.w1 = test.w1 AND tri.w2 = test.w2
             AND tri.tok = test.tok
           LEFT JOIN big bg ON bg.w2 = test.w2 AND bg.tok = test.tok
           LEFT JOIN big bctx ON bctx.w2 = test.w1
             AND bctx.tok = test.w2
           LEFT JOIN uni uctx ON uctx.tok = test.w2
           LEFT JOIN uni uw ON uw.tok = test.tok
           CROSS JOIN totals),
         perdoc AS (
           SELECT doc_id, cll, cnt FROM (
             SELECT doc_id,
               SUM(ln(p)) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS cll,
               COUNT(*) OVER (PARTITION BY doc_id) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY i DESC) AS rn
             FROM scored)
           WHERE rn = 1),
         tot AS (
           SELECT ll, ntok FROM (
             SELECT SUM(cll) OVER (ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS ll,
               SUM(cnt) OVER () AS ntok,
               ROW_NUMBER() OVER (ORDER BY doc_id DESC) AS rn2
             FROM perdoc)
           WHERE rn2 = 1)
         SELECT CAST(tot.ntok AS BIGINT) AS n_test_tokens,
           CAST(totals.vv AS BIGINT) AS v_train,
           round(tot.ll, 4) + 0.0 AS ll4,
           round(exp(-tot.ll / CAST(tot.ntok AS DOUBLE)), 4) + 0.0
             AS ppl4
         FROM tot, totals""",
    "q307_conformal" ->
      """WITH daily AS (
           SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
           FROM events GROUP BY 1),
         sp AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         f AS (
           SELECT sp.day, COALESCE(daily.x, 0) AS x
           FROM sp LEFT JOIN daily ON daily.day = sp.day),
         pred AS (
           SELECT day, x, rn, s7,
             abs(CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0) AS res,
             day % 2 AS grp
           FROM (
             SELECT day, x,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
               SUM(x) OVER (ORDER BY day
                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS s7
             FROM f)
           WHERE rn > 7),
         cal AS (SELECT * FROM pred WHERE grp = 1),
         ncal AS (SELECT COUNT(*) AS n_cal FROM cal),
         qhat AS (
           SELECT res AS qhat, n_cal FROM (
             SELECT cal.res, ncal.n_cal,
               CAST(ROW_NUMBER() OVER (ORDER BY cal.res, cal.day)
                 AS BIGINT) AS rk
             FROM cal, ncal)
           WHERE rk = ((n_cal + 1) * 9 + 9) // 10),
         test AS (SELECT * FROM pred WHERE grp = 0)
         SELECT MAX(qhat.n_cal) AS n_cal, COUNT(*) AS n_test,
           MAX(round(qhat.qhat, 6) + 0.0) AS qhat6,
           CAST(SUM(CASE WHEN test.res <= qhat.qhat THEN 1 ELSE 0 END)
             AS BIGINT) AS n_covered,
           round(CAST(SUM(CASE WHEN test.res <= qhat.qhat
               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) + 0.0
             AS coverage6
         FROM test, qhat""",
    "q308_hill_tail" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice*100) AS BIGINT) AS x,
             CAST(o_orderkey AS BIGINT) AS ok
           FROM orders),
         top AS (
           SELECT x, rk FROM (
             SELECT x,
               CAST(ROW_NUMBER() OVER (ORDER BY x DESC, ok)
                 AS BIGINT) AS rk
             FROM o)
           WHERE rk <= 500),
         xk AS (SELECT x AS xk FROM top WHERE rk = 500),
         cum AS (
           SELECT rk,
             SUM(ln(CAST(top.x AS DOUBLE) / CAST(xk.xk AS DOUBLE)))
               OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS cll,
             ROW_NUMBER() OVER (ORDER BY rk DESC) AS rn,
             xk.xk
           FROM top, xk WHERE rk < 500)
         SELECT CAST(500 AS BIGINT) AS k, xk,
           round(cll / 499.0, 6) + 0.0 AS hill6,
           round(499.0 / cll, 6) + 0.0 AS alpha6
         FROM cum WHERE rn = 1""",
    "q309_stratified_ate" ->
      """WITH u AS (
           SELECT user_id % 2 AS t,
             least(COUNT(*) // 20, 7) AS stratum,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
           FROM events GROUP BY user_id),
         cells AS (
           SELECT stratum,
             SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN t = 1 THEN conv ELSE 0 END) AS c1,
             SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n0,
             SUM(CASE WHEN t = 0 THEN conv ELSE 0 END) AS c0
           FROM u GROUP BY stratum),
         r AS (
           SELECT stratum, n1, c1, n0, c0,
             SUM(n1 + n0) OVER () AS ntot,
             CASE WHEN n1 > 0 AND n0 > 0 THEN
               CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)
             ELSE 0.0 END AS ate_s
           FROM cells),
         c AS (
           SELECT stratum, n1, c1, n0, c0, ate_s,
             SUM(CAST(n1 + n0 AS DOUBLE) / CAST(ntot AS DOUBLE) * ate_s)
               OVER (ORDER BY stratum ROWS UNBOUNDED PRECEDING)
               AS ate_cum
           FROM r)
         SELECT stratum, CAST(n1 AS BIGINT) AS n1,
           CAST(c1 AS BIGINT) AS c1, CAST(n0 AS BIGINT) AS n0,
           CAST(c0 AS BIGINT) AS c0,
           round(ate_s, 6) + 0.0 AS ate_s6,
           round(ate_cum, 6) + 0.0 AS ate_cum6
         FROM c ORDER BY stratum""",
    "q310_ipf_raking" ->
      """WITH cells AS (
           SELECT event_type AS g, user_id % 2 AS p, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         card AS (
           SELECT COUNT(DISTINCT p) AS nc, COUNT(DISTINCT g) AS ng
           FROM cells),
         base AS (
           SELECT g, p, n,
             SUM(n) OVER () AS ntot,
             card.nc, card.ng,
             CAST(n AS DOUBLE) AS w
           FROM cells, card),
         r1 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(ng AS DOUBLE))
               / SUM(w) OVER (PARTITION BY g), 12) AS w
           FROM base),
         c1 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(nc AS DOUBLE))
               / SUM(w) OVER (PARTITION BY p), 12) AS w
           FROM r1),
         r2 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(ng AS DOUBLE))
               / SUM(w) OVER (PARTITION BY g), 12) AS w
           FROM c1),
         c2 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(nc AS DOUBLE))
               / SUM(w) OVER (PARTITION BY p), 12) AS w
           FROM r2),
         r3 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(ng AS DOUBLE))
               / SUM(w) OVER (PARTITION BY g), 12) AS w
           FROM c2),
         c3 AS (
           SELECT g, p, n, ntot, nc, ng,
             round(w * (CAST(ntot AS DOUBLE) / CAST(nc AS DOUBLE))
               / SUM(w) OVER (PARTITION BY p), 12) AS w
           FROM r3)
         SELECT g, p, CAST(n AS BIGINT) AS n,
           round(w, 8) + 0.0 AS w8
         FROM c3 ORDER BY g, p""",
    "q311_mmd_linear" ->
      """WITH ranked AS (
           SELECT vec_id, vec_id % 2 AS h, embedding,
             CAST(ROW_NUMBER() OVER (PARTITION BY vec_id % 2
               ORDER BY vec_id) AS BIGINT) AS rn
           FROM embeddings),
         nmin AS (
           SELECT MIN(c) AS nmin FROM (
             SELECT h, COUNT(*) AS c FROM ranked GROUP BY h)),
         paired AS (
           SELECT (rn - 1) // 2 AS j, (rn - 1) % 2 AS s, h, embedding
           FROM ranked, nmin WHERE rn <= nmin),
         coords AS (
           SELECT j, s, h,
             generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
           FROM paired),
         quad AS (
           SELECT j, i,
             SUM(CASE WHEN h = 0 AND s = 0 THEN v END) AS x0,
             SUM(CASE WHEN h = 0 AND s = 1 THEN v END) AS x1,
             SUM(CASE WHEN h = 1 AND s = 0 THEN v END) AS y0,
             SUM(CASE WHEN h = 1 AND s = 1 THEN v END) AS y1
           FROM coords GROUP BY j, i),
         flt AS (
           SELECT * FROM quad
           WHERE x0 IS NOT NULL AND x1 IS NOT NULL
             AND y0 IS NOT NULL AND y1 IS NOT NULL),
         hp AS (
           SELECT j, round(SUM(x0*x1 + y0*y1 - x0*y1 - x1*y0), 6) + 0.0
             AS h6
           FROM flt GROUP BY j),
         acc AS (
           SELECT SUM(h6) OVER (ORDER BY j ROWS UNBOUNDED PRECEDING)
               AS cum,
             COUNT(*) OVER () AS np,
             ROW_NUMBER() OVER (ORDER BY j DESC) AS rn
           FROM hp)
         SELECT CAST(np AS BIGINT) AS n_pairs,
           round(cum / CAST(np AS DOUBLE), 6) + 0.0 AS mmd2_6
         FROM acc WHERE rn = 1"""
  )
}
