package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Graft.{roundz, table}
import graft.ext.{Similarity, Metrics => M}

/** Evaluation-metric query family (round 6, SURVEY.md §2.14 EXT): ROC
  * AUC, two-sample KS, Cohen's kappa, Bradley–Terry preference
  * strengths, per-group isotonic (PAVA) calibration — the measurement
  * layer of a data pipeline, over the `events`/`documents` tables.
  *
  * Label/score material is derived deterministically from integer
  * columns (exact cents, overflow-safe reduced-mod hashing — SURVEY §5)
  * so every statistic is an exact-integer computation with one final
  * division, identical across engines before the defensive `roundz`.
  */
object Metrics {

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ROC AUC of the exact-cents value as a classifier score for
    // "purchase" — Mann–Whitney rank-sum with average-rank ties, one
    // group-by on the score + one window over DISTINCT scores
    // (cardinality-bounded, not row-bounded).
    "q224_auc_roc" -> ((s, d) => {
      val ev = table(s, d, "events")
      M.aucROC(ev, cents(col("value")), col("event_type") === "purchase")
        .select(col("n_pos"), col("n_neg"), roundz(col("auc"), 6).as("auc6"))
    }),

    // Two-sample Kolmogorov–Smirnov distance between the purchase and
    // click value distributions: exact integer max of |ca·Nb − cb·Na|,
    // one division; ks_at = smallest cents value attaining the max.
    "q225_ks_two_sample" -> ((s, d) => {
      val ev = table(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
      M.ksTwoSample(ev, cents(col("value")),
          col("event_type") === "purchase")
        .select(col("n_a"), col("n_b"), roundz(col("ks_d"), 6).as("ks_d6"),
          col("ks_at"))
    }),

    // Cohen's kappa between two length-based "annotators" over
    // documents (different thresholds → genuine disagreement band):
    // exact k×k contingency integers, one division.
    "q226_cohen_kappa" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val ra = when(col("n_chars") >= 600, 2)
        .when(col("n_chars") >= 200, 1).otherwise(0)
      val rb = when(length(col("text")) >= 650, 2)
        .when(length(col("text")) >= 180, 1).otherwise(0)
      M.cohenKappa(docs, ra, rb)
        .select(col("n"), roundz(col("po"), 6).as("po6"),
          roundz(col("pe"), 6).as("pe6"), roundz(col("kappa"), 6).as("kappa6"))
    }),

    // Bradley–Terry strengths from pairwise "contests": within each
    // user, every event-type pair is a comparison won by the type with
    // the larger exact-cents total (ties: no win either way). The
    // distributed phase reduces 100 TB of events to an O(items²) win
    // matrix; the MM iteration runs on that driver-side model material
    // (k-means-centroid precedent). Oracle pins the win/loss matrix
    // exactly; strength semantics are pinned by the stationarity
    // residual boolean here + the closed-form 2-item MetricsSpec case.
    "q227_bradley_terry" -> ((s, d) => {
      val t = table(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(sum(cents(col("value"))).as("tot"))
      val x = t.select(col("user_id"), col("event_type").as("ia"),
        col("tot").as("ta"))
      val y = t.select(col("user_id"), col("event_type").as("ib"),
        col("tot").as("tb"))
      val pairs = x.join(y, Seq("user_id")).filter(col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib"))
        .agg(sum(when(col("ta") > col("tb"), 1L).otherwise(0L)).as("wa"),
          sum(when(col("tb") > col("ta"), 1L).otherwise(0L)).as("wb"))
      M.bradleyTerry(pairs, "ia", "ib", "wa", "wb")
        .select(col("item"), col("wins"), col("losses"),
          col("stationary_ok"), col("loglik_monotone"))
        .orderBy(col("item"))
    }),

    // Per-label centroid-distance outlier screen over embeddings: the
    // complement of q109's per-dimension z² — distance to the OWN
    // label's centroid catches mislabeled/cross-cluster vectors that
    // global moments miss. Two narrow posexplode passes (at 100 TB the
    // centroid pass is the one-scan GramMoments UDAF; the distance
    // pass joins the O(labels·dim) centroid relation). Rounded-distance
    // ordering with vec_id tie-break (q109's determinism convention).
    "q236_centroid_outliers" -> ((s, d) => {
      val f = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("label"), col("i"),
          col("v").cast("double").as("v"))
      val cent = f.groupBy(col("label"), col("i"))
        .agg((sum(col("v")) / count(lit(1))).as("mu"))
      f.join(cent, Seq("label", "i"))
        .withColumn("dd", (col("v") - col("mu")) * (col("v") - col("mu")))
        .groupBy(col("vec_id"), col("label"))
        .agg(sqrt(sum(col("dd"))).as("dist"))
        .select(col("vec_id"), col("label"),
          roundz(col("dist"), 4).as("dist4"))
        .orderBy(col("dist4").desc, col("vec_id"))
        .limit(20)
    }),

    // Pearson chi-square independence test: event_type × value
    // tercile contingency (full grid, zero cells included). Exact
    // integer marginals; E and the per-cell terms in one fixed double
    // spelling both sides.
    "q232_chi_square" -> ((s, d) => {
      val bucket = floor(cents(col("value")) / lit(16334.0)).cast("long")
      M.chiSquare(table(s, d, "events"), col("event_type"), bucket)
        .select(col("n"), col("dof"), roundz(col("chi2"), 6).as("chi2_6"))
    }),

    // Benford leading-digit screen: observed first-digit distribution
    // of positive cents vs the log10(1 + 1/d) expectation, with the
    // per-digit chi-square contribution — the classic fabricated-data
    // tripwire. Leading digit extracted from the DECIMAL STRING (exact
    // on both engines — no float log at the extraction site).
    "q247_benford" -> ((s, d) => {
      val digits = table(s, d, "events")
        .select(cents(col("value")).as("c")).filter(col("c") > 0)
        .select(substring(col("c").cast("string"), 1, 1).cast("long")
          .as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("o"))
      digits
        .withColumn("n", sum(col("o")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .withColumn("e", log10(lit(1.0) + lit(1.0) / col("digit")) * col("n"))
        .select(col("digit"), col("o"),
          roundz(col("e"), 4).as("expected4"),
          roundz((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6)
            .as("contrib6"))
        .orderBy(col("digit"))
    }),

    // Rank-biased overlap (RBO@20, truncated, p = 0.9) between two
    // supplier rankings — total-revenue rank vs account-balance rank:
    // the top-weighted ranking-agreement metric beside q100's RRF.
    // X_d (overlap at depth d) is computed WITHOUT a depth×item
    // product: group items by m = max(rank_a, rank_b), left-join the
    // 1..20 depth spine on m, cumulative-sum — X_d = #{max(ra,rb) ≤ d}.
    // All counts exact; p^(d-1) is the only libm surface.
    "q252_rbo" -> ((s, d) => {
      val wA = org.apache.spark.sql.expressions.Window
        .orderBy(col("rev").desc, col("sk"))
      val wB = org.apache.spark.sql.expressions.Window
        .orderBy(col("bal").desc, col("sk"))
      val rev = table(s, d, "lineitem")
        .groupBy(col("l_suppkey").cast("long").as("sk"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("rev"))
      val bal = table(s, d, "supplier")
        .select(col("s_suppkey").cast("long").as("sk"),
          round(col("s_acctbal") * 100, 0).cast("long").as("bal"))
      val ranked = rev.join(bal, Seq("sk"))
        .withColumn("ra", row_number().over(wA))
        .withColumn("rb", row_number().over(wB))
        .withColumn("m", greatest(col("ra"), col("rb")))
        .filter(col("m") <= 20)
        .groupBy(col("m")).agg(count(lit(1)).as("cm"))
      val spine = s.range(1, 21).select(col("id").as("dpt"))
      val xd = spine.join(ranked, col("dpt") === col("m"), "left")
        .withColumn("xd", sum(coalesce(col("cm"), lit(0L))).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("dpt"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
      xd.agg(roundz(sum(lit(0.1) * pow(lit(0.9), col("dpt") - 1) *
            col("xd").cast("double") / col("dpt")), 6).as("rbo6"),
          max(col("xd")).as("overlap20"))
    }),

    // Gini coefficient of supplier revenue concentration: from the
    // ascending-sorted exact-cents totals, G = (2Σi·xᵢ − (n+1)Σxᵢ)
    // / (n·Σxᵢ) — integers until one division. The source-dominance
    // number for mixture planning (a 0.9-Gini corpus is one crawl).
    "q253_gini" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("rev"), col("sk"))
      table(s, d, "lineitem")
        .groupBy(col("l_suppkey").cast("long").as("sk"))
        .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
          .as("rev"))
        .withColumn("i", row_number().over(w).cast("long"))
        .agg(count(lit(1)).as("n"), sum(col("rev")).as("total_cents"),
          sum(col("i") * col("rev")).as("iwr"))
        .select(col("n"), col("total_cents"),
          roundz((lit(2L) * col("iwr") - (col("n") + 1) * col("total_cents"))
            .cast("double") / (col("n") * col("total_cents")), 6)
            .as("gini6"))
    }),

    // Kaplan–Meier survival over user lifetimes: duration = days from
    // first to last event, censored when the user's LAST event is a
    // 'view' (still active). S(t) = Π_{t'≤t} (1 − d/n) computed as
    // exp(ordered-cumsum of ln) — the cumulative sum runs in the SAME
    // t-order on both engines, so the float recursion is identical
    // (q175's determinism argument for window folds).
    "q257_kaplan_meier" -> ((s, d) => {
      val ev = graft.Graft.normalizeTs(table(s, d, "events"))
        .withColumn("us", unix_micros(col("ts")))
      val lifet = ev.groupBy(col("user_id"))
        .agg(min(col("us")).as("f"), max(col("us")).as("l"),
          max(struct(col("us"), col("event_id"), col("event_type")))
            .as("lw"))
        .select(col("user_id"),
          expr("(l - f) div 86400000000").as("t"),
          (col("lw.event_type") =!= "view").cast("long").as("ev"))
      val byT = lifet.groupBy(col("t"))
        .agg(count(lit(1)).as("all_t"), sum(col("ev")).as("d_t"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("t"))
      val risk = byT
        .withColumn("n_risk",
          sum(col("all_t")).over(w.rowsBetween(0,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)))
        .withColumn("lnf",
          when(col("d_t") < col("n_risk"),
            log(lit(1.0) - col("d_t").cast("double") / col("n_risk")))
            .otherwise(lit(0.0)))
        .withColumn("dead", // once the whole risk set dies, S pins to 0
          max((col("d_t") === col("n_risk")).cast("long")).over(
            w.rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)))
        .withColumn("s",
          when(col("dead") > 0, lit(0.0)).otherwise(
            exp(sum(col("lnf")).over(w.rowsBetween(
              org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))))
      risk.select(col("t"), col("n_risk"), col("d_t"),
          roundz(col("s"), 6).as("surv6"))
        .orderBy(col("t"))
    }),

    // Two-proportion A/B test with Wilson 95% intervals: variants by
    // user-id parity, conversion = any purchase; pooled z-statistic
    // and per-variant Wilson bounds — closed-form doubles from exact
    // integer counts, spelled identically on both engines.
    "q258_ab_test" -> ((s, d) => {
      val users = table(s, d, "events")
        .groupBy((col("user_id") % 2).as("variant"), col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      val v = users.groupBy(col("variant"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      val t = v
        .withColumn("tn", sum(col("n")).over(wAll))
        .withColumn("tc", sum(col("c")).over(wAll))
      val p = col("c").cast("double") / col("n")
      val po = (col("tc") - col("c")).cast("double") / (col("tn") - col("n"))
      val ph = col("tc").cast("double") / col("tn")
      val zc = lit(1.96)
      val z2 = lit(1.96) * lit(1.96)
      t.select(col("variant"), col("n"), col("c"),
          roundz(p, 6).as("rate6"),
          roundz((p - po) / sqrt(ph * (lit(1.0) - ph) *
            (lit(1.0) / col("n") + lit(1.0) / (col("tn") - col("n")))), 6)
            .as("z6"),
          roundz((p + z2 / (lit(2L) * col("n")) - zc *
            sqrt(p * (lit(1.0) - p) / col("n") +
              z2 / (lit(4L) * col("n") * col("n")))) /
            (lit(1.0) + z2 / col("n")), 6).as("wilson_lo6"),
          roundz((p + z2 / (lit(2L) * col("n")) + zc *
            sqrt(p * (lit(1.0) - p) / col("n") +
              z2 / (lit(4L) * col("n") * col("n")))) /
            (lit(1.0) + z2 / col("n")), 6).as("wilson_hi6"))
        .orderBy(col("variant"))
    }),

    // EXACT global median WITHOUT a global sort: MULTI-WAY search on
    // the VALUE DOMAIN — each pass is ONE scan answering 15 split
    // counts at once (sum(c <= m_i) per split in a single aggregate),
    // so the k-th order statistic costs O(log₁₆ range) narrow passes
    // instead of a total shuffle-sort (r13: the binary form paid
    // O(log₂ range) ≈ 17 scans per order statistic; 15 predicates per
    // row cost nothing next to the scan itself — the classic
    // scan-count trade at 100 TB, where passes dominate). The driver
    // holds two Longs, never data; the sketch (q66) answers
    // approximately in one pass, this answers exactly in ~4. Lower and
    // upper medians both found (the upper search re-brackets from the
    // lower's answer); their midpoint is .5-exact.
    "q261_distributed_median" -> ((s, d) => {
      import s.implicits._
      val c = table(s, d, "events").select(cents(col("value")).as("c"))
        .localCheckpoint(true) // the probe scans share one materialization
      val n = c.count()
      val (mn, mx) = {
        val r = c.agg(min(col("c")), max(col("c"))).head()
        (r.getLong(0), r.getLong(1))
      }
      def kth(k: Long, lo0: Long, hi0: Long): Long = {
        var lo = lo0
        var hi = hi0
        while (lo < hi) {
          val width = hi - lo
          // ≤15 strictly-interior split points (all of (lo, hi) when
          // the bracket is small — one final scan finishes it)
          val mids =
            if (width <= 16) (lo until hi).toSeq
            else (1 to 15).map(i => lo + width / 16 * i).distinct
          val cnts = c.agg(
            sum((col("c") <= mids.head).cast("long")).as("m0"),
            mids.tail.zipWithIndex.map { case (m, i) =>
              sum((col("c") <= m).cast("long")).as(s"m${i + 1}") }: _*)
            .head()
          val counts = mids.indices.map(i => cnts.getLong(i))
          counts.indexWhere(_ >= k) match {
            case -1 => lo = mids.last + 1
            case 0  => hi = mids.head
            case j  => lo = mids(j - 1) + 1; hi = mids(j)
          }
        }
        lo
      }
      val medLo = kth((n + 1) / 2, mn, mx)
      // the upper median is ≥ the lower one — re-bracket from it
      val medHi = kth(n / 2 + 1, medLo, mx)
      Seq((n, medLo, medHi, (medLo + medHi) / 2.0))
        .toDF("n", "med_lo", "med_hi", "median")
    }),

    // Per-group isotonic calibration: bin the score (cents div 2000),
    // empirical success rate per bin from a deterministic
    // score-correlated label, PAVA within each event-type group
    // (groups parallel, bins sequential inside one task). Fitted values
    // divide exact merged Long sums once → they equal the oracle's
    // O(b³) minimax form max_{j≤i} min_{k≥i} mean(j..k) bit-for-bit.
    "q228_isotonic_calibration" -> ((s, d) => {
      val c = cents(col("value"))
      val binned = table(s, d, "events")
        .select(col("event_type"),
          floor(c / lit(2000.0)).cast("long").as("bin"),
          when(col("event_id") % 1000 * lit(2654435761L) % 50000 < c, 1L)
            .otherwise(0L).as("y"))
        .groupBy(col("event_type"), col("bin"))
        .agg(sum(col("y")).as("pos"), count(lit(1)).as("n"))
      M.isotonicFit(binned, "event_type", "bin", "pos", "n")
        .select(col("event_type"), col("bin"), col("pos"), col("n"),
          roundz(col("fitted"), 6).as("fitted6"))
        .orderBy(col("event_type"), col("bin"))
    }),

    // Local Outlier Factor (k = 5) over sign-bucket-blocked cosine
    // neighborhoods — the DENSITY-relative outlier screen completing
    // the family (q109 per-dim z², q236 centroid distance, q169 MAD):
    // LOF flags points whose local density is low RELATIVE to their
    // neighbors', catching border points that global screens miss.
    // Blocking = q161's first-4-coordinate sign buckets (deterministic,
    // SQL-recomputable), so pair generation is an equi-join on the
    // bucket — never all-pairs; kNN is a per-point top-5 window on the
    // ROUNDED distance (ties → neighbor id). reach-dist(p,o) =
    // max(d(p,o), kdist(o)); lrd rounded 9 dp before the ratio stage
    // (the pre-round float discipline); lof averages over the JOINED
    // neighbor count so an undefined-lrd neighbor (zero-radius
    // neighborhood of exact duplicates) drops identically both sides.
    "q313_lof" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      val signBits = 4
      val bucket = (0 until signBits)
        .map(b => when(element_at(col("embedding"), b + 1) >= 0,
          lit(1 << (signBits - 1 - b))).otherwise(lit(0)))
        .reduce(_ + _)
      val emb = table(s, d, "embeddings")
        .filter(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x) > 0)
        .select(col("vec_id"), col("embedding"), bucket.as("bk"))
      val a = emb.select(col("bk"), col("vec_id").as("p"),
        col("embedding").as("va"))
      val b = emb.select(col("bk"), col("vec_id").as("o"),
        col("embedding").as("vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("p")).orderBy(col("dd"), col("o"))
      val knn = a.join(b, Seq("bk")).filter(col("p") =!= col("o"))
        .select(col("p"), col("o"), round(lit(1.0) -
          Similarity.cosineNative(col("va"), col("vb")), 6).as("dd"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
      val kstats = knn.groupBy(col("p").as("kp"))
        .agg(max(col("dd")).as("kdist"))
      val lrd = knn
        .join(kstats, col("o") === col("kp"))
        .withColumn("reach", greatest(col("dd"), col("kdist")))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n_nb"), sum(col("reach")).as("sr"))
        .filter(col("sr") > 0)
        .select(col("p"), col("n_nb"),
          round(col("n_nb") / col("sr"), 9).as("lrd"))
      val lof = knn
        .join(lrd.select(col("p").as("o"), col("lrd").as("lrd_o")), Seq("o"))
        .groupBy(col("p"))
        .agg(sum(col("lrd_o")).as("slo"), count(lit(1)).as("nj"))
        .join(lrd, Seq("p"))
        .select(col("p").as("vec_id"), col("n_nb"),
          roundz(col("slo") / col("nj") / col("lrd"), 6).as("lof6"))
      lof.orderBy(col("lof6").desc, col("vec_id")).limit(15)
    }),

    // Simplified (centroid) silhouette of the `label` partition over
    // embeddings — the clustering-quality score: a = distance to the
    // OWN label centroid, b = nearest OTHER centroid, s = (b−a)/
    // max(a,b). The label partition is data-given (deterministic), so
    // unlike q153's float-ladder k-means this is fully SQL-replayable:
    // centroids are per-coordinate means (one O(labels·dim) aggregate —
    // the broadcast side at 100 TB), distances one narrow fan-out join
    // on the coordinate spine, a/b rounded 6 dp and s rounded 9 dp
    // before the per-label mean. Low sil6 = an incoherent label —
    // the audit gate before trusting labels for stratification.
    "q314_label_silhouette" -> ((s, d) => {
      val f = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "v")))
        .select(col("vec_id"), col("label"), col("i"),
          col("v").cast("double").as("v"))
      val cent = f.groupBy(col("label").as("cl"), col("i"))
        .agg((sum(col("v")) / count(lit(1))).as("mu"))
      val dists = f.join(cent, Seq("i"))
        .withColumn("sq", (col("v") - col("mu")) * (col("v") - col("mu")))
        .groupBy(col("vec_id"), col("label"), col("cl"))
        .agg(round(sqrt(sum(col("sq"))), 6).as("dist6"))
      val ab = dists.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("cl") === col("label"), col("dist6"))).as("da"),
          min(when(col("cl") =!= col("label"), col("dist6"))).as("db"))
      val sil = ab.withColumn("sv",
        when(greatest(col("da"), col("db")) === 0, lit(0.0))
          .otherwise(round((col("db") - col("da")) /
            greatest(col("da"), col("db")), 9)))
      sil.groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"), roundz(avg(col("sv")), 6).as("sil6"))
        .orderBy(col("label"))
    }),

    // Entropic optimal transport / Sinkhorn (r7) — the
    // distribution-MATCHING distance completing the divergence family
    // (q264 PSI, q145 KL, q225 KS, q311 MMD² measure mismatch; OT also
    // says HOW to move mass — the coupling behind dataset-mixture
    // rebalancing). Marginals = the purchase vs click cent-value
    // decile histograms; cost = |i−j|; kernel K = round₁₂ exp(−|i−j|)
    // (exp is the one libm call — rounded 12 dp on BOTH engines before
    // use, the BM25 ln stance); 3 Sinkhorn rounds u←a/(Kv), v←b/(Kᵀu)
    // with round-12 between half-steps (q113's iterative-float
    // discipline) and every Σ over the 10-bin axis an ORDERED cumsum
    // (q175). Output = the 100-cell transport plan round-9 + the OT
    // cost folded in (i,j) order. Scale: the grid is bins² (here 100)
    // — bounded by the BINNING, not the data; the only row-scale work
    // is the first histogram groupBy, so the same ladder runs
    // unchanged at 100 TB with, say, 1k bins → 1M keyed-join cells.
    "q330_sinkhorn_ot" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val ev = table(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select(col("event_type").as("t"), cents(col("value")).as("v"))
      val mx = ev.agg(max(col("v")).as("maxv"))
      val binned = ev.crossJoin(broadcast(mx))
        .select(col("t"), expr("(v * 10) div (maxv + 1)").as("bin"))
        .groupBy(col("t"), col("bin")).agg(count(lit(1)).as("c"))
      val spine1 = binned.agg(lit(0).as("__d"))
        .select(explode(sequence(lit(0L), lit(9L))).as("bin"))
      def marg(tp: String, nm: String) = {
        val m = binned.filter(col("t") === tp)
        val tot = m.agg(sum(col("c")).as("n"))
        spine1.join(m.select(col("bin"), col("c")), Seq("bin"), "left")
          .crossJoin(broadcast(tot))
          .select(col("bin"),
            round(coalesce(col("c"), lit(0L)).cast("double") /
              col("n").cast("double"), 12).as(nm))
      }
      val a = marg("purchase", "a")
      val b = marg("click", "b")
      // the library operator (r8, graft.ext.Transport): same unrolled
      // ladder this query carried inline in r7 — ε=1, cost=|i−j|, and
      // x/1.0 == x bit-exactly, so the kernel and every half-step are
      // float-identical to the r7 spelling (oracle unchanged)
      val g = graft.ext.Transport.sinkhorn(a, b,
        (i, j) => abs(i - j), eps = 1.0, iters = 3)
      val plan0 = g.withColumn("p9",
          round(col("u") * col("k") * col("v"), 9))
        .withColumn("contrib",
          round(col("p9") * abs(col("i") - col("j")).cast("double"), 12))
      val wAllCells = W.orderBy(col("i"), col("j"))
      plan0
        .withColumn("cum", sum(col("contrib")).over(
          wAllCells.rowsBetween(W.unboundedPreceding, 0)))
        .withColumn("cost6", graft.Graft.roundz(
          max(col("cum")).over(W.partitionBy()), 6))
        .select(col("i"), col("j"), graft.Graft.roundz(col("p9"), 9)
          .as("p9"), col("cost6"))
        .orderBy(col("i"), col("j"))
    }),

    // Calibration curve + expected calibration error (r7) — the
    // reliability diagram that audits a score BEFORE it gates data
    // (complements q228's isotonic recalibration: this MEASURES
    // miscalibration, that fixes it). Score = each user's click-count
    // rank percentile (exact integer rank, deterministic (clicks, id)
    // tie-break); outcome = did the user ever purchase. Bins are exact
    // integer deciles of the rank (((r−1)·10) div N); per-bin
    // confidence and accuracy are single divisions of exact BIGINTs,
    // and ECE folds the ≤10 bin contributions in BIN ORDER (round-12
    // pre-round, ordered cumsum — the q175 float discipline; max of a
    // nonnegative cumsum = its last element, replicated per row).
    // Scale: one groupBy to users; the rank window is the wide stage
    // (q94's distributed ranking at 100 TB); everything after is O(10).
    "q320_calibration_curve" -> ((s, d) => {
      val u = table(s, d, "events").groupBy(col("user_id"))
        .agg(sum((col("event_type") === "click").cast("long")).as("clicks"),
          max((col("event_type") === "purchase").cast("long")).as("y"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("clicks"), col("user_id"))
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
      val r = u.withColumn("r", row_number().over(w).cast("long"))
        .withColumn("nn", count(lit(1)).over(wAll))
      val b = r.withColumn("bin", expr("((r - 1) * 10) div nn"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("r")).as("sum_r"),
          sum(col("y")).as("n_pos"), max(col("nn")).as("nn"))
      val c = b
        .withColumn("conf", col("sum_r").cast("double") /
          (col("n_b") * col("nn")).cast("double"))
        .withColumn("acc",
          col("n_pos").cast("double") / col("n_b").cast("double"))
        .withColumn("contrib", round(col("n_b").cast("double") *
          abs(col("acc") - col("conf")) / col("nn").cast("double"), 12))
      val wb = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
      c.withColumn("cum", sum(col("contrib")).over(
          wb.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
        .withColumn("ece6", roundz(max(col("cum")).over(wAll), 6))
        .select(col("bin"), col("n_b"), col("n_pos"),
          roundz(col("conf"), 6).as("conf6"),
          roundz(col("acc"), 6).as("acc6"), col("ece6"))
        .orderBy(col("bin"))
    }))

  val oracles: Map[String, String] = Map(
    "q330_sinkhorn_ot" ->
      """WITH ev AS (
           SELECT event_type AS t, CAST(round(value*100) AS BIGINT) AS v
           FROM events WHERE event_type IN ('purchase', 'click')),
         mx AS (SELECT MAX(v) AS maxv FROM ev),
         binned AS (
           SELECT t, (v * 10) // (maxv + 1) AS bin, COUNT(*) AS c
           FROM ev, mx GROUP BY 1, 2),
         sp AS (SELECT unnest(generate_series(0, 9)) AS bin),
         na AS (SELECT SUM(c) AS n FROM binned WHERE t = 'purchase'),
         nb AS (SELECT SUM(c) AS n FROM binned WHERE t = 'click'),
         am AS (
           SELECT sp.bin,
             round(CAST(COALESCE(x.c, 0) AS DOUBLE)
               / CAST(na.n AS DOUBLE), 12) AS a
           FROM sp LEFT JOIN (SELECT bin, c FROM binned
             WHERE t = 'purchase') x ON x.bin = sp.bin, na),
         bm AS (
           SELECT sp.bin,
             round(CAST(COALESCE(x.c, 0) AS DOUBLE)
               / CAST(nb.n AS DOUBLE), 12) AS b
           FROM sp LEFT JOIN (SELECT bin, c FROM binned
             WHERE t = 'click') x ON x.bin = sp.bin, nb),
         g0 AS (
           SELECT si.bin AS i, sj.bin AS j,
             round(exp(-CAST(abs(si.bin - sj.bin) AS DOUBLE)), 12) AS k,
             am.a, bm.b, 1.0 AS u
           FROM sp si CROSS JOIN sp sj
           JOIN am ON am.bin = si.bin JOIN bm ON bm.bin = sj.bin),
         s1 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g0) x1),
         v1 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s1),
         t1 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v1) x2),
         g1 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t1),
         s2 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g1) x3),
         v2 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s2),
         t2 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v2) x4),
         g2 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t2),
         s3 AS (SELECT *, MAX(cs) OVER (PARTITION BY j) AS s FROM (
           SELECT *, SUM(k*u) OVER (PARTITION BY j ORDER BY i
             ROWS UNBOUNDED PRECEDING) AS cs FROM g2) x5),
         v3 AS (SELECT i, j, k, a, b, u,
           round(CASE WHEN b > 0 THEN b/s ELSE 0.0 END, 12) AS v
           FROM s3),
         t3 AS (SELECT *, MAX(ct) OVER (PARTITION BY i) AS tt FROM (
           SELECT *, SUM(k*v) OVER (PARTITION BY i ORDER BY j
             ROWS UNBOUNDED PRECEDING) AS ct FROM v3) x6),
         g3 AS (SELECT i, j, k, a, b,
           round(CASE WHEN a > 0 THEN a/tt ELSE 0.0 END, 12) AS u, v
           FROM t3),
         p AS (SELECT i, j, round(u*k*v, 9) AS p9 FROM g3),
         cc AS (SELECT i, j, p9,
           round(p9 * CAST(abs(i - j) AS DOUBLE), 12) AS contrib
           FROM p),
         f AS (SELECT i, j, p9,
           SUM(contrib) OVER (ORDER BY i, j ROWS UNBOUNDED PRECEDING)
             AS cum
           FROM cc)
         SELECT i, j, p9 + 0.0 AS p9,
           round(MAX(cum) OVER (), 6) + 0.0 AS cost6
         FROM f ORDER BY i, j""",
    "q320_calibration_curve" ->
      """WITH u AS (
           SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicks,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
           FROM events GROUP BY user_id),
         r AS (
           SELECT clicks, y,
             CAST(ROW_NUMBER() OVER (ORDER BY clicks, user_id)
               AS BIGINT) AS r,
             COUNT(*) OVER () AS nn
           FROM u),
         b AS (
           SELECT ((r - 1) * 10) // nn AS bin, COUNT(*) AS n_b,
             SUM(r) AS sum_r, SUM(y) AS n_pos, MAX(nn) AS nn
           FROM r GROUP BY 1),
         c AS (
           SELECT bin, n_b, n_pos,
             CAST(sum_r AS DOUBLE) / CAST(n_b * nn AS DOUBLE) AS conf,
             CAST(n_pos AS DOUBLE) / CAST(n_b AS DOUBLE) AS acc,
             round(CAST(n_b AS DOUBLE) *
               abs(CAST(n_pos AS DOUBLE) / CAST(n_b AS DOUBLE) -
                   CAST(sum_r AS DOUBLE) / CAST(n_b * nn AS DOUBLE)) /
               CAST(nn AS DOUBLE), 12) AS contrib
           FROM b),
         e AS (
           SELECT bin, n_b, n_pos, conf, acc,
             SUM(contrib) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS cum
           FROM c)
         SELECT bin, CAST(n_b AS BIGINT) AS n_b,
           CAST(n_pos AS BIGINT) AS n_pos,
           round(conf, 6) + 0.0 AS conf6, round(acc, 6) + 0.0 AS acc6,
           round(MAX(cum) OVER (), 6) + 0.0 AS ece6
         FROM e ORDER BY bin""",
    "q224_auc_roc" ->
      """WITH s AS (
           SELECT CAST(round(value*100) AS BIGINT) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
           FROM events),
         g AS (SELECT s, COUNT(*) AS n, SUM(y) AS np FROM s GROUP BY s),
         r AS (
           SELECT np, n,
             SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) - n AS below
           FROM g)
         SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(n) - SUM(np) AS BIGINT) AS n_neg,
           round(CAST(SUM(np * (2*below + n + 1)) - SUM(np)*(SUM(np)+1)
               AS DOUBLE) / CAST(2 * SUM(np) * (SUM(n) - SUM(np)) AS DOUBLE),
             6) + 0.0 AS auc6
         FROM r""",
    "q225_ks_two_sample" ->
      """WITH f AS (
           SELECT CAST(round(value*100) AS BIGINT) AS v,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS a
           FROM events WHERE event_type IN ('purchase', 'click')),
         g AS (SELECT v, SUM(a) AS na, COUNT(*) - SUM(a) AS nb
               FROM f GROUP BY v),
         c AS (
           SELECT v,
             SUM(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
             SUM(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
           FROM g),
         t AS (SELECT MAX(ca) AS n_a, MAX(cb) AS n_b FROM c),
         d AS (
           SELECT c.v, abs(c.ca * t.n_b - c.cb * t.n_a) AS num,
             t.n_a, t.n_b
           FROM c, t)
         SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(CAST(num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) + 0.0
             AS ks_d6,
           v AS ks_at
         FROM d ORDER BY num DESC, v LIMIT 1""",
    "q226_cohen_kappa" ->
      """WITH c AS (
           SELECT
             CASE WHEN n_chars >= 600 THEN 2
                  WHEN n_chars >= 200 THEN 1 ELSE 0 END AS ra,
             CASE WHEN length(text) >= 650 THEN 2
                  WHEN length(text) >= 180 THEN 1 ELSE 0 END AS rb
           FROM documents),
         cells AS (SELECT ra, rb, COUNT(*) AS c FROM c GROUP BY ra, rb),
         rows_ AS (SELECT ra, SUM(c) AS rowc FROM cells GROUP BY ra),
         cols_ AS (SELECT rb, SUM(c) AS colc FROM cells GROUP BY rb),
         pe AS (
           SELECT COALESCE(SUM(rowc * colc), 0) AS pe_num
           FROM rows_ JOIN cols_ ON rows_.ra = cols_.rb),
         a AS (
           SELECT SUM(c) AS n,
             COALESCE(SUM(CASE WHEN ra = rb THEN c END), 0) AS diag
           FROM cells)
         SELECT CAST(n AS BIGINT) AS n,
           round(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0 AS po6,
           round(CAST(pe_num AS DOUBLE) / CAST(n * n AS DOUBLE), 6) + 0.0
             AS pe6,
           round(CAST(n * diag - pe_num AS DOUBLE) /
             CAST(n * n - pe_num AS DOUBLE), 6) + 0.0 AS kappa6
         FROM a, pe""",
    "q236_centroid_outliers" ->
      """WITH f AS (
           SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
             CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         cent AS (
           SELECT label, i, SUM(v) / COUNT(*) AS mu
           FROM f GROUP BY label, i),
         sc AS (
           SELECT f.vec_id, f.label,
             sqrt(SUM((f.v - c.mu) * (f.v - c.mu))) AS dist
           FROM f JOIN cent c ON c.label = f.label AND c.i = f.i
           GROUP BY f.vec_id, f.label)
         SELECT vec_id, label, round(dist, 4) + 0.0 AS dist4
         FROM sc ORDER BY dist4 DESC, vec_id LIMIT 20""",
    "q261_distributed_median" ->
      """WITH c AS (
           SELECT CAST(round(value*100) AS BIGINT) AS c FROM events),
         r AS (
           SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn,
             COUNT(*) OVER () AS n
           FROM c)
         SELECT MAX(n) AS n,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS med_lo,
           MAX(CASE WHEN rn = n // 2 + 1 THEN c END) AS med_hi,
           (MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) +
            MAX(CASE WHEN rn = n // 2 + 1 THEN c END)) / 2.0 AS median
         FROM r""",
    "q257_kaplan_meier" ->
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
         lt AS (
           SELECT lw.user_id, (lw.l - lw.f) // 86400000000 AS t,
             CASE WHEN last_t.event_type <> 'view' THEN 1 ELSE 0 END AS ev
           FROM lw JOIN last_t ON last_t.user_id = lw.user_id),
         bt AS (SELECT t, COUNT(*) AS all_t, SUM(ev) AS d_t
                FROM lt GROUP BY t),
         r AS (
           SELECT t, d_t,
             SUM(all_t) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS n_risk
           FROM bt),
         sv AS (
           SELECT t, n_risk, d_t,
             MAX(CASE WHEN d_t = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
             SUM(CASE WHEN d_t < n_risk
                 THEN ln(1.0 - CAST(d_t AS DOUBLE) / n_risk)
                 ELSE 0.0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lns
           FROM r)
         SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d_t AS BIGINT) AS d_t,
           round(CASE WHEN dead > 0 THEN 0.0 ELSE exp(lns) END, 6) + 0.0
             AS surv6
         FROM sv ORDER BY t""",
    "q258_ab_test" ->
      """WITH u AS (
           SELECT user_id % 2 AS variant, user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
           FROM events GROUP BY 1, 2),
         v AS (SELECT variant, COUNT(*) AS n, SUM(conv) AS c
               FROM u GROUP BY variant),
         t AS (SELECT variant, n, c, SUM(n) OVER () AS tn,
                 SUM(c) OVER () AS tc FROM v)
         SELECT variant, CAST(n AS BIGINT) AS n, CAST(c AS BIGINT) AS c,
           round(CAST(c AS DOUBLE) / n, 6) + 0.0 AS rate6,
           round((CAST(c AS DOUBLE) / n
               - CAST(tc - c AS DOUBLE) / (tn - n)) /
             sqrt(CAST(tc AS DOUBLE) / tn
               * (1.0 - CAST(tc AS DOUBLE) / tn)
               * (1.0 / n + 1.0 / (tn - n))), 6) + 0.0 AS z6,
           round((CAST(c AS DOUBLE) / n + 1.96 * 1.96 / (2 * n) - 1.96 *
             sqrt(CAST(c AS DOUBLE) / n * (1.0 - CAST(c AS DOUBLE) / n)
                 / n
               + 1.96 * 1.96 / (4 * n * n))) / (1.0 + 1.96 * 1.96 / n),
             6) + 0.0 AS wilson_lo6,
           round((CAST(c AS DOUBLE) / n + 1.96 * 1.96 / (2 * n) + 1.96 *
             sqrt(CAST(c AS DOUBLE) / n * (1.0 - CAST(c AS DOUBLE) / n)
                 / n
               + 1.96 * 1.96 / (4 * n * n))) / (1.0 + 1.96 * 1.96 / n),
             6) + 0.0 AS wilson_hi6
         FROM t ORDER BY variant""",
    "q252_rbo" ->
      """WITH rev AS (
           SELECT CAST(l_suppkey AS BIGINT) AS sk,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS rev
           FROM lineitem GROUP BY 1),
         bal AS (
           SELECT CAST(s_suppkey AS BIGINT) AS sk,
             CAST(round(s_acctbal*100) AS BIGINT) AS bal
           FROM supplier),
         r AS (
           SELECT rev.sk,
             ROW_NUMBER() OVER (ORDER BY rev DESC, rev.sk) AS ra,
             ROW_NUMBER() OVER (ORDER BY bal DESC, rev.sk) AS rb
           FROM rev JOIN bal ON bal.sk = rev.sk),
         m AS (
           SELECT greatest(ra, rb) AS m, COUNT(*) AS cm FROM r
           WHERE greatest(ra, rb) <= 20 GROUP BY 1),
         sp AS (SELECT d AS dpt FROM generate_series(1, 20) g(d)),
         x AS (
           SELECT sp.dpt,
             SUM(COALESCE(m.cm, 0)) OVER (ORDER BY sp.dpt
               ROWS UNBOUNDED PRECEDING) AS xd
           FROM sp LEFT JOIN m ON m.m = sp.dpt)
         SELECT round(SUM(0.1 * pow(0.9, dpt - 1) *
             CAST(xd AS DOUBLE) / dpt), 6) + 0.0 AS rbo6,
           CAST(MAX(xd) AS BIGINT) AS overlap20
         FROM x""",
    "q253_gini" ->
      """WITH rev AS (
           SELECT CAST(l_suppkey AS BIGINT) AS sk,
             SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS rev
           FROM lineitem GROUP BY 1),
         r AS (
           SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, sk) AS i
           FROM rev)
         SELECT COUNT(*) AS n, CAST(SUM(rev) AS BIGINT) AS total_cents,
           round(CAST(2*SUM(i*rev) - (COUNT(*)+1)*SUM(rev) AS DOUBLE) /
             CAST(COUNT(*)*SUM(rev) AS DOUBLE), 6) + 0.0 AS gini6
         FROM r""",
    "q247_benford" ->
      """WITH d AS (
           SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events)
           WHERE c > 0),
         g AS (SELECT digit, COUNT(*) AS o FROM d GROUP BY digit),
         w AS (
           SELECT digit, o, SUM(o) OVER () AS n,
             log10(1.0 + 1.0 / digit) * (SUM(o) OVER ()) AS e
           FROM g)
         SELECT digit, o, round(e, 4) + 0.0 AS expected4,
           round((o - e) * (o - e) / e, 6) + 0.0 AS contrib6
         FROM w ORDER BY digit""",
    "q232_chi_square" ->
      """WITH c AS (
           SELECT event_type AS ra,
             CAST(floor(CAST(round(value*100) AS BIGINT) / 16334.0)
               AS BIGINT) AS cb
           FROM events),
         cells AS (SELECT ra, cb, COUNT(*) AS o FROM c GROUP BY ra, cb),
         rows_ AS (SELECT ra, SUM(o) AS rs FROM cells GROUP BY ra),
         cols_ AS (SELECT cb, SUM(o) AS cs FROM cells GROUP BY cb),
         nn AS (SELECT SUM(o) AS n FROM cells),
         grid AS (
           SELECT r.ra, k.cb, COALESCE(e.o, 0) AS o,
             CAST(r.rs * k.cs AS DOUBLE) / n.n AS ee
           FROM rows_ r CROSS JOIN cols_ k CROSS JOIN nn n
           LEFT JOIN cells e ON e.ra = r.ra AND e.cb = k.cb)
         SELECT CAST(n.n AS BIGINT) AS n,
           CAST((SELECT COUNT(*) FROM rows_) - 1 AS BIGINT) *
             CAST((SELECT COUNT(*) FROM cols_) - 1 AS BIGINT) AS dof,
           round(SUM((o - ee) * (o - ee) / ee), 6) + 0.0 AS chi2_6
         FROM grid, nn n GROUP BY n.n""",
    // win/loss matrix recomputed exactly; strength convergence pinned
    // by in-job contract booleans (see the queries entry + MetricsSpec)
    "q227_bradley_terry" ->
      """WITH t AS (
           SELECT user_id, event_type,
             SUM(CAST(round(value*100) AS BIGINT)) AS tot
           FROM events GROUP BY user_id, event_type),
         p AS (
           SELECT x.event_type AS ia, y.event_type AS ib,
             CASE WHEN x.tot > y.tot THEN 1 ELSE 0 END AS wa,
             CASE WHEN y.tot > x.tot THEN 1 ELSE 0 END AS wb
           FROM t x JOIN t y
             ON x.user_id = y.user_id AND x.event_type < y.event_type),
         u AS (
           SELECT ia AS item, wa AS w, wb AS l FROM p
           UNION ALL
           SELECT ib, wb, wa FROM p)
         SELECT item, CAST(SUM(w) AS BIGINT) AS wins,
           CAST(SUM(l) AS BIGINT) AS losses,
           TRUE AS stationary_ok, TRUE AS loglik_monotone
         FROM u GROUP BY item ORDER BY item""",
    "q228_isotonic_calibration" ->
      """WITH e AS (
           SELECT event_type AS g,
             CAST(floor(CAST(round(value*100) AS BIGINT) / 2000.0)
               AS BIGINT) AS bin,
             CASE WHEN event_id % 1000 * 2654435761 % 50000 <
                       CAST(round(value*100) AS BIGINT)
                  THEN 1 ELSE 0 END AS y
           FROM events),
         b AS (SELECT g, bin, SUM(y) AS pos, COUNT(*) AS n
               FROM e GROUP BY g, bin),
         r AS (
           SELECT g, bin, pos, n,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY bin) AS rn,
             SUM(pos) OVER (PARTITION BY g ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS cp,
             SUM(n) OVER (PARTITION BY g ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS cn
           FROM b),
         m AS (
           SELECT j.g, j.rn AS j, k.rn AS k,
             CAST(k.cp - j.cp + j.pos AS DOUBLE) /
               CAST(k.cn - j.cn + j.n AS DOUBLE) AS mean
           FROM r j JOIN r k ON j.g = k.g AND j.rn <= k.rn),
         i1 AS (
           SELECT b2.g, b2.rn AS i, m.j, MIN(m.mean) AS v
           FROM r b2 JOIN m ON m.g = b2.g AND m.j <= b2.rn AND m.k >= b2.rn
           GROUP BY b2.g, b2.rn, m.j),
         f AS (SELECT g, i, MAX(v) AS fitted FROM i1 GROUP BY g, i)
         SELECT r.g AS event_type, r.bin, CAST(r.pos AS BIGINT) AS pos,
           CAST(r.n AS BIGINT) AS n, round(f.fitted, 6) + 0.0 AS fitted6
         FROM r JOIN f ON f.g = r.g AND f.i = r.rn
         ORDER BY event_type, bin""",
    // full LOF chain replay: same-bucket rounded distances, top-5
    // window, kdist, reach-dist, 9-dp lrd, joined-count lof
    "q313_lof" ->
      """WITH bk AS (
           SELECT vec_id,
             (CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END) AS bk
           FROM embeddings),
         f AS (
           SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         nrm AS (SELECT vec_id, sqrt(sum(v*v)) AS nrm FROM f GROUP BY vec_id),
         pairs AS (
           SELECT a.vec_id AS p, b.vec_id AS o,
             round(1 - sum(a.v*b.v) / (na.nrm * nb.nrm), 6) AS dd
           FROM f a JOIN f b ON a.i = b.i AND a.vec_id <> b.vec_id
           JOIN bk ba ON ba.vec_id = a.vec_id
           JOIN bk bb ON bb.vec_id = b.vec_id AND bb.bk = ba.bk
           JOIN nrm na ON na.vec_id = a.vec_id AND na.nrm > 0
           JOIN nrm nb ON nb.vec_id = b.vec_id AND nb.nrm > 0
           GROUP BY a.vec_id, b.vec_id, na.nrm, nb.nrm),
         knn AS (
           SELECT p, o, dd FROM (
             SELECT p, o, dd,
               ROW_NUMBER() OVER (PARTITION BY p ORDER BY dd, o) AS rk
             FROM pairs) WHERE rk <= 5),
         lrd AS (
           SELECT k.p, COUNT(*) AS n_nb,
             round(COUNT(*) / SUM(GREATEST(k.dd, ks.kdist)), 9) AS lrd
           FROM knn k JOIN (
             SELECT p AS kp, MAX(dd) AS kdist FROM knn GROUP BY p) ks
             ON k.o = ks.kp
           GROUP BY k.p HAVING SUM(GREATEST(k.dd, ks.kdist)) > 0),
         lof AS (
           SELECT k.p, SUM(lo.lrd) AS slo, COUNT(*) AS nj
           FROM knn k JOIN lrd lo ON k.o = lo.p
           GROUP BY k.p)
         SELECT l.p AS vec_id, CAST(r.n_nb AS BIGINT) AS n_nb,
           round(l.slo / l.nj / r.lrd, 6) + 0.0 AS lof6
         FROM lof l JOIN lrd r ON l.p = r.p
         ORDER BY lof6 DESC, vec_id LIMIT 15""",
    // label-centroid silhouette: per-coordinate mean centroids, the
    // same round-6 distances / round-9 s / round-6 per-label mean
    "q314_label_silhouette" ->
      """WITH f AS (
           SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
                  CAST(unnest(embedding) AS DOUBLE) AS v
           FROM embeddings),
         cent AS (
           SELECT label AS cl, i, SUM(v) / COUNT(*) AS mu
           FROM f GROUP BY label, i),
         dists AS (
           SELECT f.vec_id, f.label, c.cl,
             round(sqrt(SUM((f.v - c.mu) * (f.v - c.mu))), 6) AS dist6
           FROM f JOIN cent c ON f.i = c.i
           GROUP BY f.vec_id, f.label, c.cl),
         ab AS (
           SELECT vec_id, label,
             MAX(CASE WHEN cl = label THEN dist6 END) AS da,
             MIN(CASE WHEN cl <> label THEN dist6 END) AS db
           FROM dists GROUP BY vec_id, label),
         sil AS (
           SELECT label,
             CASE WHEN GREATEST(da, db) = 0 THEN 0.0
               ELSE round((db - da) / GREATEST(da, db), 9) END AS sv
           FROM ab)
         SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n,
           round(AVG(sv), 6) + 0.0 AS sil6
         FROM sil GROUP BY label ORDER BY label""")
}
