package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Graft.table

/** Event-stream-shaped operators over the `events` table (SURVEY.md §2.6
  * A1, §2.10, §2.14): last-writer-wins dedup, sessionization (both the
  * window-function island formulation and Spark's native `session_window`),
  * sliding frames, pivot, and regex extraction from a JSON-ish payload.
  *
  * Time arithmetic is done in exact integer microseconds on both sides
  * (`unix_micros` / DuckDB `epoch_us`) — no float time math.
  */
object Events {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  /** 30-minute session gap in microseconds. */
  private val GapUs = 1800L * 1000000L

  /** The events table's `ts` physical type varies by harness generation
    * (epoch-nano long / TIMESTAMP_NTZ micros); [[graft.Graft.normalizeTs]]
    * rebuilds a microsecond TimestampType with exact integer math either
    * way. Oracles truncate with `epoch_us` to the same precision.
    */
  private def events(s: SparkSession, d: String): DataFrame =
    graft.Graft.normalizeTs(table(s, d, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Forward-fill (LOCF) imputation: carry each user's last PURCHASE
    // amount forward across their sparse event stream —
    // last(ignoreNulls) over an unbounded-preceding row frame keyed by
    // the total order (ts, event_id). The standard sensor/state
    // imputation operator; one user-keyed window shuffle, values stay
    // exact BIGINT cents (no float arithmetic touches the carried
    // value). Rows before a user's first purchase stay NULL — the
    // honest no-observation answer.
    "q219_forward_fill" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .filter(col("user_id") <= 40)
        .withColumn("purchase_cents",
          when(col("event_type") === "purchase", cents(col("value"))))
        .withColumn("filled_cents",
          last(col("purchase_cents"), ignoreNulls = true).over(w))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("filled_cents"))
        .orderBy(col("user_id"), col("us"), col("event_id"))
    }),

    // Last-writer-wins dedup per key — the deterministic window
    // formulation of the reference's JS-Map dedup (task.ts:187-209,
    // SURVEY.md §2.6 A1): latest event per user, total order by
    // (ts, event_id) so shuffles can't change the answer.
    "q19_lastwins_dedup" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"),
          cents(col("value")).as("last_value_cents"))
        .orderBy(col("user_id"))
    }),

    // Sessionization, island-gap formulation: new session when the gap to
    // the previous event exceeds 30 minutes.
    "q21_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("prev_us", lag(col("us"), 1).over(byUser))
        .withColumn("is_new",
          when(col("prev_us").isNull || col("us") - col("prev_us") > GapUs, 1L)
            .otherwise(0L))
        .withColumn("sess", sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"))
        .agg(max(col("sess")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Native session_window (Spark's streaming-grade session operator,
    // usable in batch). Oracle = island formulation with the same
    // boundary rule (session_window's end is exclusive ⇒ gap >= 30min
    // starts a new session).
    "q22_session_window" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start_us"))
    }),

    // Sliding frame: running 4-row sum per user (ROWS BETWEEN).
    "q23_moving_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, Window.currentRow)
      events(s, d)
        .withColumn("win_cents", sum(cents(col("value"))).over(w))
        .select(col("event_id"), col("user_id"), col("win_cents"))
        .orderBy(col("event_id"))
    }),

    // Time-RANGE frame (vs q23's ROWS frame): per-user 10-minute
    // trailing sum on exact integer microseconds. RANGE includes ties as
    // peers, so the value is a function of (user, ts) and shuffles can't
    // change it.
    "q61_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-600L * 1000000L, Window.currentRow)
      events(s, d)
        .withColumn("w_cents", sum(cents(col("value"))).over(w))
        .select(col("event_id"), col("user_id"), col("w_cents"))
        .orderBy(col("event_id"))
    }),

    // Pivot: event_type → columns (explicit value list keeps the plan to
    // one pass and the output schema deterministic).
    "q24_pivot" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("user_id"))
    }),

    // Regex extraction from the JSON-ish props payload (SURVEY.md §2.3 F4
    // relational analogue) + lag/lead derivatives.
    "q25_regex_extract" -> ((s, d) => {
      events(s, d)
        .filter(col("props").rlike("\"k\": \\d+"))
        .withColumn("k",
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
        .orderBy(col("k"))
    }),

    // lag/lead scalar window functions: per-user time delta between
    // consecutive events, bucketed.
    "q26_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("prev_us").isNotNull && col("next_type").isNotNull)
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - col("prev_us")).as("gap_us"),
          col("next_type"))
        .orderBy(col("event_id"))
    }),

    // Error-safe ingestion arithmetic (try_cast / try_divide): dirty
    // numeric strings (garbage appended to every 7th payload) become
    // NULL instead of failing the job or poisoning the batch — the
    // row-level error containment a 100 TB ingest needs (ANSI-strict
    // would kill the stage on one bad row; the reference's JS Number()
    // coercion is the same lenient stance, SURVEY §2.3). Per-type
    // rollup counts parsed/failed and sums a guarded division.
    "q151_try_arithmetic" -> ((s, d) => {
      val ev = events(s, d)
        .withColumn("kstr",
          regexp_extract(col("props"), "([0-9]+)", 1))
        .withColumn("raw",
          when(pmod(col("event_id"), lit(7)) === 0,
            concat(col("kstr"), lit("x"))).otherwise(col("kstr")))
        .withColumn("k", expr("try_cast(raw AS BIGINT)"))
        .withColumn("ratio", expr("try_divide(100L, k)"))
      ev.groupBy(col("event_type"))
        .agg(count(col("k")).as("n_parsed"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_failed"),
          sum(col("k")).as("sum_k"),
          round(sum(col("ratio")), 6).as("sum_ratio"))
        .orderBy(col("event_type"))
    }),

    // Map-typed feature assembly: per-user event-type count MAP — the
    // feature-store row shape (model inputs want one map column, not
    // 5 pivoted columns whose set changes with the taxonomy). Build =
    // two-stage agg → sort_array of (key, count) structs →
    // map_from_entries; the SORT makes the map's entry order (and so
    // its JSON serialization) deterministic — unordered map equality
    // is not portable across engines, canonical JSON is. Narrow after
    // one user-keyed shuffle.
    "q150_feature_map" -> ((s, d) => {
      events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("user_id"))
        .agg(to_json(map_from_entries(sort_array(
          collect_list(struct(col("event_type"), col("n"))))))
          .as("counts_json"),
          sum(col("n")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Trailing-window distinct users (6-hour sliding, hourly grain)
    // from MERGEABLE per-hour bitmap partials: events aggregate ONCE
    // into per-(hour, bucket) bitmaps, then a 6-row window OR-merges
    // the partials — the trailing distinct never rescans events, which
    // is the only shape that works when the window slides hourly over
    // a year of 100 TB history (the naive form re-reads 6 hours of raw
    // events per slide). The hour spine is tiny, so the ordered window
    // over it is a non-issue; exactness comes from the bitmaps (vs
    // HLL's approximate merge, q76).
    "q134_sliding_distinct" -> ((s, d) => {
      val hourly = events(s, d)
        .select(expr("unix_micros(ts) div 3600000000").as("hour"),
          col("user_id"))
        .groupBy(col("hour"), expr("bitmap_bucket_number(user_id)").as("b"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
          .as("bm"))
      // (hour × bucket) spine: a bucket silent in one hour must still
      // carry its trailing bitmap into that hour's count — without the
      // spine the RANGE frame has no row to land on and undercounts.
      // Both sides are tiny aggregates (hours, bucket ids), so the
      // product is O(spine), not O(events).
      val spine = hourly.select(col("hour")).distinct()
        .crossJoin(hourly.select(col("b")).distinct())
      val w = Window.partitionBy(col("b")).orderBy(col("hour"))
        .rangeBetween(-5, Window.currentRow)
      spine.join(hourly, Seq("hour", "b"), "left")
        .withColumn("bm6", expr("bitmap_or_agg(bm)").over(w))
        .select(col("hour"),
          coalesce(expr("bitmap_count(bm6)"), lit(0L)).as("cnt"))
        .groupBy(col("hour"))
        .agg(sum(col("cnt")).as("distinct_users_6h"))
        .orderBy(col("hour"))
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: P(next | current) from lead() pairs — the behavioral
    // n-gram model behind "what follows a click". ONE window shuffle on
    // user_id builds the pairs; the per-state totals come from a window
    // over the pair aggregate (state cardinality, tiny), not a second
    // corpus pass. Probability = one integer division, rounded — floats
    // are engine-identical.
    "q128_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = events(s, d)
        .withColumn("nxt", lead(col("event_type"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy(col("event_type").as("cur"), col("nxt"))
        .agg(count(lit(1)).as("n"))
      pairs
        .withColumn("n_cur",
          sum(col("n")).over(Window.partitionBy(col("cur"))))
        .select(col("cur"), col("nxt"), col("n"),
          round(col("n") * 1.0 / col("n_cur"), 6).as("p"))
        .orderBy(col("cur"), col("nxt"))
    }),

    // Ordered funnel view→click→purchase (graft.ops.Funnel): each
    // stage is a user-keyed aggregate joined to the previous stage's
    // reach time — one shuffle key end to end, one timestamp of state
    // per user per stage. Strict temporal ordering (ts, not arrival).
    "q110_funnel" -> ((s, d) => {
      // events(s, d), not the raw table: normalizeTs keeps funnel's
      // strict ts comparisons at the same micro precision the oracle's
      // epoch_us truncation sees on a TIMESTAMP(NANOS) generation
      val ev = events(s, d)
      graft.ops.Funnel.funnel(ev, col("user_id"), col("event_type"),
          col("ts"), Seq("view", "click", "purchase"))
        .orderBy(col("stage_idx"))
    }),

    // Cohort retention (graft.ops.Funnel.retentionCohorts): cohort =
    // first active day (integer epoch-day via exact micros div — no
    // timezone semantics), distinct-user activity at day offsets 1 and
    // 7. user-keyed aggregates only; the rollup is cohort-sized.
    "q111_retention" -> ((s, d) => {
      val ev = events(s, d)
      graft.ops.Funnel.retentionCohorts(ev, col("user_id"),
          expr("unix_micros(ts) div 86400000000"), Seq(1, 7))
        .orderBy(col("cohort_day"))
    }),

    // Association rules (market-basket): support / confidence / lift
    // for event-type pairs co-occurring within a user's history. Baskets
    // are per-user DISTINCT items, so the within-user pair join fans out
    // B² per user with B bounded by the item universe — the classic
    // a-priori shape (for unbounded universes, cap baskets to top-B
    // items first). Counts are integers; each metric is ONE division of
    // integer products, so floats are engine-identical.
    "q121_assoc_rules" -> ((s, d) => {
      val baskets = table(s, d, "events")
        .select(col("user_id"), col("event_type").as("item")).distinct()
      val a = baskets.select(col("user_id"), col("item").as("item_a"))
      val b = baskets.select(col("user_id"), col("item").as("item_b"))
      val pairs = a.join(b, Seq("user_id"))
        .filter(col("item_a") < col("item_b"))
        .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("nab"))
      val ic = baskets.groupBy(col("item")).agg(count(lit(1)).as("ni"))
      val nUsers = baskets.select(col("user_id")).distinct()
        .agg(count(lit(1)).as("nu"))
      pairs
        .join(broadcast(ic.toDF("item_a", "na")), Seq("item_a"))
        .join(broadcast(ic.toDF("item_b", "nb")), Seq("item_b"))
        .crossJoin(broadcast(nUsers))
        .select(col("item_a"), col("item_b"), col("nab"),
          round(col("nab") / col("nu"), 6).as("support"),
          round(col("nab") / col("na"), 6).as("conf_ab"),
          round((col("nab") * col("nu")) / (col("na") * col("nb")), 6)
            .as("lift"))
        .orderBy(col("item_a"), col("item_b"))
    }),

    // Time-series gap fill + trailing window: per-day counts left-joined
    // onto a generated day spine (missing days become explicit zeros —
    // a trailing mean over sparse rows would silently skip them), then a
    // 7-day trailing mean over the FILLED spine. The spine explodes from
    // a one-row (min,max) aggregate — thousands of rows for years of
    // data, so the global-ordered window is a non-issue at any corpus
    // scale; the per-day rollup is the only real shuffle.
    // Distribution-rank window trio (r7) — the §2.9 surface q07/q23's
    // rank suite didn't cover: ntile(4) quartile assignment,
    // percent_rank, cume_dist over per-user purchase spend. The order
    // key (exact cents, user_id) is a TOTAL order, so all three are
    // tie-free and engine-identical; the two ratios are single
    // divisions of exact integers, round-6. Top-10 spenders only —
    // the rank window is the wide stage, the output is O(10).
    "q329_rank_distribution" -> ((s, d) => {
      val u = table(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("spend"))
      val w = Window.orderBy(col("spend"), col("user_id"))
      u.withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pr6", graft.Graft.roundz(percent_rank().over(w), 6))
        .withColumn("cd6", graft.Graft.roundz(cume_dist().over(w), 6))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("spend").desc, col("user_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("rk"), col("user_id"), col("spend"),
          col("quartile"), col("pr6"), col("cd6"))
        .orderBy(col("rk"))
    }),

    "q116_gap_fill" -> ((s, d) => {
      val daily = events(s, d)
        // a sparse slice (one cohort's purchases) so the spine really
        // fills gaps at every SF — a dense slice would never exercise
        // the zero rows
        .filter(col("user_id") <= 2 && col("event_type") === "purchase")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("value_cents"))
      val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val filled = spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("value_cents"), lit(0L)).as("value_cents"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
      filled
        .withColumn("avg7",
          round(sum(col("n")).over(w) * 1.0 / count(lit(1)).over(w), 4))
        .orderBy(col("day"))
    }),

    // Weighted PageRank over the event-transition graph (ext.Graph):
    // nodes = the numeric props attribute, edges = consecutive-event
    // transitions per user, 3 damped power-iteration rounds with
    // dangling redistribution. Every round re-rounds to 12 dp so float
    // summation-order drift can't compound — DuckDB recomputes the
    // identical ladder as chained CTEs.
    "q113_pagerank" -> ((s, d) => {
      val ev = events(s, d)
      // order by integer MICROS (+ event_id tiebreak), exactly the
      // oracle's epoch_us precision
      val edges = graft.ext.Graph.transitionEdges(ev, col("user_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long"),
        unix_micros(col("ts")), col("event_id"))
      graft.ext.Graph.pageRank(edges, "src", "dst", "w", iters = 3)
        .select(col("id"), round(col("r"), 8).as("rank8"))
        .orderBy(col("id"))
    }),

    // Personalized PageRank (r7): q113's transition graph, but restart
    // mass returns to a seed TOPIC set (nodes ≡ 0 mod 5) — rank
    // concentrates in the seeds' graph neighborhood, the proximity
    // scorer behind seed-based curation. 2 damped rounds, round-12
    // between rounds, dangling mass to the seeds; oracle replays the
    // identical ladder as chained CTEs with the seed indicator carried
    // through (q113's unrolled pattern).
    "q322_ppr" -> ((s, d) => {
      val ev = events(s, d)
      // checkpoint the transition edges ONCE: both the seed derivation
      // and the PPR ladder reference them, and without the cut the
      // events scan + lag window + groupBy replays per reference (r13,
      // guide §5/§7.2 — the same cut personalizedPageRank makes
      // internally for its own edge references)
      val edges = graft.ext.Graph.transitionEdges(ev, col("user_id"),
        regexp_extract(col("props"), "[0-9]+", 0).cast("long"),
        unix_micros(col("ts")), col("event_id"))
        .localCheckpoint(true)
      val seeds = edges.select(col("src").as("id"))
        .union(edges.select(col("dst")))
        .filter(pmod(col("id"), lit(5)) === 0).distinct()
      // Precut variant (r14, ADVICE-r13): the frame above is already
      // checkpointed — the public entry would copy it into the block
      // manager a second time for the query's lifetime
      graft.ext.Graph.personalizedPageRankPrecut(edges,
          seeds, "id", iters = 2)
        .select(col("id"), round(col("r"), 8).as("rank8"))
        .orderBy(col("id"))
    }),

    // Robust ingestion-rate anomaly screen: daily event counts flagged
    // by median/MAD (|n − med| > 3·MAD) — the outlier rule that one bad
    // day can't skew, unlike mean/stddev. Exact interpolated
    // percentile on BOTH sides (Spark `percentile` ≡ DuckDB
    // quantile_cont); med and MAD ride as one-row broadcasts (q46's
    // scalar class). The day rollup is the only real shuffle — the
    // medians run over O(days) rows, which is why exact percentile is
    // affordable here even at 100 TB of events (the q66 sketch is for
    // percentiles over ROWS, not days).
    "q169_rate_anomaly" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily.agg(expr("percentile(n, 0.5D)").as("med"))
      val withMed = daily.crossJoin(broadcast(med))
      val mad = withMed
        .agg(expr("percentile(abs(n - med), 0.5D)").as("mad"))
      withMed.crossJoin(broadcast(mad))
        .select(col("day"), col("n"),
          graft.Graft.roundz(abs(col("n") - col("med")), 6).as("dev6"),
          (abs(col("n") - col("med")) > col("mad") * 3).as("is_anomaly"))
        .orderBy(col("day"))
    }),

    // Weekly quantile drift — the distribution-monitoring rollup that
    // catches a metric's shape moving before its mean does: exact
    // p50/p90 per week (percentile ≡ quantile_cont, the q58/q169
    // parity) plus week-over-week deltas via lag. One week-keyed
    // rollup is the only event-volume shuffle; the lag window runs
    // over O(weeks) rows. Deltas go through roundz — a flat week can
    // produce −0.0 on one engine (the q101 signed-zero class).
    "q198_quantile_drift" -> ((s, d) => {
      val weekly = events(s, d)
        .groupBy(expr("unix_micros(ts) div 604800000000").as("week"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(value, 0.5D)").as("p50"),
          expr("percentile(value, 0.9D)").as("p90"))
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("week"))
      weekly
        .withColumn("d50", col("p50") - lag(col("p50"), 1).over(w))
        .withColumn("d90", col("p90") - lag(col("p90"), 1).over(w))
        .select(col("week"), col("n"),
          graft.Graft.roundz(col("p50"), 6).as("p50_6"),
          graft.Graft.roundz(col("p90"), 6).as("p90_6"),
          graft.Graft.roundz(col("d50"), 6).as("d50_6"),
          graft.Graft.roundz(col("d90"), 6).as("d90_6"))
        .orderBy(col("week"))
    }),

    // Statistical aggregate suite (A4 completion): the estimator
    // aggregates a metrics layer leans on — sample stddev, population
    // variance, exact median, exact interpolated p90, Pearson
    // correlation and population covariance of value against event
    // time. All are single-pass mergeable moment aggregates (map-side
    // combined partials at any scale); floats rounded to 6 with the
    // signed-zero guard since co-moment accumulation order differs
    // across engines by last-ulp amounts. skewness/kurtosis are
    // deliberately ABSENT: Spark computes population form, DuckDB
    // sample-corrected — no shared spelling exists to oracle.
    "q191_stat_suite" -> ((s, d) => {
      // time in SECONDS, not µs: covariance carries time's units, and
      // at µs scale the statistic (~1e11) dwarfs its own float noise —
      // no rounding precision is simultaneously meaningful and stable
      val base = events(s, d)
        .select(col("event_type"), col("value"),
          (unix_micros(col("ts")).cast("double") / 1000000.0).as("us"))
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.Graft.roundz(stddev_samp(col("value")), 6).as("sd6"),
          graft.Graft.roundz(var_pop(col("value")), 6).as("vp6"),
          graft.Graft.roundz(expr("median(value)"), 6).as("med6"),
          graft.Graft.roundz(expr("percentile(value, 0.9D)"), 6).as("p90_6"),
          graft.Graft.roundz(corr(col("value"), col("us")), 6).as("corr6"),
          graft.Graft.roundz(covar_pop(col("value"), col("us")), 2).as("cov2"))
        .orderBy(col("event_type"))
    }),

    // Sequence-pattern mining (MATCH_RECOGNIZE-lite): each user's event
    // history collapses to a string of type initials under the total
    // (us, event_id) order, and behavioral patterns become regexes —
    // 'cv*p' = click, any views, then purchase (conversion path);
    // 'ep' = purchase immediately after an error (recovery). One
    // user-keyed shuffle builds the strings (bounded by per-user event
    // counts — the sessionize partitioning); the regex scan is a
    // narrow codegen'd projection. Both engines use leftmost
    // non-overlapping matching, so the counts are engine-identical.
    "q186_event_pattern" -> ((s, d) => {
      val seqs = events(s, d)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c")).as("x"))
        .groupBy(col("user_id"))
        .agg(array_join(
          transform(array_sort(collect_list(col("x"))), x => x.getField("c")),
          "").as("seq"))
      seqs.select(col("user_id"),
          length(col("seq")).cast("long").as("seq_len"),
          regexp_count(col("seq"), lit("cv*p")).cast("long").as("n_conversion"),
          regexp_count(col("seq"), lit("ep")).cast("long").as("n_err_recovery"))
        .orderBy(col("user_id"))
    }),

    // Exponentially-weighted moving average of daily event rates per
    // type (α = 0.25 — an exact binary float, so every step is
    // bit-portable): e₁ = x₁, eₜ = α·xₜ + (1−α)·eₜ₋₁ over OBSERVED days
    // in chronological order (gap-fill is q116's job; composing them
    // densifies first). The recurrence is inherently sequential per
    // key, so it runs as ONE doc-keyed fold: daily rollup (the only
    // real shuffle, map-side combined), collect+sort the per-type day
    // series — bounded by the calendar, ~365 rows/key/year, NOT by
    // event volume — then an indexed-lambda fold emits the whole
    // smoothed series in one pass. DuckDB replays it as a recursive
    // CTE stepping rank-by-rank; identical op order → identical floats.
    "q175_ewma_rate" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val folded = daily
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("xs"))
        .select(col("event_type"),
          explode(aggregate(col("xs"),
            array().cast("array<struct<day:bigint,n:bigint,e:double>>"),
            (acc, x) => concat(acc, array(struct(
              x.getField("day").as("day"), x.getField("n").as("n"),
              when(size(acc) === 0, x.getField("n").cast("double"))
                .otherwise(lit(0.25) * x.getField("n") +
                  lit(0.75) * element_at(acc, -1).getField("e")).as("e"))))))
            .as("r"))
      folded.select(col("event_type"), col("r.day").as("day"),
          col("r.n").as("n"), graft.Graft.roundz(col("r.e"), 6).as("ewma6"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Interval-union coverage: each event opens a value-proportional
    // interval [ts, ts + cents·1s); per user, merge overlapping
    // intervals (islands over the running max end — the interval form
    // of q21's gap sessionization) and report merged-island count and
    // total covered microseconds. Classic "actual busy time" dedup —
    // naive sum(duration) double-counts overlaps. Exact integer µs.
    "q231_interval_union" -> ((s, d) => {
      val order = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("end_us", col("us") + cents(col("value")) * 1000000L)
        .withColumn("prev_end",
          max(col("end_us")).over(order
            .rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("is_new",
          when(col("prev_end").isNull || col("us") > col("prev_end"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("is_new")).over(order
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("island"))
        .agg(min(col("us")).as("s0"), max(col("end_us")).as("e0"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("e0") - col("s0")).as("covered_us"))
        .orderBy(col("user_id"))
    }),

    // Holt linear (double-exponential) smoothing of the daily
    // event-type volume: level l = α·y + (1−α)(l+b), trend
    // b = β·(l−l_prev) + (1−β)·b_prev — the trend-aware sibling of
    // q175's EWMA, same one-pass indexed fold over the sorted daily
    // series; DuckDB replays the recurrence rank-by-rank (identical op
    // order → identical floats, l_new spelled once per side and reused
    // in the trend update by literal repetition of the expression).
    "q233_holt_linear" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      def lNew(x: org.apache.spark.sql.Column, prev: org.apache.spark.sql.Column) =
        lit(0.3) * x.getField("n") +
          lit(0.7) * (prev.getField("l") + prev.getField("b"))
      val folded = daily
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(struct(col("day"), col("n")))).as("xs"))
        .select(col("event_type"),
          explode(aggregate(col("xs"),
            array().cast("array<struct<day:bigint,n:bigint,l:double,b:double>>"),
            (acc, x) => {
              val prev = element_at(acc, -1)
              concat(acc, array(struct(
                x.getField("day").as("day"), x.getField("n").as("n"),
                when(size(acc) === 0, x.getField("n").cast("double"))
                  .otherwise(lNew(x, prev)).as("l"),
                when(size(acc) === 0, lit(0.0))
                  .otherwise(lit(0.2) * (lNew(x, prev) - prev.getField("l")) +
                    lit(0.8) * prev.getField("b")).as("b"))))
            })).as("r"))
      folded.select(col("event_type"), col("r.day").as("day"),
          col("r.n").as("n"), graft.Graft.roundz(col("r.l"), 6).as("level6"),
          graft.Graft.roundz(col("r.b"), 6).as("trend6"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Purged time-series split with embargo (the leakage-safe CV for
    // temporally-autocorrelated data, López de Prado's purged K-fold):
    // 5 equal time-ordered folds (ntile on the (us, event_id) total
    // order), fold 2 is the test block, and TRAIN rows inside a 7-day
    // embargo of the test block's span are PURGED — they'd leak
    // near-boundary information. One global sort for the fold spine
    // (at 100 TB: range-partition on precomputed time quantiles
    // instead), one broadcast scalar for the test-span bounds.
    "q234_purged_time_split" -> ((s, d) => {
      val w = Window.orderBy(col("us"), col("event_id"))
      val ev = events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("fold", ntile(5).over(w))
      val bounds = ev.filter(col("fold") === 2)
        .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      val emb = 7L * 86400L * 1000000L
      ev.crossJoin(broadcast(bounds))
        .select(col("event_id"),
          when(col("fold") === 2, "test")
            .when(col("us") >= col("lo") - emb &&
              col("us") <= col("hi") + emb, "purged")
            .otherwise("train").as("role"))
        .orderBy(col("event_id"))
    }),

    // Last-touch attribution: each purchase credits the user's most
    // recent preceding click within 7 days (forward-carry of the last
    // click over the strictly-preceding frame — q219's pattern with an
    // exclusive upper bound), then revenue rolls up per click. The
    // marketing-analytics operator the as-of join family serves;
    // one user-keyed window shuffle + one keyed aggregate.
    "q237_attribution" -> ((s, d) => {
      val prior = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val emb = 7L * 86400L * 1000000L
      events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(prior))
        .withColumn("click_us",
          last(when(col("event_type") === "click", col("us")),
            ignoreNulls = true).over(prior))
        .filter(col("event_type") === "purchase" &&
          col("click_id").isNotNull && col("us") - col("click_us") <= emb)
        .groupBy(col("click_id"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(cents(col("value"))).as("attributed_cents"))
        .orderBy(col("click_id"))
    }),

    // Quantile normalization: map each event-type's value distribution
    // onto the POOLED distribution by relative rank (batch-effect
    // correction — microarray lineage, same trick for calibrating
    // per-source quality scores before a global threshold). Pure
    // integer rank arithmetic: group rank r of g_n maps to pooled
    // position ceil(r·pool_n/g_n), one equi-join on the position.
    // Window counts (COUNT OVER) instead of scalar cross-joins.
    "q240_quantile_normalize" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("c"))
      val pool = ev
        .withColumn("pr", row_number().over(
          Window.orderBy(col("c"), col("event_id"))))
        .select(col("pr"), col("c").as("norm_cents"))
      val g = ev
        .withColumn("r", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("c"), col("event_id"))))
        .withColumn("gn", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .withColumn("pn", count(lit(1)).over(
          Window.partitionBy()))
        .withColumn("pr", expr("(r * pn + gn - 1) div gn"))
      g.join(pool, Seq("pr"))
        .select(col("event_id"), col("c").as("cents"), col("norm_cents"))
        .orderBy(col("event_id"))
    }),

    // Sliding exact median: `percentile(c, 0.5)` as a WINDOW aggregate
    // over the trailing 7-row frame — exact rolling median per user
    // (robust smoother; the window-frame twin of q66's global
    // quantiles). Interpolated midpoints are .5-exact doubles on both
    // engines (DuckDB `median` interpolates identically).
    "q242_sliding_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("med",
          expr("percentile(cast(round(value*100) as bigint), 0.5D)")
            .over(w))
        .select(col("event_id"), col("user_id"), col("med"))
        .orderBy(col("event_id"))
    }),

    // Time-weighted average (TWAP): each observation holds until the
    // next one, so its weight is the gap to the successor (`lead`);
    // the last observation carries no weight. Σc·dt and Σdt stay exact
    // BIGINT, one division — the uniform mean over-weights bursts,
    // TWAP is the honest "average held value" (financial lineage).
    "q244_twap" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val ev = events(s, d)
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("c", cents(col("value")))
        .withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("dt").isNotNull)
      ev.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_weighted"),
          sum(col("dt")).as("span_us"),
          graft.Graft.roundz(sum(col("c") * col("dt")).cast("double") /
            sum(col("dt")), 6).as("twap6"))
        .orderBy(col("user_id"))
    }),

    // Rolling Pearson correlation between the daily click and purchase
    // volumes over a trailing 14-day window: all six window sums are
    // exact integers, the correlation is one closed-form double both
    // engines spell identically; degenerate windows (zero variance)
    // yield NULL on both sides.
    "q245_rolling_corr" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val w = Window.orderBy(col("day")).rowsBetween(-13, Window.currentRow)
      val sums = daily
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("syy", sum(col("y") * col("y")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
      sums.select(col("day"), col("x"), col("y"),
          graft.Graft.roundz(
            when((col("n") * col("sxx") - col("sx") * col("sx")) *
                 (col("n") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
                / sqrt(((col("n") * col("sxx") - col("sx") * col("sx")) *
                   (col("n") * col("syy") - col("sy") * col("sy")))
                  .cast("double"))), 6).as("corr6"))
        .orderBy(col("day"))
    }),

    // Winsorization at the exact per-group p05/p95 rank positions:
    // thresholds are the group-sorted values at ceil(0.05n)/ceil(0.95n)
    // (pure integer positions — no interpolation, no float quantiles),
    // values clip to [lo, hi]. The robust-preprocessing twin of q66's
    // approximate quantiles: at 100 TB you'd swap the rank window for
    // the sketch, same clip join.
    "q246_winsorize" -> ((s, d) => {
      val wg = Window.partitionBy(col("event_type"))
        .orderBy(col("c"), col("event_id"))
      val ranked = events(s, d)
        .select(col("event_id"), col("event_type"),
          cents(col("value")).as("c"))
        .withColumn("r", row_number().over(wg))
        .withColumn("gn", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val thr = ranked
        .filter(col("r") === expr("(gn * 5 + 99) div 100") ||
          col("r") === expr("(gn * 95 + 99) div 100"))
        .groupBy(col("event_type"))
        .agg(min(col("c")).as("lo"), max(col("c")).as("hi"))
      ranked.join(thr, Seq("event_type"))
        .select(col("event_id"), col("c").as("cents"),
          least(greatest(col("c"), col("lo")), col("hi"))
            .as("winsorized_cents"))
        .orderBy(col("event_id"))
    }),

    // New-vs-returning cohort curve: per day, users seen for the FIRST
    // time vs returning actives, plus the cumulative distinct-user
    // count (= cumsum of new — no distinct-over-window needed). Two
    // keyed aggregates + one ordered cumsum, exact integers.
    "q254_new_vs_returning" -> ((s, d) => {
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val first = days.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      val perDay = days.join(first, Seq("user_id"))
        .groupBy(col("day"))
        .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("new_users"),
          sum(when(col("day") =!= col("first_day"), 1L).otherwise(0L))
            .as("returning_users"))
      perDay
        .withColumn("cum_users", sum(col("new_users")).over(
          Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy(col("day"))
    }),

    // Lead-lag analysis: Pearson correlation between daily clicks and
    // purchases shifted by lag ∈ [−3, 3] — "does today's click volume
    // predict purchases L days out?". The click side expands ×7 lags
    // (an equi-join on the shifted day, no product), six exact-integer
    // sums per lag, one closed-form double.
    "q256_lead_lag" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        .localCheckpoint(true) // expanded side AND join target
      val shifted = daily.select(col("day"), col("x"))
        .withColumn("lag", explode(sequence(lit(-3L), lit(3L))))
        .withColumn("jday", col("day") + col("lag"))
      val joined = shifted.join(
        daily.select(col("day").as("jday"), col("y")), Seq("jday"))
      joined.groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"), sum(col("x") * col("y")).as("sxy"))
        .select(col("lag"), col("n_days"),
          graft.Graft.roundz(
            when((col("n_days") * col("sxx") - col("sx") * col("sx")) *
                 (col("n_days") * col("syy") - col("sy") * col("sy")) > 0,
              (col("n_days") * col("sxy") - col("sx") * col("sy"))
                .cast("double") /
                sqrt(((col("n_days") * col("sxx") - col("sx") * col("sx")) *
                  (col("n_days") * col("syy") - col("sy") * col("sy")))
                  .cast("double"))), 6).as("corr6"))
        .orderBy(col("lag"))
    }),

    // Additive seasonal decomposition of the daily event volume
    // (STL-lite): trend = centered 7-day moving average, seasonal =
    // weekday mean (epoch-day mod 7 — calendar-free) re-centered by
    // the grand mean, residual = n − trend − seasonal. Every mean
    // divides exact integer sums once; components re-add to n up to
    // the shared double spelling.
    "q260_seasonal_decompose" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val wAll = Window.partitionBy()
      val wWd = Window.partitionBy(col("wd"))
      val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val g = daily
        .withColumn("wd", col("day") % 7)
        .withColumn("grand",
          sum(col("n")).over(wAll).cast("double") /
            count(lit(1)).over(wAll))
        .withColumn("wmean",
          sum(col("n")).over(wWd).cast("double") /
            count(lit(1)).over(wWd))
        .withColumn("trend",
          sum(col("n")).over(wMa).cast("double") /
            count(lit(1)).over(wMa))
        .withColumn("seasonal", col("wmean") - col("grand"))
      g.select(col("day"), col("n"),
          graft.Graft.roundz(col("trend"), 6).as("trend6"),
          graft.Graft.roundz(col("seasonal"), 6).as("seasonal6"),
          graft.Graft.roundz(
            col("n") - col("trend") - col("seasonal"), 6).as("resid6"))
        .orderBy(col("day"))
    }),

    // Day-over-day audience overlap: Jaccard between consecutive days'
    // DISTINCT user sets — the audience-stability/churn pulse.
    // |A∩B| from an equi-join on (user, day+1), |A∪B| = |A|+|B|−|A∩B|,
    // exact integers, one division.
    "q262_audience_overlap" -> ((s, d) => {
      val du = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
        .localCheckpoint(true) // both sides of the shifted self-join
      val sizes = du.groupBy(col("day")).agg(count(lit(1)).as("nu"))
      val inter = du.select(col("user_id"), (col("day") + 1).as("day"))
        .join(du, Seq("user_id", "day"))
        .groupBy(col("day")).agg(count(lit(1)).as("ni"))
      sizes.select(col("day"), col("nu"))
        .join(sizes.select((col("day") + 1).as("day"),
          col("nu").as("prev_nu")), Seq("day"))
        .join(inter, Seq("day"), "left")
        .withColumn("ni", coalesce(col("ni"), lit(0L)))
        .select(col("day"), col("prev_nu"), col("nu"), col("ni"),
          graft.Graft.roundz(col("ni").cast("double") /
            (col("prev_nu") + col("nu") - col("ni")), 6).as("jaccard6"))
        .orderBy(col("day"))
    }))

  val oracles: Map[String, String] = Map(
    "q329_rank_distribution" ->
      """WITH u AS (
           SELECT user_id,
             CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
               AS spend
           FROM events WHERE event_type = 'purchase'
           GROUP BY user_id),
         r AS (
           SELECT user_id, spend,
             CAST(ntile(4) OVER (ORDER BY spend, user_id) AS BIGINT)
               AS quartile,
             round(percent_rank() OVER (ORDER BY spend, user_id), 6)
               + 0.0 AS pr6,
             round(cume_dist() OVER (ORDER BY spend, user_id), 6)
               + 0.0 AS cd6,
             CAST(ROW_NUMBER() OVER (ORDER BY spend DESC, user_id)
               AS BIGINT) AS rk
           FROM u)
         SELECT rk, user_id, spend, quartile, pr6, cd6
         FROM r WHERE rk <= 10 ORDER BY rk""",
    // IGNORE NULLS carry over the same (ts, event_id) total order
    "q219_forward_fill" ->
      """SELECT event_id, user_id, epoch_us(ts) AS us,
         last_value(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value*100) AS BIGINT) END
                    IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS filled_cents
         FROM events WHERE user_id <= 40
         ORDER BY user_id, us, event_id""",
    "q19_lastwins_dedup" ->
      """SELECT user_id, event_type AS last_type,
         CAST(round(value*100) AS BIGINT) AS last_value_cents
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events) t
         WHERE rn = 1 ORDER BY user_id""",
    "q21_sessionize" ->
      """WITH g AS (
           SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
           FROM events),
         m AS (
           SELECT user_id,
             CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM g)
         SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
         FROM m GROUP BY user_id ORDER BY user_id""",
    "q22_session_window" ->
      """WITH g AS (
           SELECT user_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sess
           FROM g)
         SELECT user_id, CAST(MIN(us) AS BIGINT) AS session_start_us,
           COUNT(*) AS n_events
         FROM m GROUP BY user_id, sess ORDER BY user_id, session_start_us""",
    "q23_moving_sum" ->
      """SELECT event_id, user_id,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents
         FROM events ORDER BY event_id""",
    "q61_range_frame" ->
      """SELECT event_id, user_id,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS w_cents
         FROM events ORDER BY event_id""",
    "q24_pivot" ->
      """SELECT user_id,
         CAST(SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
         CAST(SUM(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
         CAST(SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
         CAST(SUM(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
         CAST(SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS view
         FROM events GROUP BY user_id ORDER BY user_id""",
    "q25_regex_extract" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events WHERE regexp_matches(props, '"k": \d+')
         GROUP BY k ORDER BY k""",
    "q26_lag_lead" ->
      """SELECT event_id, user_id, CAST(us - prev_us AS BIGINT) AS gap_us, next_type
         FROM (SELECT event_id, user_id, epoch_us(ts) AS us,
                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us,
                 lead(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS next_type
               FROM events) t
         WHERE prev_us IS NOT NULL AND next_type IS NOT NULL
         ORDER BY event_id""",
    // TRY_CAST mirrors try_cast; the guarded division mirrors
    // try_divide's NULL-on-zero
    "q151_try_arithmetic" ->
      """WITH t AS (
           SELECT event_type,
             TRY_CAST(CASE WHEN event_id % 7 = 0
               THEN regexp_extract(props, '([0-9]+)', 1) || 'x'
               ELSE regexp_extract(props, '([0-9]+)', 1) END
               AS BIGINT) AS k
           FROM events)
         SELECT event_type,
           CAST(COUNT(k) AS BIGINT) AS n_parsed,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_failed,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           round(SUM(CASE WHEN k = 0 THEN NULL ELSE 100.0 / k END), 6)
             AS sum_ratio
         FROM t GROUP BY event_type ORDER BY event_type""",
    // canonical JSON rebuilt with the same key ordering
    "q150_feature_map" ->
      """WITH c AS (
           SELECT user_id, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2)
         SELECT user_id,
           '{' || string_agg('"' || event_type || '":' || n, ','
             ORDER BY event_type) || '}' AS counts_json,
           CAST(SUM(n) AS BIGINT) AS n_events
         FROM c GROUP BY user_id ORDER BY user_id""",
    // the bitmap-merged trailing distinct must equal the naive
    // re-scan-the-window COUNT(DISTINCT)
    "q134_sliding_distinct" ->
      """WITH e AS (SELECT epoch_us(ts) // 3600000000 AS hour, user_id
           FROM events),
         h AS (SELECT DISTINCT hour FROM e)
         SELECT h.hour,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM e
            WHERE e.hour BETWEEN h.hour - 5 AND h.hour)
             AS distinct_users_6h
         FROM h ORDER BY h.hour""",
    // identical pair construction + per-state rollup; the probability
    // is one division of the same integers
    "q128_markov_transitions" ->
      """WITH pairs AS (
           SELECT event_type AS cur,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY epoch_us(ts), event_id) AS nxt
           FROM events),
         cnt AS (
           SELECT cur, nxt, COUNT(*) AS n FROM pairs
           WHERE nxt IS NOT NULL GROUP BY cur, nxt)
         SELECT cur, nxt, n,
           round(n * 1.0 / SUM(n) OVER (PARTITION BY cur), 6) AS p
         FROM cnt ORDER BY cur, nxt""",
    "q110_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS t FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS t FROM events e
           JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.t GROUP BY e.user_id),
         n AS (
           SELECT 0 AS stage_idx, 'view' AS stage,
                  (SELECT COUNT(*) FROM v) AS n_users
           UNION ALL SELECT 1, 'click', (SELECT COUNT(*) FROM c)
           UNION ALL SELECT 2, 'purchase', (SELECT COUNT(*) FROM p))
         SELECT stage_idx, stage, n_users,
           round(CAST(n_users AS DOUBLE) /
             lag(n_users) OVER (ORDER BY stage_idx), 4) AS conv
         FROM n ORDER BY stage_idx""",
    "q111_retention" ->
      """WITH a AS (
           SELECT DISTINCT user_id,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS d
           FROM events),
         coh AS (SELECT user_id, min(d) AS cd FROM a GROUP BY user_id),
         j AS (
           SELECT a.user_id, coh.cd, a.d - coh.cd AS off
           FROM a JOIN coh ON a.user_id = coh.user_id),
         pu AS (
           SELECT user_id, cd,
             max(CASE WHEN off = 1 THEN 1 ELSE 0 END) AS h1,
             max(CASE WHEN off = 7 THEN 1 ELSE 0 END) AS h7
           FROM j GROUP BY user_id, cd)
         SELECT cd AS cohort_day, COUNT(*) AS n_users,
           CAST(SUM(h1) AS BIGINT) AS n_off_1,
           CAST(SUM(h7) AS BIGINT) AS n_off_7
         FROM pu GROUP BY cd ORDER BY cohort_day""",
    // same basket derivation; each metric spelled with the identical
    // integer-product-then-divide op order
    "q121_assoc_rules" ->
      """WITH baskets AS (
           SELECT DISTINCT user_id, event_type AS item FROM events),
         pairs AS (
           SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS nab
           FROM baskets a JOIN baskets b ON a.user_id = b.user_id
           WHERE a.item < b.item GROUP BY 1, 2),
         ic AS (SELECT item, COUNT(*) AS ni FROM baskets GROUP BY 1),
         nu AS (SELECT COUNT(DISTINCT user_id) AS nu FROM baskets)
         SELECT p.item_a, p.item_b, p.nab,
           round(p.nab / nu.nu, 6) AS support,
           round(p.nab / ia.ni, 6) AS conf_ab,
           round((p.nab * nu.nu) / (ia.ni * ib.ni), 6) AS lift
         FROM pairs p
         JOIN ic ia ON p.item_a = ia.item
         JOIN ic ib ON p.item_b = ib.item
         CROSS JOIN nu
         ORDER BY item_a, item_b""",
    // identical day rollup + interpolated medians (quantile_cont ≡
    // Spark percentile) + the same 3·MAD rule
    // same exact quantiles + lag deltas; epoch_ns floor mirrors the
    // events-ts convention
    "q198_quantile_drift" ->
      """WITH wk AS (
           SELECT CAST(epoch_ns(ts) // 604800000000000 AS BIGINT) AS week,
             COUNT(*) AS n,
             quantile_cont(value, 0.5) AS p50,
             quantile_cont(value, 0.9) AS p90
           FROM events GROUP BY 1),
         d AS (
           SELECT week, n, p50, p90,
             p50 - lag(p50) OVER (ORDER BY week) AS d50,
             p90 - lag(p90) OVER (ORDER BY week) AS d90
           FROM wk)
         SELECT week, n, round(p50, 6) + 0.0 AS p50_6,
           round(p90, 6) + 0.0 AS p90_6,
           round(d50, 6) + 0.0 AS d50_6, round(d90, 6) + 0.0 AS d90_6
         FROM d ORDER BY week""",
    // same single-pass estimators; DuckDB var_pop/stddev_samp/median/
    // quantile_cont/corr/covar_pop share Spark's definitions exactly
    "q191_stat_suite" ->
      """SELECT event_type, COUNT(*) AS n,
           round(stddev_samp(value), 6) + 0.0 AS sd6,
           round(var_pop(value), 6) + 0.0 AS vp6,
           round(median(value), 6) + 0.0 AS med6,
           round(quantile_cont(value, 0.9), 6) + 0.0 AS p90_6,
           round(corr(value, CAST(epoch_us(ts) AS DOUBLE) / 1000000), 6)
             + 0.0 AS corr6,
           round(covar_pop(value, CAST(epoch_us(ts) AS DOUBLE) / 1000000), 2)
             + 0.0 AS cov2
         FROM events GROUP BY event_type ORDER BY event_type""",
    // same total (us, event_id) order into string_agg; DuckDB counts
    // matches via regexp_extract_all (leftmost non-overlapping, same
    // as Spark's regexp_count)
    "q186_event_pattern" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
             substr(event_type, 1, 1) AS c
           FROM events),
         s AS (
           SELECT user_id,
             string_agg(c, '' ORDER BY us, event_id) AS seq
           FROM e GROUP BY user_id)
         SELECT user_id, CAST(len(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'cv*p')) AS BIGINT)
             AS n_conversion,
           CAST(len(regexp_extract_all(seq, 'ep')) AS BIGINT)
             AS n_err_recovery
         FROM s ORDER BY user_id""",
    // the EWMA recurrence replayed rank-by-rank as a recursive CTE;
    // α spelled CAST(0.25 AS DOUBLE) so DuckDB's decimal literals
    // don't change the arithmetic type
    "q175_ewma_rate" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rk
           FROM daily),
         e AS (
           SELECT event_type, day, n, rk, CAST(n AS DOUBLE) AS ew
           FROM r WHERE rk = 1
           UNION ALL
           SELECT r.event_type, r.day, r.n, r.rk,
             CAST(0.25 AS DOUBLE) * r.n + CAST(0.75 AS DOUBLE) * e.ew
           FROM r JOIN e ON r.event_type = e.event_type
                        AND r.rk = e.rk + 1)
         SELECT event_type, day, CAST(n AS BIGINT) AS n,
           round(ew, 6) + 0.0 AS ewma6
         FROM e ORDER BY event_type, day""",
    // running-max-end islands in exact µs, then two aggregates
    "q231_interval_union" ->
      """WITH iv AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) + CAST(round(value*100) AS BIGINT) * 1000000
               AS end_us
           FROM events),
         m AS (
           SELECT user_id, event_id, us, end_us,
             MAX(end_us) OVER (PARTITION BY user_id
               ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
           FROM iv),
         f AS (
           SELECT user_id, event_id, us, end_us,
             CASE WHEN prev_end IS NULL OR us > prev_end
                  THEN 1 ELSE 0 END AS is_new
           FROM m),
         g AS (
           SELECT user_id, us, end_us,
             SUM(is_new) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS island
           FROM f),
         i AS (
           SELECT user_id, island, MIN(us) AS s0, MAX(end_us) AS e0
           FROM g GROUP BY user_id, island)
         SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(e0 - s0) AS BIGINT) AS covered_us
         FROM i GROUP BY user_id ORDER BY user_id""",
    // the Holt recurrence replayed rank-by-rank; l_new repeated
    // literally inside the trend update (same double both sides)
    "q233_holt_linear" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, day, n,
             row_number() OVER (PARTITION BY event_type ORDER BY day)
               AS rk
           FROM daily),
         h AS (
           SELECT event_type, day, n, rk, CAST(n AS DOUBLE) AS l,
             CAST(0.0 AS DOUBLE) AS b
           FROM r WHERE rk = 1
           UNION ALL
           SELECT r.event_type, r.day, r.n, r.rk,
             CAST(0.3 AS DOUBLE) * r.n
               + CAST(0.7 AS DOUBLE) * (h.l + h.b),
             CAST(0.2 AS DOUBLE) * ((CAST(0.3 AS DOUBLE) * r.n
               + CAST(0.7 AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST(0.8 AS DOUBLE) * h.b
           FROM r JOIN h ON r.event_type = h.event_type
                        AND r.rk = h.rk + 1)
         SELECT event_type, day, CAST(n AS BIGINT) AS n,
           round(l, 6) + 0.0 AS level6, round(b, 6) + 0.0 AS trend6
         FROM h ORDER BY event_type, day""",
    "q234_purged_time_split" ->
      """WITH f AS (
           SELECT event_id, epoch_us(ts) AS us,
             ntile(5) OVER (ORDER BY epoch_us(ts), event_id) AS fold
           FROM events),
         b AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM f WHERE fold = 2)
         SELECT event_id,
           CASE WHEN fold = 2 THEN 'test'
                WHEN us >= b.lo - 604800000000 AND us <= b.hi + 604800000000
                  THEN 'purged'
                ELSE 'train' END AS role
         FROM f, b ORDER BY event_id""",
    "q237_attribution" ->
      """WITH c AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CAST(round(value*100) AS BIGINT) AS cents,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
               IGNORE NULLS) OVER w AS click_id,
             last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
               IGNORE NULLS) OVER w AS click_us
           FROM events
           WINDOW w AS (PARTITION BY user_id
             ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT click_id, COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS attributed_cents
         FROM c
         WHERE event_type = 'purchase' AND click_id IS NOT NULL
           AND us - click_us <= 604800000000
         GROUP BY click_id ORDER BY click_id""",
    "q240_quantile_normalize" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(round(value*100) AS BIGINT) AS c
           FROM events),
         pool AS (
           SELECT ROW_NUMBER() OVER (ORDER BY c, event_id) AS pr,
             c AS norm_cents
           FROM ev),
         g AS (
           SELECT event_id, c,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY c, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS gn,
             COUNT(*) OVER () AS pn
           FROM ev),
         j AS (
           SELECT event_id, c, (r * pn + gn - 1) // gn AS pr FROM g)
         SELECT j.event_id, j.c AS cents, p.norm_cents
         FROM j JOIN pool p ON p.pr = j.pr
         ORDER BY j.event_id""",
    "q242_sliding_median" ->
      """SELECT event_id, user_id,
         median(CAST(round(value*100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med
         FROM events ORDER BY event_id""",
    "q244_twap" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             CAST(round(value*100) AS BIGINT) AS c
           FROM events),
         l AS (
           SELECT user_id, c,
             lead(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) - us AS dt
           FROM e)
         SELECT user_id, COUNT(*) AS n_weighted,
           CAST(SUM(dt) AS BIGINT) AS span_us,
           round(CAST(SUM(c * dt) AS DOUBLE) / SUM(dt), 6) + 0.0 AS twap6
         FROM l WHERE dt IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "q245_rolling_corr" ->
      """WITH daily AS (
           SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           FROM events GROUP BY 1),
         s AS (
           SELECT day, x, y,
             COUNT(*) OVER w AS n, SUM(x) OVER w AS sx,
             SUM(y) OVER w AS sy, SUM(x * x) OVER w AS sxx,
             SUM(y * y) OVER w AS syy, SUM(x * y) OVER w AS sxy
           FROM daily
           WINDOW w AS (ORDER BY day
             ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
         SELECT day, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
           CASE WHEN (n*sxx - sx*sx) * (n*syy - sy*sy) > 0 THEN
             round(CAST(n*sxy - sx*sy AS DOUBLE) /
               sqrt(CAST((n*sxx - sx*sx) * (n*syy - sy*sy) AS DOUBLE)), 6)
               + 0.0
           END AS corr6
         FROM s ORDER BY day""",
    "q246_winsorize" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(round(value*100) AS BIGINT) AS c
           FROM events),
         r AS (
           SELECT event_id, event_type, c,
             ROW_NUMBER() OVER (PARTITION BY event_type
               ORDER BY c, event_id) AS r,
             COUNT(*) OVER (PARTITION BY event_type) AS gn
           FROM ev),
         t AS (
           SELECT event_type, MIN(c) AS lo, MAX(c) AS hi FROM r
           WHERE r = (gn * 5 + 99) // 100 OR r = (gn * 95 + 99) // 100
           GROUP BY event_type)
         SELECT r.event_id, r.c AS cents,
           least(greatest(r.c, t.lo), t.hi) AS winsorized_cents
         FROM r JOIN t ON t.event_type = r.event_type
         ORDER BY r.event_id""",
    "q254_new_vs_returning" ->
      """WITH days AS (
           SELECT DISTINCT user_id,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
           FROM events),
         f AS (SELECT user_id, MIN(day) AS first_day FROM days
               GROUP BY user_id),
         p AS (
           SELECT d.day,
             SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
               AS new_users,
             SUM(CASE WHEN d.day <> f.first_day THEN 1 ELSE 0 END)
               AS returning_users
           FROM days d JOIN f ON f.user_id = d.user_id
           GROUP BY d.day)
         SELECT day, CAST(new_users AS BIGINT) AS new_users,
           CAST(returning_users AS BIGINT) AS returning_users,
           CAST(SUM(new_users) OVER (ORDER BY day
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
         FROM p ORDER BY day""",
    "q256_lead_lag" ->
      """WITH daily AS (
           SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
           FROM events GROUP BY 1),
         sh AS (
           SELECT d.day + l.lag AS jday, l.lag, d.x
           FROM daily d CROSS JOIN generate_series(-3, 3) l(lag)),
         j AS (
           SELECT sh.lag, sh.x, d2.y
           FROM sh JOIN daily d2 ON d2.day = sh.jday),
         a AS (
           SELECT lag, COUNT(*) AS n_days, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
           FROM j GROUP BY lag)
         SELECT lag, n_days,
           CASE WHEN (n_days*sxx - sx*sx) * (n_days*syy - sy*sy) > 0 THEN
             round(CAST(n_days*sxy - sx*sy AS DOUBLE) /
               sqrt(CAST((n_days*sxx - sx*sx) * (n_days*syy - sy*sy)
                 AS DOUBLE)), 6) + 0.0
           END AS corr6
         FROM a ORDER BY lag""",
    "q260_seasonal_decompose" ->
      """WITH daily AS (
           SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1),
         g AS (
           SELECT day, n, day % 7 AS wd,
             CAST(SUM(n) OVER () AS DOUBLE) / COUNT(*) OVER () AS grand,
             CAST(SUM(n) OVER (PARTITION BY day % 7) AS DOUBLE) /
               COUNT(*) OVER (PARTITION BY day % 7) AS wmean,
             CAST(SUM(n) OVER (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE) /
               COUNT(*) OVER (ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend
           FROM daily)
         SELECT day, CAST(n AS BIGINT) AS n,
           round(trend, 6) + 0.0 AS trend6,
           round(wmean - grand, 6) + 0.0 AS seasonal6,
           round(n - trend - (wmean - grand), 6) + 0.0 AS resid6
         FROM g ORDER BY day""",
    "q262_audience_overlap" ->
      """WITH du AS (
           SELECT DISTINCT user_id,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
           FROM events),
         sz AS (SELECT day, COUNT(*) AS nu FROM du GROUP BY day),
         iv AS (
           SELECT a.day + 1 AS day, COUNT(*) AS ni
           FROM du a JOIN du b
             ON b.user_id = a.user_id AND b.day = a.day + 1
           GROUP BY a.day + 1)
         SELECT s.day, p.nu AS prev_nu, s.nu, COALESCE(iv.ni, 0) AS ni,
           round(CAST(COALESCE(iv.ni, 0) AS DOUBLE) /
             (p.nu + s.nu - COALESCE(iv.ni, 0)), 6) + 0.0 AS jaccard6
         FROM sz s JOIN sz p ON p.day = s.day - 1
         LEFT JOIN iv ON iv.day = s.day
         ORDER BY s.day""",
    "q169_rate_anomaly" ->
      """WITH daily AS (
           SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             COUNT(*) AS n
           FROM events GROUP BY 1),
         med AS (SELECT quantile_cont(n, 0.5) AS med FROM daily),
         mad AS (
           SELECT quantile_cont(abs(n - (SELECT med FROM med)), 0.5)
             AS mad
           FROM daily)
         SELECT day, CAST(n AS BIGINT) AS n,
           round(abs(n - (SELECT med FROM med)), 6) + 0.0 AS dev6,
           abs(n - (SELECT med FROM med)) >
             (SELECT mad FROM mad) * 3 AS is_anomaly
         FROM daily ORDER BY day""",
    // day spine via generate_series; trailing mean = exact integer
    // window sums divided once (identical float on any engine)
    "q116_gap_fill" ->
      """WITH daily AS (
           SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS value_cents
           FROM events
           WHERE user_id <= 2 AND event_type = 'purchase'
           GROUP BY 1),
         spine AS (
           SELECT unnest(generate_series((SELECT MIN(day) FROM daily),
             (SELECT MAX(day) FROM daily))) AS day),
         filled AS (
           SELECT s.day, COALESCE(d.n, 0) AS n,
             COALESCE(d.value_cents, 0) AS value_cents
           FROM spine s LEFT JOIN daily d ON s.day = d.day)
         SELECT day, CAST(n AS BIGINT) AS n, value_cents,
           round(CAST(SUM(n) OVER w AS BIGINT) * 1.0 /
             COUNT(*) OVER w, 4) AS avg7
         FROM filled
         WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         ORDER BY day""",
    // full 3-round power-iteration recompute as chained CTEs; the
    // (1.0 - 0.85) spelling reproduces Spark's binary 0.15... constant
    "q113_pagerank" ->
      """WITH seq AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS node
           FROM events),
         tr AS (
           SELECT node AS dst,
             lag(node) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src
           FROM seq),
         edges AS (
           SELECT src, dst, COUNT(*) * 1.0 AS w FROM tr
           WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
         nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         nn AS (SELECT COUNT(*) * 1.0 AS n FROM nodes),
         outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
         r0 AS (SELECT id, round(1.0 / n, 12) AS r FROM nodes, nn),
         c1 AS (SELECT e.dst AS id, SUM(r.r * (e.w / o.ow)) AS c
                FROM edges e JOIN r0 r ON e.src = r.id
                JOIN outw o ON e.src = o.src GROUP BY 1),
         d1 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r0 r
                LEFT JOIN outw o ON r.id = o.src WHERE o.src IS NULL),
         r1 AS (SELECT n0.id,
                  round((1.0 - 0.85) / nn.n +
                    0.85 * (COALESCE(c1.c, 0) + d1.dm / nn.n), 12) AS r
                FROM nodes n0 CROSS JOIN nn CROSS JOIN d1
                LEFT JOIN c1 ON n0.id = c1.id),
         c2 AS (SELECT e.dst AS id, SUM(r.r * (e.w / o.ow)) AS c
                FROM edges e JOIN r1 r ON e.src = r.id
                JOIN outw o ON e.src = o.src GROUP BY 1),
         d2 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r1 r
                LEFT JOIN outw o ON r.id = o.src WHERE o.src IS NULL),
         r2 AS (SELECT n0.id,
                  round((1.0 - 0.85) / nn.n +
                    0.85 * (COALESCE(c2.c, 0) + d2.dm / nn.n), 12) AS r
                FROM nodes n0 CROSS JOIN nn CROSS JOIN d2
                LEFT JOIN c2 ON n0.id = c2.id),
         c3 AS (SELECT e.dst AS id, SUM(r.r * (e.w / o.ow)) AS c
                FROM edges e JOIN r2 r ON e.src = r.id
                JOIN outw o ON e.src = o.src GROUP BY 1),
         d3 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r2 r
                LEFT JOIN outw o ON r.id = o.src WHERE o.src IS NULL),
         r3 AS (SELECT n0.id,
                  round((1.0 - 0.85) / nn.n +
                    0.85 * (COALESCE(c3.c, 0) + d3.dm / nn.n), 12) AS r
                FROM nodes n0 CROSS JOIN nn CROSS JOIN d3
                LEFT JOIN c3 ON n0.id = c3.id)
         SELECT id, round(r, 8) AS rank8 FROM r3 ORDER BY id""",
    "q322_ppr" ->
      """WITH seq AS (
           SELECT user_id, epoch_us(ts) AS us, event_id,
             CAST(regexp_extract(props, '[0-9]+') AS BIGINT) AS node
           FROM events),
         tr AS (
           SELECT node AS dst,
             lag(node) OVER (PARTITION BY user_id ORDER BY us, event_id) AS src
           FROM seq),
         edges AS (
           SELECT src, dst, COUNT(*) * 1.0 AS w FROM tr
           WHERE src IS NOT NULL AND src <> dst GROUP BY 1, 2),
         nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
         sd AS (SELECT id FROM nodes WHERE id % 5 = 0),
         ns AS (SELECT COUNT(*) * 1.0 AS n_seeds FROM sd),
         outw AS (SELECT src, SUM(w) AS ow FROM edges GROUP BY 1),
         base AS (
           SELECT n0.id,
             CASE WHEN sd.id IS NOT NULL
               THEN round(1.0 / ns.n_seeds, 12) ELSE 0.0 END AS s
           FROM nodes n0 CROSS JOIN ns
           LEFT JOIN sd ON n0.id = sd.id),
         r0 AS (SELECT id, s AS r FROM base),
         c1 AS (SELECT e.dst AS id, SUM(r.r * (e.w / o.ow)) AS c
                FROM edges e JOIN r0 r ON e.src = r.id
                JOIN outw o ON e.src = o.src GROUP BY 1),
         d1 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r0 r
                LEFT JOIN outw o ON r.id = o.src WHERE o.src IS NULL),
         r1 AS (SELECT b.id,
                  round((1.0 - 0.85) * b.s +
                    0.85 * (COALESCE(c1.c, 0) + d1.dm * b.s), 12) AS r
                FROM base b CROSS JOIN d1
                LEFT JOIN c1 ON b.id = c1.id),
         c2 AS (SELECT e.dst AS id, SUM(r.r * (e.w / o.ow)) AS c
                FROM edges e JOIN r1 r ON e.src = r.id
                JOIN outw o ON e.src = o.src GROUP BY 1),
         d2 AS (SELECT COALESCE(SUM(r.r), 0) AS dm FROM r1 r
                LEFT JOIN outw o ON r.id = o.src WHERE o.src IS NULL),
         r2 AS (SELECT b.id,
                  round((1.0 - 0.85) * b.s +
                    0.85 * (COALESCE(c2.c, 0) + d2.dm * b.s), 12) AS r
                FROM base b CROSS JOIN d2
                LEFT JOIN c2 ON b.id = c2.id)
         SELECT id, round(r, 8) AS rank8 FROM r2 ORDER BY id""")
}
