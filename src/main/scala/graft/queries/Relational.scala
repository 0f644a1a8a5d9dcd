package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Graft.{roundz, table}

/** Relational operator coverage over the harness TPC-H-ish tables
  * (SURVEY.md §2.4 J2/J3, §2.6 A4, §2.8 U2, §2.9): scans, filters,
  * hash/rollup aggregates, broadcast/sort-merge/semi/anti joins, windows,
  * top-k, set ops, string/date/regex scalar functions.
  *
  * Oracle-parity rules (driver hash-compares against DuckDB, see
  * SparkEntry contract):
  *  - money/double sums are computed as exact integer cents
  *    (`round(x*100)` per row, then BIGINT sum) — identical in any engine
  *    and any summation order; ratios derive from exact ints with a
  *    single IEEE division + round, which is bit-stable across engines;
  *  - every integer output is BIGINT on both sides (DuckDB HUGEINT/INT32
  *    would hash differently after pandas conversion);
  *  - timestamps are emitted as formatted strings;
  *  - every query ends in a total, non-null ORDER BY replicated verbatim
  *    in the oracle SQL (Spark NULLS FIRST vs DuckDB NULLS LAST differ —
  *    never order by a nullable key).
  */
object Relational {

  /** Exact money-to-cents: deterministic per-row double ops, then lossless
    * integer aggregation. Same expression shape as the oracle SQL.
    */
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1-style pricing summary: partial+final hash agg, exact-cents sums.
    "q01_pricing_summary" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("sum_disc_cents"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))).as("sum_charge_cents"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", round(col("sum_qty") / col("count_order"), 4))
        .withColumn("avg_base_cents",
          round(col("sum_base_cents") / col("count_order"), 4))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Filter + projection that must reach the parquet scan (pushdown).
    "q02_filter_project" -> ((s, d) => {
      table(s, d, "lineitem")
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01"))
          && col("l_shipdate") < to_timestamp(lit("1995-07-01"))
          && col("l_quantity") >= 48)
        .select(
          col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_quantity").cast("long").as("quantity"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Q3-style: 3-way join (dim filtered) + agg + top-k by revenue.
    "q03_top_revenue" -> ((s, d) => {
      val c = table(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = table(s, d, "orders")
        .filter(col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      val l = table(s, d, "lineitem")
        .filter(col("l_shipdate") > to_timestamp(lit("1997-01-01")))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
          col("o_orderpriority"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    }),

    // Left-semi join (EXISTS).
    "q04_semi_join" -> ((s, d) => {
      val big = table(s, d, "lineitem").filter(col("l_quantity") >= 50)
        .select(col("l_orderkey"))
      table(s, d, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    }),

    // Left-anti join (NOT EXISTS).
    "q05_anti_join" -> ((s, d) => {
      val o = table(s, d, "orders").select(col("o_custkey"))
      table(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    }),

    // Broadcast dimension joins (region/nation are tiny — broadcast them).
    "q06_dim_join" -> ((s, d) => {
      table(s, d, "customer")
        .join(broadcast(table(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Window: top-3 orders per customer by price (rank + filter pattern).
    "q07_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, d, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_cents"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Global top-k (TakeOrderedAndProject, not a full sort).
    // Unpivot/melt (the inverse of q24's pivot): wide per-flag metrics
    // → long (flag, metric, value). A narrow per-row transform — no
    // shuffle beyond the feeding aggregation. All measures cast to
    // BIGINT (unpivot requires a common value type).
    "q73_unpivot" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          count(lit(1)).as("n_lines"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_cents"), col("n_lines")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // listagg (Spark 4.0 SQL) — ordered string aggregation WITHIN
    // GROUP, the last §2.6 aggregate spelling the surface lacked
    // (collect_list + array_join is the pre-4.0 workaround; this is
    // the ANSI form). Deterministic because the ORDER BY key is unique
    // within each group; DuckDB's string_agg(... ORDER BY) is the
    // exact counterpart.
    // Schema-evolution union (U2 at corpus lifetime): an old corpus
    // drop (3 columns) unioned with the current 5-column schema via
    // unionByName(allowMissingColumns = true) — name-based alignment
    // with NULL back-fill, the engine surface every long-lived dataset
    // needs when a positional UNION would silently misalign or reject.
    // Oracle: UNION ALL with the missing columns spelled as NULLs.
    "q208_union_evolve" -> ((s, d) => {
      val docs = table(s, d, "documents")
      val legacy = docs.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id"), col("text"), col("lang"))
      val current = docs.filter(col("doc_id") % 3 =!= 0)
      legacy.unionByName(current, allowMissingColumns = true)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("source").isNull, 1L).otherwise(0L)).as("n_legacy"),
          sum(coalesce(col("n_chars"), lit(0L))).as("chars_known"))
        .orderBy(col("lang"))
    }),

    "q204_listagg" -> ((s, d) => {
      val n = table(s, d, "nation")
      val r = table(s, d, "region")
      n.join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)")
          .as("nations"))
        .orderBy(col("r_name"))
    }),

    // Spark 4 string COLLATION — semantic string comparison as an
    // engine surface (UTF8_LCASE = case-insensitive equality/grouping/
    // distinct) instead of lower() normalization at every call site.
    // The fixture mixes case deterministically (even keys upper, odd
    // lower) so case-sensitive and case-insensitive distincts MUST
    // diverge; equality against a collated literal exercises the
    // comparison path. Oracle = the lower() spelling of the same
    // semantics (collation-naive engines normalize; a collation-aware
    // engine must agree with them on these aggregate counts).
    // Three-valued-logic pin: NOT IN against a subquery CONTAINING A
    // NULL is the classic silent-wrong-answer trap — every comparison
    // to the NULL is UNKNOWN, so NOT IN returns ZERO rows, while the
    // equivalent-looking NOT EXISTS correlates per-row and returns the
    // true anti-join count. Both engines implement standard SQL here;
    // the query pins that this engine does too (and documents why the
    // library's anti-joins are spelled as anti joins, never NOT IN).
    "q281_not_in_nulls" -> ((s, d) => {
      table(s, d, "customer").createOrReplaceTempView("g_niv_c")
      table(s, d, "orders").createOrReplaceTempView("g_niv_o")
      s.sql("""
        WITH c AS (SELECT c_custkey FROM g_niv_c),
             o AS (SELECT o_custkey FROM g_niv_o
                   UNION ALL SELECT CAST(NULL AS BIGINT)),
             ne AS (SELECT COUNT(*) AS n FROM c
                    WHERE NOT EXISTS (SELECT 1 FROM o
                                      WHERE o.o_custkey = c.c_custkey)),
             ni AS (SELECT COUNT(*) AS n FROM c
                    WHERE c_custkey NOT IN (SELECT o_custkey FROM o))
        SELECT 'not_exists' AS variant, n FROM ne
        UNION ALL SELECT 'not_in', n FROM ni
        ORDER BY variant""")
    }),

    // Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other under the null-safe operator and match nothing
    // under plain =. Pinned as the pair of counts — and a scale note:
    // null-safe joins funnel EVERY null-keyed row into one hash
    // partition, so production plans should split the null stratum
    // (the q98 salting discipline) before a null-safe shuffle.
    "q282_null_safe_join" -> ((s, d) => {
      table(s, d, "customer").createOrReplaceTempView("g_nsj_c")
      table(s, d, "supplier").createOrReplaceTempView("g_nsj_s")
      s.sql("""
        WITH a AS (SELECT nullif(c_custkey % 50, 0) AS k FROM g_nsj_c),
             b AS (SELECT nullif(s_suppkey % 50, 0) AS k FROM g_nsj_s),
             eq AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.k = b.k),
             ns AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.k <=> b.k)
        SELECT 'equi' AS variant, n FROM eq
        UNION ALL SELECT 'null_safe', n FROM ns
        ORDER BY variant""")
    }),

    "q205_collation" -> ((s, d) => {
      val mixed = table(s, d, "part")
        .withColumn("brand_mixed",
          when(pmod(col("p_partkey"), lit(2)) === 0, upper(col("p_brand")))
            .otherwise(lower(col("p_brand"))))
      mixed.agg(
        countDistinct(collate(col("brand_mixed"), "UTF8_LCASE"))
          .as("n_ci"),
        countDistinct(col("brand_mixed")).as("n_cs"),
        count(when(collate(col("brand_mixed"), "UTF8_LCASE")
          === lit("Brand#32"), 1)).as("n_eq_ci"))
    }),

    // Ranking-window-function suite (§2.9 completeness): ntile,
    // percent_rank, cume_dist, nth_value over a total (cents, orderkey)
    // order within each priority class. Explicit full-row frame on
    // nth_value (engines differ on the default frame); rank-fraction
    // doubles rounded to 6 — exact ties are impossible since the order
    // key is unique.
    "q71_rank_suite" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("cents"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      table(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-03-01"))
          && col("o_orderdate") < to_timestamp(lit("1995-04-01")))
        .select(col("o_orderkey"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("cents"))
        .withColumn("bucket", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .withColumn("second_cheapest",
          nth_value(col("o_orderkey"), 2).over(wFull))
        .orderBy(col("o_orderpriority"), col("cents"), col("o_orderkey"))
    }),

    // Equi-depth decile binning WITHOUT a single-partition global sort:
    // ids come from Corpus.denseIds (range exchange + parallel
    // per-partition ranks + broadcast offsets), the bin is integer math
    // on the id — bin = ⌊id·K/n⌋ — and n rides along as a one-row
    // broadcast off the already-checkpointed id frame (no second scan).
    // This is the feature-engineering discretizer at 100 TB; contrast
    // q71's ntile, whose per-PARTITION windows are fine because the
    // partition keys bound each sort. Remainder spreads across bins
    // (⌊·⌋ of the product), which is why the oracle replays the same
    // formula rather than SQL ntile's front-loaded remainder.
    "q129_equidepth_bins" -> ((s, d) => {
      val o = table(s, d, "orders")
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("cents"))
      val ids = graft.ext.Corpus.denseIds(o,
        struct(col("cents"), col("o_orderkey")))
      val n = ids.agg(max(col("dense_id") + 1).as("n"))
      ids.crossJoin(broadcast(n))
        .withColumn("bin", expr("(dense_id * 10) div n"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("cents")).as("lo_cents"),
          max(col("cents")).as("hi_cents"))
        .orderBy(col("bin"))
    }),

    "q08_topk_global" -> ((s, d) => {
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
    }),

    // Distinct (shuffle-dedup).
    "q09_distinct" -> ((s, d) => {
      table(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Rollup with subtotals (grouping sets); nulls sentinel-coalesced so
    // the ORDER BY keys stay non-null.
    "q10_rollup" -> ((s, d) => {
      table(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // INTERSECT (distinct set semantics both engines).
    "q11_intersect" -> ((s, d) => {
      val building = table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val spenders = table(s, d, "orders")
        .filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("custkey"))
      building.intersect(spenders).orderBy(col("custkey"))
    }),

    // EXCEPT (distinct set semantics both engines).
    "q12_except" -> ((s, d) => {
      val building = table(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withOrders = table(s, d, "orders").select(col("o_custkey").as("custkey"))
      building.except(withOrders).orderBy(col("custkey"))
    }),

    // GROUP BY + HAVING.
    "q13_having" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"))
        .filter(col("sum_qty") > 15500)
        .orderBy(col("l_suppkey"))
    }),

    // Conditional aggregation (CASE WHEN inside agg) + exact-int ratio.
    "q14_casewhen" -> ((s, d) => {
      table(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("o_totalprice") > 200000, 1).otherwise(0))
            .cast("long").as("n_big"))
        .withColumn("big_ratio", round(col("n_big") / col("n_orders"), 4))
        .orderBy(col("o_orderpriority"))
    }),

    // Date part extraction + agg.
    "q15_date_agg" -> ((s, d) => {
      table(s, d, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_cents"))
        .orderBy(col("o_year"), col("o_month"))
    }),

    // Left outer join preserving unmatched left rows (suppliers with no
    // lineitems keep n_items = 0).
    "q29_outer_join" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      table(s, d, "supplier")
        .join(li, col("s_suppkey") === col("l_suppkey"), "left_outer")
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"),
          sum(coalesce(col("cnt"), lit(0L))).as("n_items"),
          sum(when(col("cnt").isNull, 1).otherwise(0)).cast("long")
            .as("n_idle_suppliers"))
        .orderBy(col("nationkey"))
    }),

    // Cross join of two tiny broadcast dims (explicit cartesian).
    "q45_cross_join" -> ((s, d) => {
      val r = table(s, d, "region").select(col("r_name"))
      val n = table(s, d, "nation").select(col("n_name"))
      r.crossJoin(broadcast(n))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("n_name")).as("first_nation"))
        .orderBy(col("r_name"))
    }),

    // Scalar-subquery pattern: rows above the global average — computed
    // as a 1-row broadcast join, not a driver-side collect.
    "q46_scalar_subquery" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      val avgQty = li.agg(avg(col("l_quantity")).as("avg_qty"))
      li.join(broadcast(avgQty))
        .filter(col("l_quantity") > col("avg_qty") * 1.9)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // String scalar functions + LIKE pushdown.
    "q16_strings" -> ((s, d) => {
      table(s, d, "part")
        .filter(col("p_name").like("%a%") && col("p_size") >= 40)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).cast("long").as("namelen"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // Exact triangle counting (graft.ext.Graph.triangleCounts) over the
    // supplier co-purchase graph: suppliers are adjacent when their
    // common-customer count clears the p95 of all pair counts — a
    // DENSITY threshold, not an absolute one, so the edge set stays
    // ~5% of pairs at every SF (a mean-relative cut left the graph 31%
    // dense at sf0.1 and the wedge join quadratic in it — profiled
    // 11.6 s; p95 holds it at 1.2 s). percentile ≡ quantile_cont
    // (q169's parity), and the threshold rides in-plan as a one-row
    // broadcast (q46's scalar class). The bipartite projection fans
    // out per customer by their distinct-supplier basket (the
    // q121/q166 bound); the enumeration is two wedge-bounded
    // equi-joins — see triangleCounts' scaladoc for the
    // degree-orientation refinement hub-heavy graphs want. Output:
    // per-node counts + a −1 total row (Σ = 3·triangles, exact).
    "q179_triangle_count" -> ((s, d) => {
      val edges = coPurchaseEdges(s, d)
      // degree-oriented enumeration (the hub-robust production form);
      // the oracle below replays the ID-ordered wedges — identical
      // counts by construction, so the gate proves the equivalence
      val tc = graft.ext.Graph.triangleCountsDegreeOriented(edges, "sa", "sb")
      val total = tc.agg(lit(-1L).as("node"),
        (sum(col("n_triangles")) / 3).cast("long").as("n_triangles"))
      tc.unionByName(total).orderBy(col("node"))
    }),

    // Incremental maintenance of a JOIN-DERIVED relation (r9, §7.6
    // backlog item #1): deltaRelation's legality is per-dep
    // row-locality, which the co-purchase edges lack — so this is the
    // counting-IVM route instead, with the coverage proof sketched
    // first as required: baskets of the union input partition per
    // customer into S0(c) ⊎ D(c) (base members / strictly-new delta
    // members after the anti-join dedup), and unordered pairs over a
    // disjoint union decompose EXACTLY as pairs(S0) ⊎ (D×S0) ⊎
    // pairs(D) — so the maintained per-pair counts are base counts
    // plus |Δ|-sized delta contributions (each new member pairs only
    // against its own basket), never a recount of the base self-join.
    // The p95 threshold is NOT incremental (it reads the full nc
    // distribution), but that is O(|distinct pairs|) — bounded by
    // supplier-pairs, not by input rows. The oracle rebuilds the edge
    // relation from scratch over the union input, so the hash match
    // IS the increment≡rebuild theorem — no in-query boolean needed.
    "q348_copurchase_delta" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val or = table(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      // ONE lineitem⋈orders pass tags every (c, sv) member with whether
      // any BASE order contributes it (r13, guide §2.4): base members =
      // inBase, strictly-new delta members = !inBase — exactly the old
      // baskets(base) / baskets(delta) ANTI-JOIN baskets(base) partition
      // (S0(c) ⊎ D(c)), computed with one join + one aggregate instead
      // of two joins + two distincts + an anti-join shuffle.
      val tagged = li
        .join(or, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sv"),
          (pmod(col("o_orderkey"), lit(10)) =!= 7).as("isBase"))
        .groupBy(col("c"), col("sv")).agg(max(col("isBase")).as("inBase"))
        .localCheckpoint(true)
      val baskBase = tagged.filter(col("inBase")).select(col("c"), col("sv"))
      // strictly-new members only — the disjointness the proof needs
      val baskDelta = tagged.filter(!col("inBase")).select(col("c"), col("sv"))
      def pairCounts(a: DataFrame, b: DataFrame): DataFrame =
        a.toDF("c", "sa").join(b.toDF("c", "sb"), Seq("c"))
          .filter(col("sa") < col("sb"))
          .select(col("sa"), col("sb"))
      // stored MV state (localCheckpoint = the materialization): the
      // base pair counts, paid once at base-build time
      val baseCounts = pairCounts(baskBase, baskBase)
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("nc"))
        .localCheckpoint(true)
      // |Δ|-sized contributions: each new member pairs only against
      // its own basket (D×S0) plus the new members among themselves
      val mixedPairs = baskDelta.toDF("c", "x")
        .join(baskBase.toDF("c", "y"), Seq("c"))
        .select(least(col("x"), col("y")).as("sa"),
          greatest(col("x"), col("y")).as("sb"))
      // delta contributions ride into the merge as weight-1 rows so the
      // counting-IVM merge is ONE aggregate (r13, guide §2.4: the
      // separate delta pre-count only added an exchange — sum of ones
      // ≡ count, map-side partial aggregation does the same reduction)
      val deltaRaw = mixedPairs
        .unionByName(pairCounts(baskDelta, baskDelta))
        .select(col("sa"), col("sb"), lit(1L).as("nc"))
      // counting-IVM merge: partial counts sum
      val merged = baseCounts.unionByName(deltaRaw)
        .groupBy(col("sa"), col("sb")).agg(sum(col("nc")).as("nc"))
      val thr = merged.agg(expr("percentile(nc, 0.95D)").as("m"))
      merged.crossJoin(broadcast(thr)).filter(col("nc") >= col("m"))
        .select(col("sa"), col("sb"), col("nc"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Staged + IVM composition (r9, §7.6): q348's counting-IVM merge
    // becomes the UPDATE PATH of a staged relation. ops.Staged.
    // maintainedRelation records each generation's dep fingerprints in
    // a manifest; when the dep set GROWS (append-only input), the new
    // generation builds as applyDelta(previous generation, added deps)
    // instead of a full rebuild — here: the maintained co-purchase
    // pair counts gain the delta orders' contributions (the q348
    // decomposition) without re-running the base baskets' quadratic
    // self-join (the base input is re-SCANNED for basket membership —
    // linear — but its pair generation, the expensive part, comes from
    // the previous generation's parquet). Two generations build inside
    // this query: gen1 full over the staged base-orders slice, gen2
    // via the delta path over base+delta; the emitted edges come from
    // gen2, and the oracle rebuilds them from scratch over the union
    // input — the hash match pins delta-path ≡ rebuild END TO END
    // through the staging protocol (StagedSpec pins route selection
    // with build counters). At 100 TB this is the nightly shape: a new
    // partition lands, the shared relation updates in O(|Δ|·basket),
    // downstream families keep reading one columnar stage.
    "q352_maintained_stage" -> ((s, d) => {
      val ordersSrc = s"$d/orders.parquet"
      val liSrc = s"$d/lineitem.parquet"
      def sliceDir(nm: String,
                   pred: org.apache.spark.sql.Column): String = {
        graft.ops.Staged.relation(s, nm, "v1", Seq(ordersSrc))(
          table(s, d, "orders").filter(pred)
            .select(col("o_orderkey"), col("o_custkey")))
        graft.ops.Staged.stagePath(nm, "v1", Seq(ordersSrc)).toString
      }
      val baseDir = sliceDir("q352_orders_base",
        pmod(col("o_orderkey"), lit(10)) =!= 7)
      val deltaDir = sliceDir("q352_orders_delta",
        pmod(col("o_orderkey"), lit(10)) === 7)
      val li = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      def baskets(ordDirs: Seq[String]): DataFrame =
        li.join(s.read.parquet(ordDirs: _*),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"), col("l_suppkey").as("sv"))
          .distinct()
      def selfPairs(bask: DataFrame): DataFrame =
        bask.toDF("c", "sa").join(bask.toDF("c", "sb"), Seq("c"))
          .filter(col("sa") < col("sb")).select(col("sa"), col("sb"))
      def buildFull(deps: Seq[String]): DataFrame =
        selfPairs(baskets(deps.tail)) // deps.head is lineitem
          .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("nc"))
      // prevDeps = the MATCHED generation's manifest dep list (r10:
      // threaded by maintainedRelation itself, so the anti-join base
      // can never drift from the generation actually adopted);
      // prevDeps.head is lineitem, tail the order slices it covered
      def applyDelta(prev: DataFrame, prevDeps: Seq[String],
                     added: Seq[String]): DataFrame = {
        val baskBase = baskets(prevDeps.tail)
        val baskD = baskets(added)
          .join(baskBase, Seq("c", "sv"), "left_anti")
        val mixed = baskD.toDF("c", "x")
          .join(baskBase.toDF("c", "y"), Seq("c"))
          .select(least(col("x"), col("y")).as("sa"),
            greatest(col("x"), col("y")).as("sb"))
        val deltaCounts = mixed.unionByName(selfPairs(baskD))
          .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("nc"))
        prev.unionByName(deltaCounts)
          .groupBy(col("sa"), col("sb")).agg(sum(col("nc")).as("nc"))
      }
      graft.ops.Staged.maintainedRelation(s, "q352_paircounts", "v1",
        Seq(liSrc, baseDir))(buildFull)(applyDelta)
      val counts = graft.ops.Staged.maintainedRelation(s,
        "q352_paircounts", "v1", Seq(liSrc, baseDir, deltaDir))(
        buildFull)(applyDelta)
      val thr = counts.agg(expr("percentile(nc, 0.95D)").as("m"))
      counts.crossJoin(broadcast(thr)).filter(col("nc") >= col("m"))
        .select(col("sa"), col("sb"), col("nc").cast("long").as("nc"))
        .orderBy(col("sa"), col("sb"))
    }),

    // Generation TIME TRAVEL on the maintained staged relation (r10 —
    // the snapshot-read the staging protocol gets for free, the Delta/
    // Iceberg "AS OF" analogue): every published generation of
    // `copurchase_paircounts` is addressable by its DEP SET — reading
    // with the OLD dep list (lineitem + base orders slice) serves the
    // pre-append snapshot from its published stage, while the full dep
    // list serves the current one; neither read rebuilds anything
    // (both generations published by the q179-family build), and a
    // TTL-pruned old generation REBUILDS deterministically rather than
    // failing (snapshots are derived state, not retained history).
    // The oracle recomputes both snapshots from the raw tables — a
    // stale or cross-wired generation mismatches on either row. At
    // 100 TB this is how a pipeline A/B-validates a nightly update:
    // query both generations side by side, zero extra build cost.
    "q363_generation_time_travel" -> ((s, d) => {
      coPurchaseSnapshots(s, d).map { case (label, df) =>
        df.agg(count(lit(1)).as("n_pairs"),
            sum(col("nc")).cast("long").as("sum_nc"),
            max(col("nc")).cast("long").as("max_nc"))
          .select(lit(label).as("snapshot"), col("n_pairs"),
            col("sum_nc"), col("max_nc"))
      }.reduce(_.unionByName(_)).orderBy(col("snapshot"))
    }),

    // Weighted label propagation (graft.ext.Graph.labelPropagation, 3
    // synchronous rounds) over q179's p95 co-purchase graph, edge
    // weight = common-customer count: the community structure that
    // groups suppliers serving the same customer base. Deterministic
    // by construction (sync rounds, integer votes, smallest-label
    // ties), so the oracle replays all three rounds exactly. Output =
    // the full node→label assignment.
    "q183_label_propagation" -> ((s, d) =>
      graft.ext.Graph.labelPropagation(coPurchaseEdges(s, d),
          "sa", "sb", "nc", rounds = 3)
        .orderBy(col("node"))),

    // Negative-edge sampling for link prediction over the part↔supplier
    // bipartite graph: contrastive training needs non-edges, and at
    // scale you can NOT enumerate the V×V complement — instead each
    // part proposes k hash-derived candidate suppliers (O(parts·k),
    // overflow-safe reduced-mod hashing), validates them with a semi
    // join, and anti-joins the observed edge set. Deterministic, no
    // RNG, no grid materialization.
    "q235_negative_edges" -> ((s, d) => {
      val pos = table(s, d, "lineitem")
        .select(col("l_partkey").cast("long").as("p"),
          col("l_suppkey").cast("long").as("cand_s"))
        .distinct()
      val maxS = table(s, d, "supplier")
        .agg(max(col("s_suppkey")).cast("long").as("ms"))
      val cand = table(s, d, "part")
        .select(col("p_partkey").cast("long").as("p"))
        .crossJoin(broadcast(maxS))
        .withColumn("i", explode(sequence(lit(0L), lit(9L))))
        .withColumn("cand_s",
          (col("p") % 100000 * lit(2654435761L) + col("i") * lit(40503L))
            % 100000 % col("ms") + 1)
        .select(col("p"), col("cand_s")).distinct()
      val valid = cand.join(table(s, d, "supplier")
          .select(col("s_suppkey").cast("long").as("cand_s")),
        Seq("cand_s"), "left_semi")
      valid.join(pos, Seq("p", "cand_s"), "left_anti")
        .select(col("p").as("p_partkey"), col("cand_s").as("neg_suppkey"))
        .orderBy(col("p_partkey"), col("neg_suppkey"))
    }),

    // Item-item cosine similarity over implicit feedback (the
    // neighborhood-method recsys core): suppliers as items, customers
    // as users, sim(i,j) = n_ij / sqrt(n_i·n_j) from exact distinct
    // co-customer counts; top-3 neighbors per supplier. The pair build
    // is the q121/q179 basket self-join — fanout per customer is
    // basket², so one whale customer touching every item would flood a
    // single join key. Defense (r7): baskets are CAPPED at the top
    // B=256 items per customer (deterministic smallest-sv rank — the
    // capBaskets helper, hot-customer fixture in ScaleSpec) BEFORE the
    // self-join and the marginals, so per-key fanout is ≤ B² no matter
    // how hot a customer gets; the cap is a no-op at gated scales
    // (sf0.01 has 100 suppliers total) and the oracle replays it
    // verbatim. Ranks order on the ROUNDED sim (q220's determinism
    // convention) with the neighbor id as tie-break.
    "q243_item_similarity" -> ((s, d) => {
      val bask = capBaskets(table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(table(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"),
          col("l_suppkey").cast("long").as("sv"))
        .distinct(), "c", "sv", cap = 256)
        .localCheckpoint(true) // referenced by pair build AND marginals
      val deg = bask.groupBy(col("sv")).agg(count(lit(1)).as("n1"))
      // Count UNORDERED pairs (sa < sb) and mirror AFTER the aggregate
      // (r13, guide §2.3): nc and sim6 = nc/sqrt(na·nb) are symmetric
      // in (sa, sb), so the ordered-pair relation the window consumes
      // is exactly lower ∪ mirror(lower) — identical rows to the old
      // sa ≠ sb spelling — while the expansion feeding the count
      // aggregate and the two degree joins carries HALF the rows.
      val pairsLo = bask.toDF("c", "sa").join(bask.toDF("c", "sb"), Seq("c"))
        .filter(col("sa") < col("sb"))
        .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("nc"))
      val simLo = pairsLo
        .join(deg.toDF("sa", "na"), Seq("sa"))
        .join(deg.toDF("sb", "nb"), Seq("sb"))
        .withColumn("sim6", roundz(col("nc").cast("double") /
          sqrt((col("na") * col("nb")).cast("double")), 6))
        .select(col("sa"), col("sb"), col("sim6"))
      // mirror in ONE pass (explode of both orientations) instead of a
      // self-union, which would duplicate the whole pair-build subtree
      val sim = simLo.select(explode(array(
          struct(col("sa"), col("sb"), col("sim6")),
          struct(col("sb").as("sa"), col("sa").as("sb"), col("sim6"))))
          .as("p"))
        .select(col("p.sa").as("sa"), col("p.sb").as("sb"),
          col("p.sim6").as("sim6"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("sa")).orderBy(col("sim6").desc, col("sb"))
      sim.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("sa"), col("rk"), col("sb"), col("sim6"))
        .orderBy(col("sa"), col("rk"))
    }),

    // 4-core of the co-purchase graph (graft.ext.Graph.kCore):
    // synchronized peeling — every round drops ALL nodes with
    // within-core degree < 4 — to the unique maximal subgraph of
    // min-degree ≥ 4; community seeds / coreness as an authority
    // feature. Oracle replays the peel round-by-round in a recursive
    // CTE with aggregation in the recursive term (fixed 30 rounds —
    // the fixpoint re-emits itself once stable, so round 30 IS the
    // core as long as Spark's convergence check passed earlier).
    "q251_kcore" -> ((s, d) =>
      graft.ext.Graph.kCore(coPurchaseEdges(s, d), "sa", "sb", k = 4)
        .orderBy(col("node"))),

    // Single-source BFS from the busiest supplier (highest co-purchase
    // degree, smallest-id tie-break) — hop distances over the p95
    // graph via graft.ext.Graph.bfsHops (frontier-DELTA: only the new
    // frontier joins the edges each round; the settled check anti-joins
    // the last two frontiers only — exact on a symmetric edge list, so
    // per-round cost tracks the frontier, not |V_reached|). The source
    // id is ONE collected scalar
    // (k-means-centroid class); oracle replays the expansion as a
    // bounded-hop recursive CTE with MIN(hop) dedup.
    "q259_bfs_hops" -> ((s, d) => {
      val e = coPurchaseEdges(s, d).localCheckpoint(true)
      val deg = e.select(col("sa").as("node"))
        .union(e.select(col("sb").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val src = deg.orderBy(col("dg").desc, col("node"))
        .limit(1).collect()(0).getAs[Number](0).longValue
      graft.ext.Graph.bfsHops(e, "sa", "sb", src).orderBy(col("node"))
    }))

  /** Whale-basket cap for self-join pair builds: keep the `cap`
    * smallest `item`s per `key` (row_number, fully deterministic), so
    * per-key pair fanout is bounded by cap² regardless of how many
    * items one hot key accumulates. A no-op whenever every basket fits
    * the cap — choose the cap so gated scales are exact and only the
    * pathological whale is truncated (the a-priori discipline:
    * similarity over truncated baskets is the standard production
    * trade). Oracles replay the identical ROW_NUMBER cap.
    */
  private[graft] def capBaskets(bask: DataFrame, key: String,
                                item: String, cap: Int): DataFrame =
    bask.withColumn("__rk", row_number().over(
        Window.partitionBy(col(key)).orderBy(col(item))))
      .filter(col("__rk") <= cap)
      .drop("__rk")

  /** The supplier co-purchase edge relation shared by the whole graph
    * family (q179 triangles, q183 label propagation, q251 k-core, q259
    * BFS): bipartite customer×supplier projection → pairwise
    * common-customer counts → p95 density cut. r8: MEMOIZED — staged
    * once per dataset as parquet under a fingerprinted path and read
    * by all four, instead of each query re-running the projection
    * self-join (~2-3 s × 4 at sf0.1). This is the materialized-view
    * move a 100 TB deployment makes for any relation consumed by a
    * query family: the projection shuffle is paid once, downstream
    * iterative algorithms start from a columnar scan. The fingerprint
    * keys on the INPUT files' (size, mtime), so regenerated testdata
    * (same path, new bytes) rebuilds instead of serving stale edges;
    * the write lands in a temp dir renamed into place, so a killed
    * build can never be read as a complete stage. The relation itself
    * is deterministic (exact integer counts, percentile threshold), so
    * staging cannot change any downstream oracle.
    */
  /** Code-version token for the staged co-purchase relations: bump on
    * ANY edit to the builder plans below, or a persisted /tmp stage
    * from the pre-edit code silently serves stale rows (ADVICE-r8
    * medium). v2 = r10's maintainedRelation deployment.
    */
  private[graft] val CoPurchaseVersion = "v2"

  /** The orders GENERATION slices feeding the maintained pair counts.
    * The harness ships orders as one static file, so the generations a
    * production table accretes are SYNTHESIZED once per input state as
    * two staged slices (the q339/q352 pmod split: base = 90%, delta =
    * the %10==7 arrivals) — at 100 TB these are just the table's real
    * date partitions and nothing is synthesized.
    */
  private[graft] def coPurchaseOrderSlices(s: SparkSession, d: String): Seq[String] = {
    val ordersSrc = s"$d/orders.parquet"
    def slice(nm: String, pred: org.apache.spark.sql.Column): String = {
      graft.ops.Staged.relation(s, nm, CoPurchaseVersion, Seq(ordersSrc))(
        table(s, d, "orders").filter(pred)
          .select(col("o_orderkey"), col("o_custkey")))
      graft.ops.Staged.stagePath(nm, CoPurchaseVersion, Seq(ordersSrc))
        .toString
    }
    Seq(slice("copurchase_orders_base",
        pmod(col("o_orderkey"), lit(10)) =!= 7),
      slice("copurchase_orders_delta",
        pmod(col("o_orderkey"), lit(10)) === 7))
  }

  /** r10 (VERDICT-r9 #3 / SURVEY §7.6 backlog #1): the PRODUCTION
    * co-purchase relation now runs through `Staged.maintainedRelation`
    * — q352 stops being a demonstration and becomes the deployment.
    * The maintained stage holds the pre-threshold PAIR COUNTS (the
    * counting-mergeable part); generation growth (the delta orders
    * slice appearing) updates it via the q348 decomposition —
    * per-customer baskets split disjointly into base ⊎ new members, so
    * delta contributions are |Δ|·basket-sized and the base's quadratic
    * self-join is never re-run. `applyDelta` pairs the new members
    * against baskets REBUILT FROM THE MATCHED GENERATION'S OWN dep
    * manifest (prevDeps — the ADVICE-r9 threading), so the
    * decomposition can never anti-join against the wrong base.
    * StagedSpec pins route selection with build counters on the real
    * relation; the four graph consumers' oracles (full from-scratch
    * rebuilds) pin delta ≡ rebuild end to end.
    */
  private[graft] def coPurchasePairCounts(s: SparkSession, d: String): String = {
    val liSrc = s"$d/lineitem.parquet"
    val slices = coPurchaseOrderSlices(s, d)
    val (bf, ad) = coPurchasePairBuilders(s, d)
    // gen1 over the base slice, then the grown dep set: per input
    // state, gen2 ALWAYS builds via the delta route (gen1's manifest
    // subset-matches) — the nightly shape, exercised every fresh stage
    graft.ops.Staged.maintainedRelation(s, "copurchase_paircounts",
      CoPurchaseVersion, Seq(liSrc, slices.head))(bf)(ad)
    graft.ops.Staged.maintainedRelation(s, "copurchase_paircounts",
      CoPurchaseVersion, liSrc +: slices)(bf)(ad)
    graft.ops.Staged.stagePath("copurchase_paircounts", CoPurchaseVersion,
      liSrc +: slices).toString
  }

  /** (buildFull, applyDelta) for the maintained pair counts — exposed
    * to StagedSpec so route selection is pin-able on the REAL relation.
    * Contract (q348's theorem, oracle-pinned): applyDelta(gen(D),
    * D, Δ) ≡ buildFull(D ∪ Δ).
    */
  private[graft] def coPurchasePairBuilders(s: SparkSession, d: String)
      : (Seq[String] => DataFrame,
         (DataFrame, Seq[String], Seq[String]) => DataFrame) = {
    val li = table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    def baskets(ordDirs: Seq[String]): DataFrame =
      li.join(s.read.parquet(ordDirs: _*),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sv"))
        .distinct()
    def selfPairs(bask: DataFrame): DataFrame =
      bask.toDF("c", "sa").join(bask.toDF("c", "sb"), Seq("c"))
        .filter(col("sa") < col("sb")).select(col("sa"), col("sb"))
    def buildFull(deps: Seq[String]): DataFrame =
      selfPairs(baskets(deps.tail)) // deps.head is lineitem
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).cast("long").as("nc"))
    def applyDelta(prev: DataFrame, prevDeps: Seq[String],
                   added: Seq[String]): DataFrame = {
      val baskBase = baskets(prevDeps.tail)
      val baskD = baskets(added)
        .join(baskBase, Seq("c", "sv"), "left_anti")
      val mixed = baskD.toDF("c", "x")
        .join(baskBase.toDF("c", "y"), Seq("c"))
        .select(least(col("x"), col("y")).as("sa"),
          greatest(col("x"), col("y")).as("sb"))
      val deltaCounts = mixed.unionByName(selfPairs(baskD))
        .groupBy(col("sa"), col("sb"))
        .agg(count(lit(1)).cast("long").as("nc"))
      prev.unionByName(deltaCounts)
        .groupBy(col("sa"), col("sb"))
        .agg(sum(col("nc")).cast("long").as("nc"))
    }
    (buildFull, applyDelta)
  }

  /** Both generations of the maintained pair counts, resolved through
    * the protocol (NOT raw paths: a TTL-pruned old generation rebuilds
    * deterministically instead of failing the read) — q363's snapshot
    * reads.
    */
  private[graft] def coPurchaseSnapshots(s: SparkSession, d: String)
      : Seq[(String, DataFrame)] = {
    val liSrc = s"$d/lineitem.parquet"
    val slices = coPurchaseOrderSlices(s, d)
    val (bf, ad) = coPurchasePairBuilders(s, d)
    Seq(
      "as_of_base" -> graft.ops.Staged.maintainedRelation(s,
        "copurchase_paircounts", CoPurchaseVersion,
        Seq(liSrc, slices.head))(bf)(ad),
      "current" -> graft.ops.Staged.maintainedRelation(s,
        "copurchase_paircounts", CoPurchaseVersion,
        liSrc +: slices)(bf)(ad))
  }

  /** Where the staged EDGES live for this input state — shared with
    * GraphSpec so the test resolves its own stage by fingerprint
    * instead of scanning /tmp by mtime. The edges stage is staged ON
    * the maintained pair-counts stage (directory-dep composition), so
    * its fingerprint re-keys whenever a new pair-counts generation
    * publishes.
    */
  private[graft] def coPurchaseStagePath(d: String): java.nio.file.Path = {
    val s = org.apache.spark.sql.SparkSession.active
    graft.ops.Staged.stagePath("copurchase_edges", CoPurchaseVersion,
      Seq(coPurchasePairCounts(s, d)))
  }

  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val pcDir = coPurchasePairCounts(s, d)
    // the p95 density cut reads the maintained counts' columnar scan;
    // consumers keep reading ONE final edges stage exactly as before
    graft.ops.Staged.relation(s, "copurchase_edges", CoPurchaseVersion,
        Seq(pcDir)) {
        val counts = s.read.parquet(pcDir)
        val thr = counts.agg(expr("percentile(nc, 0.95D)").as("m"))
        counts.crossJoin(broadcast(thr)).filter(col("nc") >= col("m"))
          .select(col("sa"), col("sb"), col("nc"))
      }
      .select(col("sa"), col("sb"), col("nc"))
  }

  /** The un-memoized edge plan (also the spec's reference: staged
    * parquet must equal this exactly). The bipartite projection is the
    * whole-stage-codegen'd basket self-join on the customer key —
    * measured 3× faster than the "collect basket + indexed-lambda pair
    * expansion" spelling (2.1 s vs 6.6 s at sf0.1, same JVM, median of
    * 3); per-customer fanout is basket² either way — the q121 a-priori
    * bound.
    */
  private[graft] def buildCoPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val bask = table(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(table(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sv"))
      .distinct()
    val pairs = bask.toDF("c", "sa").join(bask.toDF("c", "sb"), Seq("c"))
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("nc"))
    val thr = pairs.agg(expr("percentile(nc, 0.95D)").as("m"))
    pairs.crossJoin(broadcast(thr)).filter(col("nc") >= col("m"))
  }


  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_cents,
         COUNT(*) AS count_order,
         round(CAST(SUM(l_quantity) AS BIGINT) / COUNT(*), 4) AS avg_qty,
         round(CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) / COUNT(*), 4) AS avg_base_cents
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(l_quantity AS BIGINT) AS quantity,
         strftime(l_shipdate, '%Y-%m-%d') AS ship_date
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1995-07-01' AND l_quantity >= 48
         ORDER BY l_orderkey, l_linenumber""",
    "q03_top_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
         o_orderpriority,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, order_date, o_orderpriority
         ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""",
    "q04_semi_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_quantity >= 50)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_anti_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q06_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
         CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q07_window_topk" ->
      """SELECT o_custkey, rn, o_orderkey, total_cents FROM (
           SELECT o_custkey, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
             CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    // portable relational form of unpivot: one UNION ALL branch per measure
    "q73_unpivot" ->
      """WITH w AS (
           SELECT l_returnflag,
             CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
               AS sum_base_cents,
             COUNT(*) AS n_lines
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, metric, value FROM (
           SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
           UNION ALL
           SELECT l_returnflag, 'sum_base_cents', sum_base_cents FROM w
           UNION ALL
           SELECT l_returnflag, 'n_lines', n_lines FROM w)
         ORDER BY l_returnflag, metric""",
    // string_agg(... ORDER BY) is DuckDB's listagg
    "q208_union_evolve" ->
      """WITH u AS (
           SELECT doc_id, text, lang, NULL AS source, NULL AS n_chars
           FROM documents WHERE doc_id % 3 = 0
           UNION ALL
           SELECT doc_id, text, lang, source, n_chars
           FROM documents WHERE doc_id % 3 <> 0)
         SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_legacy,
           CAST(SUM(coalesce(n_chars, 0)) AS BIGINT) AS chars_known
         FROM u GROUP BY lang ORDER BY lang""",
    "q204_listagg" ->
      """SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
         FROM nation JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    // lower() normalization = the collation-naive spelling of the
    // same case-insensitive semantics
    "q281_not_in_nulls" ->
      """WITH c AS (SELECT c_custkey FROM customer),
           o AS (SELECT o_custkey FROM orders
                 UNION ALL SELECT CAST(NULL AS BIGINT)),
           ne AS (SELECT COUNT(*) AS n FROM c
                  WHERE NOT EXISTS (SELECT 1 FROM o
                                    WHERE o.o_custkey = c.c_custkey)),
           ni AS (SELECT COUNT(*) AS n FROM c
                  WHERE c_custkey NOT IN (SELECT o_custkey FROM o))
         SELECT 'not_exists' AS variant, n FROM ne
         UNION ALL SELECT 'not_in', n FROM ni
         ORDER BY variant""",
    "q282_null_safe_join" ->
      """WITH a AS (SELECT nullif(c_custkey % 50, 0) AS k FROM customer),
           b AS (SELECT nullif(s_suppkey % 50, 0) AS k FROM supplier),
           eq AS (SELECT COUNT(*) AS n FROM a JOIN b ON a.k = b.k),
           ns AS (SELECT COUNT(*) AS n FROM a JOIN b
                  ON a.k IS NOT DISTINCT FROM b.k)
         SELECT 'equi' AS variant, n FROM eq
         UNION ALL SELECT 'null_safe', n FROM ns
         ORDER BY variant""",
    "q205_collation" ->
      """WITH m AS (
           SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_brand)
                       ELSE lower(p_brand) END AS brand_mixed
           FROM part)
         SELECT CAST(COUNT(DISTINCT lower(brand_mixed)) AS BIGINT) AS n_ci,
           CAST(COUNT(DISTINCT brand_mixed) AS BIGINT) AS n_cs,
           CAST(COUNT(CASE WHEN lower(brand_mixed) = 'brand#32'
                      THEN 1 END) AS BIGINT) AS n_eq_ci
         FROM m""",
    // same id/bin integer math replayed serially
    "q129_equidepth_bins" ->
      """WITH t AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (ORDER BY
               CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey) - 1
               AS id,
             COUNT(*) OVER () AS n
           FROM orders)
         SELECT (id * 10) // n AS bin, COUNT(*) AS n_rows,
           CAST(MIN(cents) AS BIGINT) AS lo_cents,
           CAST(MAX(cents) AS BIGINT) AS hi_cents
         FROM t GROUP BY 1 ORDER BY 1""",
    "q71_rank_suite" ->
      """WITH o AS (
           SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice*100) AS BIGINT) AS cents
           FROM orders
           WHERE o_orderdate >= TIMESTAMP '1995-03-01'
             AND o_orderdate < TIMESTAMP '1995-04-01')
         SELECT o_orderkey, o_orderpriority, cents,
           CAST(ntile(4) OVER w AS BIGINT) AS bucket,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           nth_value(o_orderkey, 2) OVER
             (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest
         FROM o
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
         ORDER BY o_orderpriority, cents, o_orderkey""",
    "q08_topk_global" ->
      """SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
         FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q09_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY l_returnflag, l_linestatus""",
    "q10_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         coalesce(l_linestatus, '(all)') AS linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q11_intersect" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
         ORDER BY custkey""",
    "q12_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
         EXCEPT
         SELECT o_custkey AS custkey FROM orders
         ORDER BY custkey""",
    "q13_having" ->
      """SELECT l_suppkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem GROUP BY l_suppkey
         HAVING CAST(SUM(l_quantity) AS BIGINT) > 15500 ORDER BY l_suppkey""",
    "q14_casewhen" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
         CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
         round(CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*), 4) AS big_ratio
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q15_date_agg" ->
      """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
         FROM orders GROUP BY o_year, o_month ORDER BY o_year, o_month""",
    "q29_outer_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
         COUNT(*) AS n_suppliers,
         CAST(SUM(coalesce(cnt, 0)) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_idle_suppliers
         FROM supplier LEFT OUTER JOIN (
           SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey
         ) li ON s_suppkey = l_suppkey
         GROUP BY nationkey ORDER BY nationkey""",
    "q45_cross_join" ->
      """SELECT r_name, COUNT(*) AS n_pairs, MIN(n_name) AS first_nation
         FROM region CROSS JOIN nation
         GROUP BY r_name ORDER BY r_name""",
    "q46_scalar_subquery" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem
         WHERE l_quantity > (SELECT AVG(l_quantity) FROM lineitem) * 1.9
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q16_strings" ->
      """SELECT p_partkey, upper(p_name) AS uname,
         CAST(length(p_name) AS BIGINT) AS namelen,
         substring(p_type, 1, 5) AS type5,
         p_brand || '#' || p_type AS brand_type
         FROM part WHERE p_name LIKE '%a%' AND p_size >= 40
         ORDER BY p_partkey""",
    // full triangle recompute: projection, relative threshold, ordered
    // wedges, closing join, per-node rollup + exact total row
    // q348's contract routed through the staging protocol: the edges
    // emitted from the delta-built GENERATION must equal a from-scratch
    // rebuild over the union input
    "q352_maintained_stage" ->
      """WITH bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p)
         SELECT sa, sb, CAST(nc AS BIGINT) AS nc
         FROM p, st WHERE nc >= m ORDER BY sa, sb""",
    // from-scratch rebuild over the union input: the hash match IS the
    // increment≡rebuild theorem for the maintained pair counts
    // both snapshots recomputed from raw: the as-of read must equal the
    // base-only pair counts, the current read the full ones
    "q363_generation_time_travel" ->
      """WITH bask1 AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey % 10 <> 7),
         p1 AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask1 a JOIN bask1 b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         bask2 AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p2 AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask2 a JOIN bask2 b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2)
         SELECT 'as_of_base' AS snapshot, COUNT(*) AS n_pairs,
           CAST(SUM(nc) AS BIGINT) AS sum_nc,
           CAST(MAX(nc) AS BIGINT) AS max_nc FROM p1
         UNION ALL
         SELECT 'current', COUNT(*),
           CAST(SUM(nc) AS BIGINT), CAST(MAX(nc) AS BIGINT) FROM p2
         ORDER BY snapshot""",
    "q348_copurchase_delta" ->
      """WITH bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p)
         SELECT sa, sb, CAST(nc AS BIGINT) AS nc
         FROM p, st WHERE nc >= m ORDER BY sa, sb""",
    "q179_triangle_count" ->
      """WITH bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p),
         e AS (SELECT sa AS a, sb AS b FROM p, st WHERE nc >= m),
         t AS (
           SELECT e1.a AS x, e1.b AS y, e2.b AS z
           FROM e e1 JOIN e e2 ON e1.b = e2.a
                     JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         n AS (
           SELECT node, COUNT(*) AS cnt FROM (
             SELECT x AS node FROM t
             UNION ALL SELECT y FROM t
             UNION ALL SELECT z FROM t)
           GROUP BY node)
         SELECT node, CAST(cnt AS BIGINT) AS n_triangles FROM n
         UNION ALL
         SELECT -1, CAST((SELECT SUM(cnt) FROM n) / 3 AS BIGINT)
         ORDER BY node""",
    // all three sync rounds replayed: symmetric edges, integer votes,
    // (wv DESC, label) argmax — identical tie rule
    "q183_label_propagation" ->
      """WITH bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p),
         e AS (
           SELECT sa AS src, sb AS dst, nc AS w FROM p, st WHERE nc >= m
           UNION ALL
           SELECT sb, sa, nc FROM p, st WHERE nc >= m),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
         v1 AS (SELECT e.src, l.label, SUM(e.w) AS wv
                FROM e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
         l1 AS (SELECT src AS node, label FROM (
             SELECT src, label, row_number() OVER (PARTITION BY src
               ORDER BY wv DESC, label) AS rk FROM v1) WHERE rk = 1),
         v2 AS (SELECT e.src, l.label, SUM(e.w) AS wv
                FROM e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
         l2 AS (SELECT src AS node, label FROM (
             SELECT src, label, row_number() OVER (PARTITION BY src
               ORDER BY wv DESC, label) AS rk FROM v2) WHERE rk = 1),
         v3 AS (SELECT e.src, l.label, SUM(e.w) AS wv
                FROM e JOIN l2 l ON e.dst = l.node GROUP BY 1, 2),
         l3 AS (SELECT src AS node, label FROM (
             SELECT src, label, row_number() OVER (PARTITION BY src
               ORDER BY wv DESC, label) AS rk FROM v3) WHERE rk = 1)
         SELECT node, label FROM l3 ORDER BY node""",
    "q235_negative_edges" ->
      """WITH ms AS (SELECT MAX(s_suppkey) AS ms FROM supplier),
         cand AS (
           SELECT DISTINCT p.p_partkey AS p,
             (p.p_partkey % 100000 * 2654435761 + i.i * 40503)
               % 100000 % ms.ms + 1 AS cand_s
           FROM part p, ms, generate_series(0, 9) AS i(i)),
         valid AS (
           SELECT c.p, c.cand_s FROM cand c
           JOIN supplier s ON s.s_suppkey = c.cand_s),
         pos AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
                 FROM lineitem)
         SELECT v.p AS p_partkey, CAST(v.cand_s AS BIGINT) AS neg_suppkey
         FROM valid v LEFT JOIN pos e ON e.p = v.p AND e.s = v.cand_s
         WHERE e.p IS NULL
         ORDER BY p_partkey, neg_suppkey""",
    "q243_item_similarity" ->
      """WITH bask0 AS (
           SELECT DISTINCT o.o_custkey AS c, CAST(l.l_suppkey AS BIGINT) AS sv
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         bask AS (
           SELECT c, sv FROM (
             SELECT c, sv,
               ROW_NUMBER() OVER (PARTITION BY c ORDER BY sv) AS rk
             FROM bask0)
           WHERE rk <= 256),
         deg AS (SELECT sv, COUNT(*) AS n1 FROM bask GROUP BY sv),
         pairs AS (
           SELECT a.sv AS sa, b.sv AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.sv <> b.sv
           GROUP BY 1, 2),
         sim AS (
           SELECT p.sa, p.sb,
             round(CAST(p.nc AS DOUBLE) /
               sqrt(CAST(da.n1 * db.n1 AS DOUBLE)), 6) + 0.0 AS sim6
           FROM pairs p JOIN deg da ON da.sv = p.sa
                        JOIN deg db ON db.sv = p.sb),
         r AS (
           SELECT sa, sb, sim6,
             CAST(ROW_NUMBER() OVER (PARTITION BY sa
               ORDER BY sim6 DESC, sb) AS BIGINT) AS rk
           FROM sim)
         SELECT sa, rk, sb, sim6 FROM r WHERE rk <= 3
         ORDER BY sa, rk""",
    // the sync peel replayed: round r+1 keeps nodes with >= 4
    // neighbors among round-r survivors; 30 rounds >> observed
    // convergence, and the fixpoint re-emits itself each round
    "q251_kcore" ->
      """WITH RECURSIVE bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p),
         e0 AS (SELECT sa AS a, sb AS b FROM p, st WHERE nc >= m),
         e AS (SELECT a AS src, b AS dst FROM e0
               UNION ALL SELECT b, a FROM e0),
         alive(round, node) AS (
           SELECT 0, src FROM (SELECT DISTINCT src FROM e)
           UNION ALL
           SELECT t.round + 1, t.src FROM (
             SELECT a.round AS round, e.src AS src, COUNT(*) AS deg
             FROM e JOIN alive a ON a.node = e.src
                    JOIN alive b ON b.node = e.dst AND b.round = a.round
             WHERE a.round < 30
             GROUP BY a.round, e.src) t
           WHERE t.deg >= 4),
         core AS (SELECT node FROM alive WHERE round = 30)
         SELECT e.src AS node, COUNT(*) AS core_deg
         FROM e JOIN core c1 ON c1.node = e.src
                JOIN core c2 ON c2.node = e.dst
         GROUP BY e.src ORDER BY node""",
    // frontier expansion replayed as a bounded-hop recursion; UNION
    // dedups (node, hop) pairs, MIN(hop) collapses to the BFS distance
    "q259_bfs_hops" ->
      """WITH RECURSIVE bask AS (
           SELECT DISTINCT o_custkey AS c, l_suppkey AS s
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         p AS (
           SELECT a.s AS sa, b.s AS sb, COUNT(*) AS nc
           FROM bask a JOIN bask b ON a.c = b.c AND a.s < b.s
           GROUP BY 1, 2),
         st AS (SELECT quantile_cont(nc, 0.95) AS m FROM p),
         e0 AS (SELECT sa AS a, sb AS b FROM p, st WHERE nc >= m),
         sym AS (
           SELECT CAST(a AS BIGINT) AS src, CAST(b AS BIGINT) AS dst
           FROM e0
           UNION ALL
           SELECT CAST(b AS BIGINT), CAST(a AS BIGINT) FROM e0),
         deg AS (SELECT src AS node, COUNT(*) AS dg FROM sym GROUP BY 1),
         s0 AS (
           SELECT node FROM (
             SELECT node, ROW_NUMBER() OVER (ORDER BY dg DESC, node) AS rn
             FROM deg)
           WHERE rn = 1),
         reach(node, hop) AS (
           SELECT node, 0 FROM s0
           UNION
           SELECT sym.dst, r.hop + 1
           FROM reach r JOIN sym ON sym.src = r.node
           WHERE r.hop < 30)
         SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
         FROM reach GROUP BY node ORDER BY node""")
}
