package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.Graft.{deleteRecursively, table}
import graft.ops.{Active911, AsOf, Fixtures}
import graft.streaming.Lookback

/** Advanced operator coverage: as-of join, range/band join, cube &
  * grouping sets, approximate distinct, and a Structured-Streaming-
  * executed aggregation whose result is checked against a batch SQL
  * oracle (SURVEY.md §2.4 J3, §2.6 A4, §2.10).
  */
object Advanced {

  private[queries] def events(s: SparkSession, d: String): DataFrame =
    graft.Graft.normalizeTs(table(s, d, "events"))


  /** Shared by q27 (union+window) and q130 (native operator): both
    * implementations must land on this exact relation.
    */
  private val AsofOracleSql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         FROM events),
       u AS (
         SELECT event_id, user_id, us, 1 AS side, NULL::BIGINT AS click_id
         FROM ev WHERE event_type = 'purchase'
         UNION ALL
         SELECT event_id, user_id, us, 0 AS side, event_id AS click_id
         FROM ev WHERE event_type = 'click'),
       c AS (
         SELECT event_id, user_id, side,
           last_value(CASE WHEN side = 0 THEN click_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY us, side, event_id
                   ROWS UNBOUNDED PRECEDING) AS prior_click_id
         FROM u)
       SELECT event_id, user_id, prior_click_id
       FROM c WHERE side = 1 ORDER BY event_id"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // As-of join: each purchase matched to the user's most recent prior
    // (or simultaneous) click — union+window plan, single shuffle.
    "q27_asof_join" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("us"))
      AsOf.asofJoin(purchases, clicks, keyCol = "user_id", timeCol = "us",
          tieCol = "event_id", rightTieCol = "click_id",
          valueCols = Map("click_id" -> "prior_click_id"))
        .select(col("event_id"), col("user_id"), col("prior_click_id"))
        .orderBy(col("event_id"))
    }),

    // The SAME as-of semantics on the native merge-scan operator
    // (graft.plans.AsOfJoin: marker condition → planner strategy →
    // AsOfJoinExec; SURVEY §2.13 whole-operator tier). One
    // co-partitioning exchange like q27, but O(1) state per partition
    // instead of a window frame. Must land on q27's oracle exactly.
    "q130_asof_native" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("us"))
      AsOf.asofJoinNative(purchases, clicks, keyCol = "user_id",
          timeCol = "us", tieCol = "event_id", rightTieCol = "click_id",
          valueCols = Map("click_id" -> "prior_click_id"))
        .select(col("event_id"), col("user_id"), col("prior_click_id"))
        .orderBy(col("event_id"))
    }),

    // FORWARD as-of with tolerance (AsOf.asofJoinForward): each
    // purchase attributed to the user's NEXT error within 1 hour —
    // pandas merge_asof(direction='forward', tolerance=1h) semantics,
    // the post-event attribution q27/q130 can't spell (their carry
    // looks backward). Same single union+exchange plan traversed in
    // descending time; the tolerance gate is a residual projection on
    // the carried match time, not a second join.
    "q181_asof_forward" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("us"))
      val errors = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("err_id"), col("user_id"), col("us"))
      AsOf.asofJoinForward(purchases, errors, keyCol = "user_id",
          timeCol = "us", tieCol = "event_id", rightTieCol = "err_id",
          valueCols = Map("err_id" -> "next_err_id"),
          toleranceUs = 3600L * 1000000L)
        .select(col("event_id"), col("user_id"), col("next_err_id"),
          (col("_asof_time") - col("us")).as("lag_us"))
        .orderBy(col("event_id"))
    }),

    // Band/range join: lineitem prices against a broadcast band dim.
    "q28_range_join" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("p0_20k", 0.0, 20000.0), ("p20_40k", 20000.0, 40000.0),
        ("p40_60k", 40000.0, 60000.0), ("p60_80k", 60000.0, 80000.0),
        ("p80k_up", 80000.0, 1e12)).toDF("band", "lo", "hi")
      AsOf.bandJoin(table(s, d, "lineitem"), bands, col("l_extendedprice"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
        .orderBy(col("band"))
    }),

    // CUBE with grouping-id (all four grouping-set combinations).
    "q17_cube" -> ((s, d) => {
      table(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Explicit GROUPING SETS — a non-hierarchy set ((a),(b)) that neither
    // rollup (q10) nor cube (q17) exercises (SURVEY.md §2.6 A4).
    "q54_grouping_sets" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast("long").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("sum_qty"), col("n"), col("gid"))
        .orderBy(col("returnflag"), col("linestatus"))
    }),

    // Salted two-stage aggregation (the static skew remedy, SURVEY.md
    // §7.5): the rewrite must be invisible in the result, so the oracle
    // is the PLAIN aggregation — the driver machine-checks semantics
    // preservation. Partials are exact longs, so the split-then-merge
    // introduces no float reordering.
    "q55_salted_agg" -> ((s, d) => {
      graft.ops.Salt.saltedAgg(
          table(s, d, "lineitem")
            .select(col("l_returnflag"), col("l_quantity"),
              col("l_orderkey"), col("l_linenumber")),
          col("l_returnflag"), buckets = 16,
          partial = Seq(
            sum(col("l_quantity")).cast("long") -> "sum_qty",
            count(lit(1)) -> "n"),
          merge = Seq(
            "sum_qty" -> (c => sum(c).cast("long")),
            "n" -> (c => sum(c))))
        .withColumnRenamed("__key", "returnflag")
        .orderBy(col("returnflag"))
    }),

    // Skew-resistant equi-join (Salt.skewJoin): the big side is split
    // into sub-keys by a deterministic row hash, the small side
    // replicated once per bucket — the static remedy when one hot probe
    // key floods a single task and AQE can't rewrite (broadcast-hash
    // path). The rewrite must be invisible in the result, so the oracle
    // is the PLAIN join + aggregation, mirroring q55's treatment of
    // saltedAgg; ScaleSpec asserts the salt actually spreads a hot key.
    "q98_skew_join" -> ((s, d) => {
      val li = table(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"))
      val pt = table(s, d, "part").filter(col("p_size") <= 10)
        .select(col("p_partkey"), col("p_size"))
      graft.ops.Salt.skewJoin(li, pt, "l_partkey", "p_partkey", buckets = 8)
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("p_size"))
    }),

    // Join-key skew diagnostic (ops/Diagnose): the measurement that
    // picks between a plain shuffle join and q98's salted rewrite.
    // Per-key histogram = the join's own shuffle minus the payload
    // (two-stage hash agg); top-K = TakeOrderedAndProject; the one-row
    // summary broadcasts over the K result rows.
    "q104_skew_diagnostic" -> ((s, d) =>
      graft.ops.Diagnose.keyHistogram(table(s, d, "orders"),
          col("o_custkey"), topK = 15)
        .orderBy(col("cnt").desc, col("key"))),

    // Count-min sketch (spark-sketch) — the frequency-estimate member
    // of the sketch family (q43 HLL distinct, q76 HLL merge, q81
    // Misra-Gries heavy hitters, q118 exact bitmaps): one codegen'd
    // mergeable aggregate builds the sketch (O(width·depth) partials —
    // the 100 TB shape), the driver deserializes the KB-sized result
    // (bounded driver material, like the k-means centroids), and the
    // top-10 exact-count keys are probed against it. CMS guarantees
    // est ≥ exact always, and est ≤ exact + eps·N with confidence
    // 1−δ per key; with a FIXED seed both contracts are deterministic
    // per SF, so the oracle pins them TRUE alongside the
    // DuckDB-recomputable exact counts (est itself is
    // sketch-hash-derived — the q41/q44 contract-oracle stance).
    "q203_count_min" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      val skBytes = li.agg(
          expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)"))
        .head().getAs[Array[Byte]](0)
      val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(skBytes))
      val epsN = math.ceil(0.001 * li.count()).toLong
      // top-10 keys probed DRIVER-side against the deserialized sketch
      // (10 bounded rows — the q197 materialize pattern; avoids a udf
      // for a probe the driver already holds the sketch for)
      val top = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("l_partkey")).limit(10)
        .collect().map { r =>
          val k = r.getLong(0); val exact = r.getLong(1)
          val e = cms.estimateCount(k)
          (k, exact, e >= exact, e <= exact + epsN)
        }.toSeq
      import s.implicits._
      top.toDF("l_partkey", "n_exact", "lower_ok", "upper_ok")
        .orderBy(col("n_exact").desc, col("l_partkey"))
    }),

    // Approximate distinct (HLL++) vs exact. The raw HLL estimate is not
    // DuckDB-recomputable (different sketch), so the oracle pins the
    // exact column plus the accuracy CONTRACT: `approx_ok` must be
    // literally true (within 5% of exact — 2.5σ at rsd=0.02; the HLL
    // merge is order-independent, so the Spark value is deterministic).
    // A sketch regression flips the row red in CORRECTNESS.
    "q43_approx_distinct" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("approx") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("approx_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // DataSketches HLL with explicit shard-level sketches UNIONED into
    // the group total — the 100 TB pattern where per-partition/per-day
    // sketches are stored compact and merged on demand instead of
    // re-scanning raw data. Contract oracle (like q43): exact distinct
    // is DuckDB-recomputable; the merged-across-shards estimate and the
    // single-pass global estimate must each land within 5% of exact
    // (lgK=14 → rse ≈ 0.8%, so 5% is deterministic slack; shard-merge
    // and global sketches may differ by a hair — both are pinned).
    "q76_hll_mergeability" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      val shards = li
        .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(8)).as("sh"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("sk"))
      val merged = shards.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_merged"))
      val global = li.groupBy(col("l_returnflag"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(14)))
          .as("est_global"),
          countDistinct(col("l_partkey")).as("n_exact"))
      merged.join(global, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("est_merged") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("merged_ok"),
          (abs(col("est_global") - col("n_exact")) <= col("n_exact") * 0.05)
            .as("global_ok"))
        .orderBy(col("l_returnflag"))
    }),

    // Z-order (Morton) clustering key over (user, hour) via the native
    // graft_zorder expression — the multi-dimensional layout key: range-
    // partitioning by zkey co-locates rows close in BOTH dimensions so
    // row-group stats prune user×time predicates (q80 proves the
    // file-layout side; this pins the key math). Oracle recomputes the
    // interleave arithmetically (no bit ops needed in SQL).
    "q88_zorder_key" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(65536L)).as("x"),
          pmod(expr("unix_micros(ts) div 3600000000"), lit(65536L)).as("y"))
        .withColumn("zkey",
          call_function(graft.expr.GraftFunctions.ZOrderName,
            col("x"), col("y")))
        .orderBy(col("event_id"))
    }),

    // Layout skipping sweep (r9, §7.6): WHICH clustering layout to
    // pick, measured — the zone-map model of parquet min/max file
    // pruning, exact integers end-to-end. Four layouts of the same
    // (x, y) = (user bucket, hour bucket) keys — linear-by-x,
    // linear-by-y, Morton z-order, Hilbert — each bucketed into 64
    // equal-WIDTH key ranges (the range-partitioned-files model;
    // value-range bucketing needs NO global sort, so the model itself
    // is scan-parallel at 100 TB, unlike a rank-ntile spelling). Per
    // bucket: min/max of both dims (the zone map); per predicate
    // (x-range / y-range / xy-box): a bucket is touched iff its box
    // intersects the predicate box. The Morton interleave is spelled
    // in SHIFT/AND arithmetic that BOTH engines compute (the native
    // graft_zorder expression stays pinned by q88 — here the oracle
    // must replay the key, so the query uses the portable spelling);
    // the Hilbert leg uses the native graft_hilbert expression and
    // the oracle replays the identical xy2d rotation recurrence as a
    // recursive CTE over the DISTINCT (x, y) pairs (zone maps are
    // min/max — multiplicity-free, so the 65536-pair grid is all the
    // oracle must key). Every output cell is hash-exact: this is a
    // measured comparison, not a pinned-tendency contract. The
    // expected shape — linear-x prunes x-predicates best but cannot
    // prune y at all; both space-filling curves prune BOTH dims — is
    // visible in the skipped_permille column, reproducibly. At width
    // 1024 = 4^5 the two curves are INDISTINGUISHABLE by construction
    // (every bucket is the same axis-aligned 32x32 tile for both), so
    // the sweep adds a misaligned-width pair (768, not a power of 4):
    // there a Morton bucket straddles Z-jumps (wide zone boxes) while
    // a Hilbert bucket stays a contiguous curve segment (compact
    // blob) — full-grid truth: hilbert_w768 skips 883/872/988 permille
    // vs zorder_w768's 848/813/965 on x/y/box. THAT gap is why the
    // Hilbert leg exists.
    "q343_layout_skipping" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      val base = events(s, d).select(
          pmod(col("user_id"), lit(256L)).as("xq"),
          pmod(expr("unix_micros(ts) div 3600000000"), lit(256L)).as("yq"))
        .withColumn("zkey",
          (0 until 8).map(i =>
            shiftleft(shiftright(col("xq"), i).bitwiseAND(lit(1L)), 2 * i + 1) +
              shiftleft(shiftright(col("yq"), i).bitwiseAND(lit(1L)), 2 * i))
            .reduce(_ + _))
        .withColumn("hkey",
          call_function(graft.expr.GraftFunctions.HilbertName,
            col("xq"), col("yq"), lit(8)))
      def zoneMap(name: String, bucket: Column): DataFrame =
        base.groupBy(bucket.as("b"))
          .agg(min(col("xq")).as("x0"), max(col("xq")).as("x1"),
            min(col("yq")).as("y0"), max(col("yq")).as("y1"))
          .withColumn("layout", lit(name))
      val zones = zoneMap("linear_x", expr("xq div 4"))
        .unionByName(zoneMap("linear_y", expr("yq div 4")))
        .unionByName(zoneMap("zorder", expr("zkey div 1024")))
        .unionByName(zoneMap("hilbert", expr("hkey div 1024")))
        .unionByName(zoneMap("zorder_w768", expr("zkey div 768")))
        .unionByName(zoneMap("hilbert_w768", expr("hkey div 768")))
      val preds = {
        import s.implicits._
        Seq(("x_range", 16L, 31L, 0L, 255L),
          ("y_range", 0L, 255L, 16L, 31L),
          ("xy_box", 16L, 31L, 16L, 31L))
          .toDF("pred", "px0", "px1", "py0", "py1")
      }
      zones.crossJoin(broadcast(preds))
        .groupBy(col("layout"), col("pred"))
        .agg(count(lit(1)).as("n_buckets"),
          sum((col("x1") >= col("px0") && col("x0") <= col("px1") &&
            col("y1") >= col("py0") && col("y0") <= col("py1"))
            .cast("long")).as("touched"))
        .withColumn("skipped_permille",
          expr("((n_buckets - touched) * 1000) div n_buckets"))
        .orderBy(col("layout"), col("pred"))
    }),

    // Bloom-filtered join (graft.ops.BloomJoin): urgent orders join
    // lineitem with the fact side pruned through a Bloom filter of the
    // selective dim's keys before the shuffle. Result must equal the
    // plain join (no false negatives) — that IS the oracle.
    "q74_bloom_join" -> ((s, d) => {
      val urgent = table(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = table(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_quantity"))
      graft.ops.BloomJoin.join(li, urgent, "l_orderkey", "o_orderkey",
          expectedDimRows = 200000L)
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("cents"))
        .orderBy(col("o_year"))
    }),

    // Custom bounded top-k UDAF (graft.expr.TopKByScore, §2.13): top-5
    // orders by value per priority class through a typed Aggregator —
    // O(k) state per group at every stage (vs collect_list's O(n)),
    // partial+final ObjectHashAggregate asserted in AggregatorSpec.
    // Oracle: the row_number window formulation must agree exactly.
    "q68_topk_aggregator" -> ((s, d) => {
      val topk = udaf(new graft.expr.TopKByScore(5),
        graft.expr.TopKByScore.inputEncoder)
      table(s, d, "orders")
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("score"),
          col("o_orderkey").as("id"))
        .groupBy(col("o_orderpriority"))
        .agg(topk(col("score"), col("id")).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top")).as(Seq("pos", "row")))
        .select(col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rank"),
          col("row.id").as("o_orderkey"),
          col("row.score").as("cents"))
        .orderBy(col("o_orderpriority"), col("rank"))
    }),

    // MERGE INTO (upsert/delete) as a batch operator (graft.ops.Merge):
    // base = customer balances; change feed derived deterministically
    // from post-1995 orders — custkey%10==0 deletes, the rest increment
    // the balance, and key-shifted copies insert as new accounts. The
    // oracle replays the same merge relationally in DuckDB. All money
    // in exact integer cents (oracle determinism rules).
    "q67_merge_upsert" -> ((s, d) => {
      val base = table(s, d, "customer").select(
        col("c_custkey").as("key"),
        round(col("c_acctbal") * 100, 0).cast("long").as("bal_cents"),
        col("c_mktsegment").as("segment"))
      val delta = table(s, d, "orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")))
        .groupBy(col("o_custkey").as("key"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("delta"))
      val upd = delta.filter(pmod(col("key"), lit(10)) =!= 0)
        .select(col("key"), lit("U").as("op"), col("delta"),
          lit(null).cast("string").as("segment"))
      val del = delta.filter(pmod(col("key"), lit(10)) === 0)
        .select(col("key"), lit("D").as("op"),
          lit(null).cast("long").as("delta"),
          lit(null).cast("string").as("segment"))
      val ins = delta.select((col("key") + 10000000L).as("key"),
        lit("I").as("op"), col("delta"), lit("(new)").as("segment"))
      graft.ops.Merge.merge(
          base.withColumnRenamed("bal_cents", "bal"),
          upd.unionByName(del).unionByName(ins)
            .withColumnRenamed("delta", "bal"),
          keyCol = "key", opCol = "op", valueCols = Seq("bal", "segment"),
          onUpdate = Map(
            "bal" -> (col("b.bal") + coalesce(col("c.bal"), lit(0L))),
            "segment" -> col("b.segment")),
          onInsert = Map(
            "bal" -> col("c.bal"),
            "segment" -> col("c.segment")))
        .withColumnRenamed("bal", "bal_cents")
        .orderBy(col("key"))
    }),

    // Exact distinct counting via bitmap aggregation — the mergeable
    // EXACT alternative to HLL (q43) and to count_distinct's single
    // distinct-shuffle: keys bucket into 32k-bit bitmaps, per-bucket
    // partial bitmaps OR together (map-side combinable, MV-friendly),
    // and the count is a popcount sum. Two cheap hash aggs, no
    // distinct expansion of the raw keys.
    "q118_bitmap_distinct" -> ((s, d) => {
      val c = table(s, d, "customer")
        .select(col("c_mktsegment").as("segment"), col("c_custkey").as("key"))
      c.groupBy(col("segment"), expr("bitmap_bucket_number(key)").as("b"))
        .agg(expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(key)))")
          .as("cnt"))
        .groupBy(col("segment"))
        .agg(sum(col("cnt")).as("n_distinct"))
        .orderBy(col("segment"))
    }),

    // Incremental materialized-view maintenance: the MV state (per-lang
    // counts/sums/max + per-bucket DISTINCT bitmaps) is kept in
    // ALGEBRAIC partial form, so a delta batch folds in by aggregating
    // ONLY the delta and merging O(groups) state rows — SUM/MAX re-agg
    // for scalars, bitmap_or_agg for exact distincts. The base is never
    // rescanned on update; here both sides are derived in-query from
    // disjoint slices (no stored state in a test harness), but the
    // merge path is exactly the production shape, and the oracle pins
    // it to the from-scratch aggregate over the whole table.
    "q131_mv_merge" -> ((s, d) => {
      val docs = table(s, d, "documents")
        .withColumn("src_id",
          regexp_extract(col("source"), "([0-9]+)", 1).cast("long"))
      val base = docs.filter(pmod(col("doc_id"), lit(10)) =!= 7)
      val delta = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      def scalarMv(df: DataFrame) = df.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("chars"),
          max(col("n_chars")).as("max_chars"))
      def bitmapMv(df: DataFrame) = df
        .groupBy(col("lang"), expr("bitmap_bucket_number(src_id)").as("b"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(src_id))").as("bm"))
      val scalars = scalarMv(base).unionByName(scalarMv(delta))
        .groupBy(col("lang"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("chars")).as("chars"),
          max(col("max_chars")).as("max_chars"))
      val distincts = bitmapMv(base).unionByName(bitmapMv(delta))
        .groupBy(col("lang"), col("b"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy(col("lang"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_sources"))
      scalars.join(distincts, Seq("lang")).orderBy(col("lang"))
    }),

    // JOIN-view incremental maintenance (r8, §7.6) — the harder IVM
    // class beside q131's single-table MV: the view is
    // orders ⋈ customer rolled up per market segment, and an appended
    // fact batch must be folded in WITHOUT rescanning the base fact.
    // Classic delta algebra for insert-only facts against a stable
    // dim: ΔV = ΔF ⋈ D aggregated to the same partial shapes, then
    // merged by partial re-aggregation — SUM/COUNT add, MAX maxes
    // (insert-only makes MAX maintainable), exact COUNT DISTINCT
    // merges through bitmap partials (q118/q131's machinery — the ONE
    // aggregate that would otherwise force a full recompute), and AVG
    // derives from maintained sums (never maintained directly). The
    // base partials are localCheckpoint'ed — the materialized MV — so
    // the delta path provably touches only ΔF ⋈ D (|Δ|-sized work at
    // 100 TB, the whole point of IVM). Oracle = the from-scratch join
    // rollup over ALL facts: the IVM contract in one hash compare.
    "q336_join_mv_delta" -> ((s, d) => {
      val cust = table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ord = table(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val base = ord.filter(pmod(col("o_orderkey"), lit(10)) =!= 7)
      val delta = ord.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      def scalarMv(f: DataFrame): DataFrame = f
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("rev"),
          max(col("cents")).as("mx"))
      def bitmapMv(f: DataFrame): DataFrame = f
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"),
          expr("bitmap_bucket_number(c_custkey)").as("b"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(c_custkey))")
          .as("bm"))
      val baseScalar = scalarMv(base).localCheckpoint(true)
      val baseBitmap = bitmapMv(base).localCheckpoint(true)
      val scalars = baseScalar.unionByName(scalarMv(delta))
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n_orders")).as("n_orders"),
          sum(col("rev")).as("rev_cents"), max(col("mx")).as("max_cents"))
      val distincts = baseBitmap.unionByName(bitmapMv(delta))
        .groupBy(col("c_mktsegment"), col("b"))
        .agg(expr("bitmap_or_agg(bm)").as("bm"))
        .groupBy(col("c_mktsegment"))
        .agg(sum(expr("bitmap_count(bm)")).as("n_customers"))
      scalars.join(distincts, Seq("c_mktsegment"))
        .withColumn("avg4", round(col("rev_cents").cast("double") /
          col("n_orders").cast("double") / lit(100.0), 4))
        .orderBy(col("c_mktsegment"))
    }),

    // DELETE-capable join-view IVM (r9, VERDICT-r8 #5) — q336 handles
    // insert-only deltas; this is the counting-maintenance form for a
    // MIXED batch (inserts +1 / deletes −1) against the same
    // orders ⋈ customer rollup:
    //  - COUNT/SUM: the delta aggregates SIGNED partials (sum of signs,
    //    sum of sign·cents) and merges algebraically — |Δ|-sized, the
    //    base partials never rescanned;
    //  - exact COUNT DISTINCT: bitmap partials are monotone and cannot
    //    delete, so the counting form keeps per-(group, customer)
    //    SUPPORT counts; the batch merges signed supports and a
    //    customer survives while support > 0 (the classic counting
    //    algorithm — state is O(distinct pairs), the price of exact
    //    distinct under deletes);
    //  - MAX/MIN: a delete can remove the extremum, so they are not
    //    maintainable through partials at all — re-derived ONLY for
    //    groups the batch touched, via a broadcast semi-join that
    //    group-prunes the rescan of the post-batch fact state (segment
    //    partition pruning at 100 TB); untouched groups keep their
    //    stored extrema via the anti-join.
    // Groups whose merged count hits 0 drop out (filter n > 0). Oracle
    // = the from-scratch rollup over the post-batch fact set (orders
    // with o_orderkey % 10 <> 3): the delete-IVM contract in one hash.
    "q339_join_mv_deletes" -> ((s, d) => {
      val cust = table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ord = table(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val base = ord.filter(pmod(col("o_orderkey"), lit(10)) =!= 7)
      val ins = ord.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      def enrich(f: DataFrame): DataFrame =
        f.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      // stored MV state (localCheckpoint = the materialization)
      val baseScalar = enrich(base).groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("rev"),
          max(col("cents")).as("mx"), min(col("cents")).as("mn"))
        .localCheckpoint(true)
      val baseSupport = enrich(base)
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(count(lit(1)).as("sup")).localCheckpoint(true)
      // the mixed batch, signed
      val signed = enrich(ins).withColumn("sign", lit(1L))
        .unionByName(enrich(del).withColumn("sign", lit(-1L)))
      val deltaScalar = signed.groupBy(col("c_mktsegment"))
        .agg(sum(col("sign")).as("n"),
          sum(col("sign") * col("cents")).as("rev"))
      val deltaSupport = signed
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("sign")).as("sup"))
      val mergedNR = baseScalar
        .select(col("c_mktsegment"), col("n"), col("rev"))
        .unionByName(deltaScalar)
        .groupBy(col("c_mktsegment"))
        .agg(sum(col("n")).as("n_orders"), sum(col("rev")).as("rev_cents"))
        .filter(col("n_orders") > 0)
      val nCust = baseSupport
        .unionByName(deltaSupport)
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(col("sup")).as("sup"))
        .filter(col("sup") > 0)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
      val touched = signed.select(col("c_mktsegment")).distinct()
        .localCheckpoint(true)
      val postFacts = base.join(del.select(col("o_orderkey")),
          Seq("o_orderkey"), "left_anti")
        .unionByName(ins)
      val touchedExt = enrich(postFacts)
        .join(broadcast(touched), Seq("c_mktsegment"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(max(col("cents")).as("mx"), min(col("cents")).as("mn"))
      val untouchedExt = baseScalar
        .select(col("c_mktsegment"), col("mx"), col("mn"))
        .join(broadcast(touched), Seq("c_mktsegment"), "left_anti")
      mergedNR.join(nCust, Seq("c_mktsegment"))
        .join(touchedExt.unionByName(untouchedExt), Seq("c_mktsegment"))
        .select(col("c_mktsegment"), col("n_orders"), col("rev_cents"),
          col("mx").as("max_cents"), col("mn").as("min_cents"),
          col("n_customers"))
        .withColumn("avg4", round(col("rev_cents").cast("double") /
          col("n_orders").cast("double") / lit(100.0), 4))
        .orderBy(col("c_mktsegment"))
    }),

    // Minimal-trigger extrema maintenance under retraction (r9, §7.6
    // backlog item #2 — tightens q339): q339 rescans MAX/MIN for EVERY
    // batch-touched group. But a delete can only move a group's MAX if
    // it retracts the LAST base row carrying the stored maximum — so
    // the stored state is widened by one integer per extremum (the
    // SUPPORT at the stored extreme value, n_at_mx/n_at_mn) and the
    // rescan fires only when the batch's deletions at that value
    // exhaust it (d_at_mx == n_at_mx). Everything else is pure
    // incremental algebra: inserts fold via greatest/least (MAX is
    // monotone under inserts), survivors certify the stored value.
    // The trigger is minimal for this state class: with only
    // (extreme, support-at-extreme) stored, any weaker condition
    // either misses a true extremum change or rescans a group whose
    // stored value is still certified. Both the booleans and the
    // final extrema are oracle-replayed, so a wrong trigger (either
    // direction) hash-mismatches: a missed rescan leaves a stale max,
    // a spurious one flips the boolean column. At 100 TB the rescan
    // set is the provably-affected groups only — with per-group
    // support carried in the MV, retraction storms that never touch
    // an extremum cost zero base rescans (q339's version rescans
    // every touched group).
    "q347_extrema_support_ivm" -> ((s, d) => {
      val cust = table(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val ord = table(s, d, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val base = ord.filter(pmod(col("o_orderkey"), lit(10)) =!= 7)
      val ins = ord.filter(pmod(col("o_orderkey"), lit(10)) === 7)
      val del = base.filter(pmod(col("o_orderkey"), lit(10)) === 3)
      def enrich(f: DataFrame): DataFrame =
        f.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("g"), col("cents"),
            col("o_orderkey"))
      val postFacts = base.join(del.select(col("o_orderkey")),
          Seq("o_orderkey"), "left_anti")
        .unionByName(ins)
      extremaSupportView(enrich(base), enrich(ins), enrich(del),
          enrich(postFacts))
        .select(col("g").as("c_mktsegment"), col("max_cents"),
          col("min_cents"), col("rescanned_max"), col("rescanned_min"))
        .orderBy(col("c_mktsegment"))
    }),

    // Spark 4 VARIANT ingestion of the JSON-ish props payload:
    // parse_json ONCE into the open binary variant encoding, then typed
    // variant_get extraction — the modern replacement for per-field
    // get_json_object / regexp re-parsing (each of which re-tokenizes
    // the document). At 100 TB the parse is a narrow codegen'd pass;
    // extraction is O(field) over the shredded binary, and a corpus
    // stored AS variant pushes field access down to the scan. Oracle:
    // DuckDB's JSON extraction over the same strings.
    "q123_variant_extract" -> ((s, d) => {
      events(s, d)
        .select(col("event_type"), parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"),
          sum(when(col("k") === 0, 1L).otherwise(0L)).as("n_zero"))
        .orderBy(col("event_type"))
    }),

    // Binned fact×fact interval join — the BATCH scale path for
    // point-in-interval predicates (q65 is the streaming form). Each
    // purchase opens a 2-hour attribution window; matching clicks are
    // found by keying clicks to their OWN hour bin and exploding each
    // window over the ≤3 bins it covers, so the theta predicate becomes
    // an equi-join on (user, bin) + a residual filter. A click has
    // exactly one bin, so a pair can match at most once — no dedup
    // pass. The bin key also bounds per-user fanout: a hot user's rows
    // spread over their time bins instead of colliding on one join key
    // (the skew that kills plain user-keyed interval joins at scale).
    "q125_binned_interval_join" -> ((s, d) => {
      val ev = events(s, d).withColumn("us", unix_micros(col("ts")))
      val winUs = 2L * 3600L * 1000000L
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("us").as("click_us"), expr("us div 3600000000").as("bin"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("us").as("p_us"))
        .withColumn("bin", explode(sequence(
          expr(s"(p_us - ${winUs}L) div 3600000000"),
          expr("p_us div 3600000000"))))
      clicks.join(purchases, Seq("user_id", "bin"))
        .filter(col("click_us") >= col("p_us") - winUs &&
          col("click_us") <= col("p_us"))
        .select(col("click_id"), col("purchase_id"), col("user_id"),
          (col("p_us") - col("click_us")).as("lag_us"))
        .orderBy(col("click_id"), col("purchase_id"))
    }),

    // Deequ-style data-quality constraint suite (graft.ops.Audit): the
    // WHOLE suite for lineitem — row count, key uniqueness, per-column
    // null / accepted-value / bounds violations — is ONE fused
    // aggregate over one scan, plus two anti-join referential-integrity
    // counts. Bounds/accepted sets are chosen so both passing AND
    // failing checks appear (an all-green audit can't catch an
    // always-true bug).
    "q114_quality_audit" -> ((s, d) => {
      val li = table(s, d, "lineitem")
      val suite = graft.ops.Audit.tableAudit(li,
        uniqueKey = Seq("l_orderkey", "l_linenumber"),
        notNull = Seq("l_orderkey", "l_partkey", "l_shipdate"),
        accepted = Map("l_returnflag" -> Seq("A", "N", "R"),
          "l_linestatus" -> Seq("O")),
        bounds = Map("l_quantity" -> (1.0, 25.0), "l_discount" -> (0.0, 0.1)))
      val ri1 = graft.ops.Audit.refIntegrity(table(s, d, "orders"),
        "o_custkey", table(s, d, "customer"), "c_custkey", "ref_integrity")
      val ri2 = graft.ops.Audit.refIntegrity(li, "l_orderkey",
        table(s, d, "orders"), "o_orderkey", "ref_integrity")
      suite.unionByName(ri1).unionByName(ri2)
        .orderBy(col("check"), col("target"))
    }),

    // CDC snapshot diff (graft.ops.Audit.snapshotDiff): two order
    // snapshots derived deterministically from the same table (adds,
    // removes, price/status mutations), diffed with ONE full-outer
    // join + null-safe per-column change flags, rolled up to
    // per-status counts with per-column change totals.
    "q115_snapshot_diff" -> ((s, d) => {
      val ord = table(s, d, "orders").select(col("o_orderkey").as("key"),
        round(col("o_totalprice") * 100, 0).cast("long").as("price_cents"),
        col("o_orderstatus").as("ostatus"))
      val oldS = ord.filter(pmod(col("key"), lit(10)) =!= 3)
      val newS = ord.filter(pmod(col("key"), lit(10)) =!= 7)
        .withColumn("price_cents",
          when(pmod(col("key"), lit(5)) === 0, col("price_cents") + 100L)
            .otherwise(col("price_cents")))
        .withColumn("ostatus",
          when(pmod(col("key"), lit(11)) === 0, lit("X"))
            .otherwise(col("ostatus")))
      graft.ops.Audit.snapshotDiff(oldS, newS, "key",
          Seq("price_cents", "ostatus"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("chg_price_cents")).cast("long").as("n_price_chg"),
          sum(col("chg_ostatus")).cast("long").as("n_status_chg"))
        .orderBy(col("status"))
    }),

    // Pure-SQL gateway path: the whole query is ONE spark.sql() string
    // over registered temp views, using a graft native function from
    // SQL — how a SQL-only user (JDBC/Thrift gateway, notebook) drives
    // this library. Exercises view registration + the SQL parser over
    // the same Catalyst plans the DataFrame entries produce.
    "q90_sql_gateway" -> ((s, d) => {
      graft.expr.GraftFunctions.register(s)
      table(s, d, "documents").createOrReplaceTempView("g_documents")
      s.sql("""
        SELECT lang,
               COUNT(*) AS n_docs,
               SUM(CASE WHEN length(graft_normalize(text)) = length(text)
                        THEN 1 ELSE 0 END) AS n_nfc_clean,
               CAST(SUM(n_chars) AS BIGINT) AS chars,
               CAST(floor(percentile(n_chars, 0.5)) AS BIGINT) AS p50
        FROM g_documents
        WHERE n_chars > 100
        GROUP BY lang
        ORDER BY lang""")
    }),

    // Spark 4 SQL-defined UDFs (CREATE FUNCTION ... RETURNS ... RETURN
    // expr): catalog-resident scalar functions authored IN SQL — the
    // surface that lets query authors package expression logic with no
    // JVM code. Declared temporary here (session catalog), one function
    // calling the other so nested resolution is exercised; the analyzer
    // INLINES the bodies, so the physical plan is identical to writing
    // the expressions by hand — zero per-row call overhead, full
    // codegen. Money stays in exact BIGINT cents so SUM order can't
    // drift. Oracle: the UDF bodies inlined as plain SQL.
    "q211_sql_udf" -> ((s, d) => {
      table(s, d, "lineitem").createOrReplaceTempView("g_lineitem")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION g_disc_cents(
                 p DOUBLE, disc DOUBLE) RETURNS BIGINT
               RETURN CAST(round(p * (1 - disc) * 100, 0) AS BIGINT)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION g_charge_cents(
                 p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS BIGINT
               RETURN CAST(round(g_disc_cents(p, disc) * (1 + tax), 0)
                           AS BIGINT)""")
      s.sql("""
        SELECT l_returnflag AS flag,
               SUM(g_disc_cents(l_extendedprice, l_discount)) AS disc_cents,
               SUM(g_charge_cents(l_extendedprice, l_discount, l_tax))
                 AS charge_cents,
               COUNT(*) AS n
        FROM g_lineitem
        GROUP BY l_returnflag ORDER BY flag""")
    }),

    // Parameterized SQL (Spark 3.4+/4): named-parameter binding via
    // spark.sql(text, args) plus the IDENTIFIER() clause for the table
    // name — the injection-safe front door for templated queries (a
    // string-spliced table name or literal is the classic SQL-injection
    // hole; parameter markers bind VALUES, IDENTIFIER binds NAMES, and
    // the analyzer rejects anything else). Same relational result as
    // the literal spelling, which is exactly what the oracle runs.
    "q214_parameterized_sql" -> ((s, d) => {
      table(s, d, "documents").createOrReplaceTempView("g_docs_param")
      s.sql(
        """SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars
           FROM IDENTIFIER(:tbl) WHERE n_chars >= :minc
           GROUP BY lang ORDER BY lang""",
        Map("tbl" -> "g_docs_param", "minc" -> 120))
    }),

    // Spark 4 SQL session variables + EXECUTE IMMEDIATE: a threshold is
    // computed INTO a session variable (SET VAR with a scalar subquery)
    // and consumed by dynamic SQL through a USING bind — the catalog-
    // level state surface for multi-statement SQL sessions (vs q214's
    // per-call parameter map). DECLARE OR REPLACE keeps the entry
    // idempotent inside the shared Verify session.
    "q215_session_variables" -> ((s, d) => {
      table(s, d, "documents").createOrReplaceTempView("g_docs_var")
      s.sql("DECLARE OR REPLACE VARIABLE g_minchars BIGINT DEFAULT 0")
      s.sql("""SET VAR g_minchars =
                 (SELECT CAST(floor(avg(n_chars)) AS BIGINT)
                  FROM g_docs_var)""")
      s.sql("""EXECUTE IMMEDIATE
                 'SELECT lang, COUNT(*) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS chars
                  FROM g_docs_var WHERE n_chars >= :minc
                  GROUP BY lang ORDER BY lang'
               USING g_minchars AS minc""")
    }),

    // Spark 4 SQL scripting (BEGIN…END control flow): a WHILE loop
    // doubles a budget until it clears the p95 document length — the
    // procedural surface for logic that previously forced a driver
    // round-trip per step; the script runs entirely inside the engine
    // and returns its final SELECT. Oracle: the loop's closed form
    // (smallest power of two ≥ target).
    "q216_sql_scripting" -> ((s, d) => {
      table(s, d, "documents").createOrReplaceTempView("g_docs_script")
      s.sql("""BEGIN
                 DECLARE target BIGINT;
                 DECLARE b BIGINT DEFAULT 1;
                 SET target = (SELECT CAST(ceil(percentile(n_chars, 0.95))
                                           AS BIGINT)
                               FROM g_docs_script);
                 WHILE b < target DO
                   SET b = b * 2;
                 END WHILE;
                 SELECT b AS budget, target;
               END""")
    }),

    // approx_top_k in its exact regime: k and maxItemsTracked both
    // above the key cardinality make the sketch lossless AND complete
    // (the q43/q81 stance: pin the approximate surface where it is
    // provably exact), so every key comes back with its exact count and
    // the deterministic (count desc, key) re-rank + limit happens
    // OUTSIDE the sketch — boundary ties inside the sketch's own
    // unspecified tie order never reach the compare.
    // Dynamic-gap session windows: session_window with a PER-ROW gap
    // (clicks cool off in 5 minutes, everything else in 30) — the
    // engine merges each event's [ts, ts+gap) interval with any
    // overlapping session, so the timeout policy itself is data-driven
    // (q202 pins the fixed-gap streaming form; this pins the per-row
    // semantics). Oracle: running-max-end islands in exact µs — a
    // session breaks exactly when ts clears every prior member's
    // ts+gap, the half-open interval rule.
    "q218_dynamic_gap_sessions" -> ((s, d) => {
      events(s, d)
        .filter(col("user_id") <= 30)
        .groupBy(
          session_window(col("ts"),
            when(col("event_type") === "click", "5 minutes")
              .otherwise("30 minutes")),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("start_us"),
          unix_micros(col("session_window.end")).as("end_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("start_us"))
    }),

    "q217_approx_topk" -> ((s, d) => {
      table(s, d, "lineitem")
        .agg(expr("approx_top_k(l_suppkey, 20000, 20000)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").cast("long").as("suppkey"),
          col("e.count").as("n"))
        .orderBy(col("n").desc, col("suppkey"))
        .limit(5)
    }),

    // SQL pipe syntax (Spark 4.0+, SQL:2023-adjacent `|>` operators) —
    // the second SQL-only front door next to q90: the same engine
    // surface driven through piped FROM/WHERE/EXTEND/AGGREGATE/ORDER
    // stages. Catalyst compiles pipes to the identical logical plan as
    // the nested-SELECT spelling (filter still pushes to the scan), so
    // the oracle is plain ANSI SQL. Money stays in integer cents (the
    // q01 convention) — sums are exact and order-independent.
    "q177_pipe_syntax" -> ((s, d) => {
      table(s, d, "lineitem").createOrReplaceTempView("g_lineitem_pipe")
      s.sql("""
        FROM g_lineitem_pipe
        |> WHERE l_quantity >= 45
        |> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 100)
             AS BIGINT) AS net_cents
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(l_quantity) AS BIGINT) AS qty,
             CAST(SUM(net_cents) AS BIGINT) AS net_cents_sum
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag""")
    }),

    // Typed cogroup (KeyValueGroupedDataset.cogroup, §2.13): per-order
    // reconciliation of the order header against its lineitems with
    // arbitrary per-key Scala logic — the typed escape hatch when a
    // join + agg can't express the per-group program. One co-partitioned
    // shuffle on the key (same cost shape as a join); both sides filter
    // BEFORE grouping so the predicate reaches the scans. Oracle = the
    // relational equivalent (left join + group).
    "q93_cogroup_reconcile" -> ((s, d) => {
      import s.implicits._
      val orders = table(s, d, "orders")
        .filter(pmod(col("o_orderkey"), lit(100)) === 0)
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .as[(Long, Long)]
      val items = table(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(100)) === 0)
        .select(col("l_orderkey").as("k"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
        .as[(Long, Long)]
      orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
        (k, os, is) =>
          val header = os.map(_._2).toSeq
          if (header.isEmpty) Iterator.empty // orphan lineitems: none in TPC-H
          else {
            var sum = 0L; var n = 0L
            is.foreach { i => sum += i._2; n += 1 }
            Iterator((k, header.head, sum, n))
          }
      }.toDF("k", "o_cents", "item_cents", "n_items")
        .orderBy(col("k"))
    }),

    // Typed flatMapGroups (§2.13 — the PLAIN per-group escape hatch
    // next to q93's cogroup and the stateful streaming processors):
    // longest consecutive-day activity streak per user, computed by an
    // arbitrary Scala fold over the user's sorted day set. ONE
    // co-partitioning shuffle on the key — identical cost shape to an
    // aggregate — and each group materializes only its DISTINCT days
    // (bounded by the calendar, the q175 bound), never raw events.
    // Earliest longest streak wins ties (strict > in the fold). Oracle
    // = the classic gaps-and-islands reconstruction.
    "q180_flatmap_streak" -> ((s, d) => {
      import s.implicits._
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct().as[(Long, Long)]
      days.groupByKey(_._1).flatMapGroups { (uid, it) =>
        val ds = it.map(_._2).toArray.sorted
        var best = 1L; var bestStart = ds(0)
        var cur = 1L; var curStart = ds(0)
        var i = 1
        while (i < ds.length) {
          if (ds(i) == ds(i - 1) + 1) cur += 1
          else { cur = 1; curStart = ds(i) }
          if (cur > best) { best = cur; bestStart = curStart }
          i += 1
        }
        Iterator((uid, ds.length.toLong, best, bestStart))
      }.toDF("user_id", "n_active_days", "longest_streak",
          "streak_start_day")
        .orderBy(col("user_id"))
    }),

    // SCD Type-2 (history-preserving dimension upsert): customers as a
    // versioned dimension at version 1; a deterministic update feed
    // (custkey%7==2 moves segment, %31==0 key-shifted rows are brand-new
    // accounts, %11==3 re-sends the CURRENT segment → must be a no-op).
    // The engine closes changed rows, opens new versions, and passes
    // no-op updates through untouched — the idempotency the reference's
    // upsert sink contracts on, with history kept. Oracle replays the
    // same transitions relationally.
    "q89_scd2_dimension" -> ((s, d) => {
      val dim = table(s, d, "customer").select(
        col("c_custkey").as("key"), col("c_mktsegment").as("segment"),
        lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val updates = table(s, d, "customer")
        .filter(pmod(col("c_custkey"), lit(7)) === 2 ||
          pmod(col("c_custkey"), lit(31)) === 0 ||
          pmod(col("c_custkey"), lit(11)) === 3)
        .select(
          when(pmod(col("c_custkey"), lit(31)) === 0,
            col("c_custkey") + 10000000L).otherwise(col("c_custkey"))
            .as("key"),
          when(pmod(col("c_custkey"), lit(7)) === 2,
            concat(lit("SEG_"), pmod(col("c_custkey"), lit(3))))
            .otherwise(col("c_mktsegment")).as("segment"))
      graft.ops.Merge.scd2(dim, updates, "key", Seq("segment"), batchVer = 2L)
        .orderBy(col("key"), col("valid_from"))
    }),

    // Observed metrics (Dataset.observe): pipeline health counters
    // (rows scanned, total chars, rows passing the quality bar)
    // accumulated in the SAME pass that produces the per-lang result —
    // no second scan, which is the only affordable way to monitor a
    // 100 TB curation job. The observation values are folded into the
    // output relation, so a broken metrics path hash-mismatches the
    // oracle rather than silently reporting nothing.
    "q142_observed_metrics" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation(
        "q142_" + java.util.UUID.randomUUID.toString.replace("-", ""))
      val perLang = table(s, d, "documents")
        .observe(obs, count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("total_chars"),
          count(when(col("n_chars") > 500, lit(1))).as("n_long"))
        .filter(col("n_chars") > 500)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang")).collect()
      val m = obs.get
      import s.implicits._
      val rows = perLang.toSeq
        .map(r => ("docs_gt500:" + r.getString(0), r.getLong(1))) ++ Seq(
        ("n_long", m("n_long").asInstanceOf[Long]),
        ("n_rows", m("n_rows").asInstanceOf[Long]),
        ("total_chars", m("total_chars").asInstanceOf[Long]))
      rows.toDF("metric", "value").orderBy(col("metric"))
    }),

    // LATERAL correlated subquery with per-row ORDER BY + LIMIT — the
    // SQL-native top-k-per-key shape (the declarative sibling of q07's
    // window filter and q68's bounded UDAF): each nation pulls ITS OWN
    // top-2 customers by balance. Catalyst decorrelates the lateral
    // into a ranked join — no per-row re-execution — so the shape holds
    // when the outer side is large. Driven through the spark.sql
    // gateway; DuckDB replays the identical LATERAL.
    "q139_lateral_topk" -> ((s, d) => {
      val nv = "nat_" + java.util.UUID.randomUUID.toString.replace("-", "")
      val cv = "cus_" + java.util.UUID.randomUUID.toString.replace("-", "")
      table(s, d, "nation").createOrReplaceTempView(nv)
      table(s, d, "customer").createOrReplaceTempView(cv)
      val out = s.sql(
        s"""SELECT n.n_name, t.c_name,
              CAST(round(t.c_acctbal * 100) AS BIGINT) AS bal_cents
            FROM $nv n,
            LATERAL (SELECT c_name, c_acctbal FROM $cv c
                     WHERE c.c_nationkey = n.n_nationkey
                     ORDER BY c_acctbal DESC, c_name LIMIT 2) AS t
            ORDER BY n.n_name, bal_cents DESC, t.c_name""")
      s.catalog.dropTempView(nv)
      s.catalog.dropTempView(cv)
      out
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE — the engine-managed
    // iteration surface; q69's connected components is the manual
    // driver-loop form): depth of every node in the implicit binary
    // tree parent(k) = ⌊k/2⌋ over customer keys, rolled up per level.
    // Each recursion step is ONE equi-join of the frontier against the
    // node table; iterations = tree depth (log n) — the plan shape that
    // holds for org charts / category trees / thread ancestry at scale.
    // Executed through spark.sql over a temp view (the SQL-gateway
    // path, like q90).
    "q138_recursive_cte" -> ((s, d) => {
      val view = "cust_" + java.util.UUID.randomUUID.toString.replace("-", "")
      // checkpoint the node table behind the view (r14, guide §5): the
      // engine-managed recursion re-executes the recursive term per
      // level, which re-scanned customer.parquet ~log n times; the cut
      // makes each level probe the materialized rows instead
      table(s, d, "customer")
        .select(col("c_custkey"))
        .localCheckpoint(true)
        .createOrReplaceTempView(view)
      val out = s.sql(
        s"""WITH RECURSIVE dpt(key, depth) AS (
              SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
              UNION ALL
              SELECT c.c_custkey, dpt.depth + 1
              FROM $view c JOIN dpt ON c.c_custkey div 2 = dpt.key
              WHERE c.c_custkey > 1)
            SELECT depth, COUNT(*) AS n, SUM(key) AS sum_keys
            FROM dpt GROUP BY depth ORDER BY depth""")
      s.catalog.dropTempView(view)
      out
    }),

    // SCD2 point-in-time lookup — the dimensional-enrichment composition:
    // a three-version dimension built by replaying TWO scd2 batches
    // (Merge.scd2), then each fact row joined to the version valid at
    // ITS OWN time via the native as-of operator (q130): valid_from ≤ v,
    // latest wins — which is exactly the row whose [valid_from,
    // valid_to) interval contains v, without a range predicate reaching
    // the join chooser. One co-partitioning exchange on the key; the
    // oracle derives each key's version-v attribute from the update
    // rules directly.
    "q136_scd2_lookup" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val base = cust.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val upd2 = cust.filter(pmod(col("c_custkey"), lit(7)) === 2)
        .select(col("c_custkey").as("key"),
          concat(lit("SEG2_"), pmod(col("c_custkey"), lit(3))).as("segment"))
      val upd3 = cust.filter(pmod(col("c_custkey"), lit(5)) === 1)
        .select(col("c_custkey").as("key"),
          concat(lit("SEG3_"), pmod(col("c_custkey"), lit(4))).as("segment"))
      val dim3 = graft.ops.Merge.scd2(
        graft.ops.Merge.scd2(base, upd2, "key", Seq("segment"), 2L),
        upd3, "key", Seq("segment"), 3L)
      val facts = table(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey").as("key"),
        (lit(1L) + pmod(col("o_orderkey"), lit(3))).as("v"))
      AsOf.asofJoinNative(facts,
          dim3.select(col("key"), col("valid_from").as("v"), col("segment")),
          keyCol = "key", timeCol = "v", tieCol = "o_orderkey",
          rightTieCol = "v",
          valueCols = Map("segment" -> "segment"))
        .groupBy(col("v"), col("segment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("v"), col("segment"))
    }),

    // Bitemporal as-of (r8, §7.6): the VALID-TIME × TRANSACTION-TIME
    // point query, composed from exactly the two operators the library
    // already ships — Merge.scd2 (q89) builds the dimension's valid-
    // time history batch by batch, and each intermediate scd2 RESULT
    // is the snapshot the database believed at that transaction time
    // (tx=1: base, tx=2: after the %7 corrections, tx=3: after the %5
    // corrections). The native as-of operator (q130's AsOfJoinExec)
    // then answers "what segment was VALID at time v, AS KNOWN at
    // tx T" by as-of-joining each fact's valid-time point against the
    // tx-T snapshot's valid_from axis (SCD2 intervals are contiguous,
    // so latest-valid_from-≤-v IS the covering version — no valid_to
    // probe needed). The output (tx × v × segment) matrix pins both
    // axes independently: at fixed v=2, tx=1 vs tx=2 differ (the
    // correction became known); at fixed tx=3, v=2 vs v=3 differ (the
    // later correction is valid only from 3). Scale: three key-
    // partitioned merge-scan joins, closed history never re-joins
    // inside scd2 (its |current|+|updates| property), and at 100 TB
    // the tx snapshots are partition predicates over one bitemporal
    // table, not three materializations.
    "q333_bitemporal_asof" -> ((s, d) => {
      val cust = table(s, d, "customer")
      val base = cust.select(col("c_custkey").as("key"),
        col("c_mktsegment").as("segment"),
        lit(1L).as("valid_from"), lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current"))
      val upd2 = cust.filter(pmod(col("c_custkey"), lit(7)) === 2)
        .select(col("c_custkey").as("key"),
          concat(lit("SEG2_"), pmod(col("c_custkey"), lit(3))).as("segment"))
      val upd3 = cust.filter(pmod(col("c_custkey"), lit(5)) === 1)
        .select(col("c_custkey").as("key"),
          concat(lit("SEG3_"), pmod(col("c_custkey"), lit(4))).as("segment"))
      val dim2 = graft.ops.Merge.scd2(base, upd2, "key", Seq("segment"), 2L)
      val dim3 = graft.ops.Merge.scd2(dim2, upd3, "key", Seq("segment"), 3L)
      val facts = table(s, d, "orders").select(
        col("o_orderkey"), col("o_custkey").as("key"),
        (lit(1L) + pmod(col("o_orderkey"), lit(3))).as("v"))
      def at(dim: DataFrame, tx: Long): DataFrame =
        AsOf.asofJoinNative(facts,
            dim.select(col("key"), col("valid_from").as("v"),
              col("segment")),
            keyCol = "key", timeCol = "v", tieCol = "o_orderkey",
            rightTieCol = "v",
            valueCols = Map("segment" -> "segment"))
          .select(lit(tx).as("tx"), col("v"), col("segment"))
      at(base, 1L).unionByName(at(dim2, 2L)).unionByName(at(dim3, 3L))
        .groupBy(col("tx"), col("v"), col("segment"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("tx"), col("v"), col("segment"))
    }),

    // Spark 4 GROUP BY ALL / ORDER BY ALL sugar (the analyst-facing
    // shorthand DuckDB popularized): grouping keys inferred from the
    // non-aggregate select items, ordering over the full select list.
    // Same plan as the explicit spelling — the oracle IS the explicit
    // spelling, so the sugar's inference is what's under test.
    "q241_group_order_all" -> ((s, d) => {
      events(s, d).createOrReplaceTempView("g_events_all")
      s.sql("""SELECT event_type,
               unix_micros(ts) div 86400000000 AS day, COUNT(*) AS n,
               CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                 AS day_cents
               FROM g_events_all GROUP BY ALL ORDER BY ALL""")
    }),

    // Map-typed higher-order functions (§2.13 functions surface):
    // per-user type→count and type→cents MAPS (map_from_entries over
    // the sorted entry list), map_filter keeps busy types (n ≥ 5),
    // map_zip_with aligns the two maps by key (unmatched keys surface
    // as NULL structs and drop), transform_keys uppercases, and the
    // map explodes back to rows. The oracle is the PLAIN relational
    // spelling (GROUP BY + HAVING) — the map algebra must round-trip
    // to exactly that.
    "q250_map_hofs" -> ((s, d) => {
      val g = events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      val maps = g.groupBy(col("user_id"))
        .agg(map_from_entries(sort_array(collect_list(
            struct(col("event_type"), col("n"))))).as("mn"),
          map_from_entries(sort_array(collect_list(
            struct(col("event_type"), col("c"))))).as("mc"))
      maps
        .withColumn("busy", map_filter(col("mn"), (_, v) => v >= 5))
        .withColumn("mz", map_zip_with(col("busy"), col("mc"),
          (_, n, c) => when(n.isNotNull,
            struct(n.as("n"), c.as("cents")))))
        .withColumn("mu", transform_keys(col("mz"), (k, _) => upper(k)))
        .select(col("user_id"), explode(col("mu")).as(Seq("etype", "s")))
        .filter(col("s").isNotNull)
        .select(col("user_id"), col("etype"),
          col("s.n").as("n"), col("s.cents").as("cents"))
        .orderBy(col("user_id"), col("etype"))
    }),
  )



  /** q347's minimal-trigger extrema maintenance — the shared
    * support-at-extremum algebra now lives in
    * [[graft.ops.ExtremaIvm]] (r12, VERDICT-r11 #4: one module for the
    * batch q339/q347 derivation and q359's streaming scalar form).
    * This forwarder keeps the registry call sites and the AnalyticsSpec
    * entry point; the Column tree is byte-identical (plan hashes
    * unchanged — PlanDump-verified).
    */
  private[graft] def extremaSupportView(base: DataFrame, ins: DataFrame,
                                        del: DataFrame,
                                        post: DataFrame): DataFrame =
    graft.ops.ExtremaIvm.supportView(base, ins, del, post)

  val oracles: Map[String, String] = Map(
    // the EXPLICIT spelling — the sugar's key inference is under test
    "q241_group_order_all" ->
      """SELECT event_type,
         CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           AS day_cents
         FROM events GROUP BY 1, 2 ORDER BY 1, 2, 3, 4""",
    // the map algebra must reduce to this relational spelling
    "q250_map_hofs" ->
      """SELECT user_id, upper(event_type) AS etype, COUNT(*) AS n,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS cents
         FROM events GROUP BY user_id, event_type
         HAVING COUNT(*) >= 5 ORDER BY user_id, etype""",
    // nfc_normalize is DuckDB's spelling of graft_normalize; floor()
    // before the BIGINT cast on both sides (DuckDB's double->int cast
    // rounds, Spark's truncates)
    // gaps-and-islands: day − row_number is constant within a
    // consecutive run; earliest longest run wins via (len DESC, start)
    "q180_flatmap_streak" ->
      """WITH days AS (
           SELECT DISTINCT user_id,
             CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day
           FROM events),
         g AS (
           SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id ORDER BY day)
               AS grp
           FROM days),
         runs AS (
           SELECT user_id, COUNT(*) AS len, MIN(day) AS start
           FROM g GROUP BY user_id, grp),
         best AS (
           SELECT user_id, len, start,
             row_number() OVER (PARTITION BY user_id
               ORDER BY len DESC, start) AS rk
           FROM runs),
         act AS (
           SELECT user_id, COUNT(*) AS n_active_days FROM days GROUP BY 1)
         SELECT b.user_id, a.n_active_days,
           CAST(b.len AS BIGINT) AS longest_streak,
           b.start AS streak_start_day
         FROM best b JOIN act a USING (user_id)
         WHERE b.rk = 1 ORDER BY b.user_id""",
    // the piped plan re-spelled as plain ANSI SQL — same cents math
    "q177_pipe_syntax" ->
      """SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(l_quantity) AS BIGINT) AS qty,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
           AS BIGINT)) AS BIGINT) AS net_cents_sum
         FROM lineitem WHERE l_quantity >= 45
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q90_sql_gateway" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN length(nfc_normalize(text)) = length(text)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_nfc_clean,
         CAST(SUM(n_chars) AS BIGINT) AS chars,
         CAST(floor(quantile_cont(n_chars, 0.5)) AS BIGINT) AS p50
         FROM documents WHERE n_chars > 100
         GROUP BY lang ORDER BY lang""",
    // UDF bodies inlined (what Spark's analyzer does too)
    "q211_sql_udf" ->
      """SELECT l_returnflag AS flag,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS disc_cents,
         CAST(SUM(CAST(round(
                CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                     AS BIGINT) * (1 + l_tax), 0) AS BIGINT)) AS BIGINT)
           AS charge_cents,
         COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY flag""",
    // the de-parameterized spelling the binding must be equivalent to
    "q214_parameterized_sql" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
         FROM documents WHERE n_chars >= 120
         GROUP BY lang ORDER BY lang""",
    // the variable's scalar subquery inlined into the WHERE
    "q215_session_variables" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
         FROM documents
         WHERE n_chars >= (SELECT CAST(floor(avg(n_chars)) AS BIGINT)
                           FROM documents)
         GROUP BY lang ORDER BY lang""",
    // the WHILE loop replayed as a recursive doubling CTE — exact
    // integer arithmetic, no float log2
    "q216_sql_scripting" ->
      """WITH RECURSIVE tgt AS (
           SELECT CAST(ceil(quantile_cont(n_chars, 0.95)) AS BIGINT)
             AS target
           FROM documents),
         dbl AS (
           SELECT CAST(1 AS BIGINT) AS b FROM tgt
           UNION ALL
           SELECT b * 2 FROM dbl, tgt WHERE b < tgt.target)
         SELECT (SELECT MAX(b) FROM dbl) AS budget,
                (SELECT target FROM tgt) AS target""",
    // per-row-gap islands: a session breaks when ts clears the running
    // max of every prior member's ts+gap (half-open intervals, exact µs)
    "q218_dynamic_gap_sessions" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'click' THEN 300000000
                  ELSE 1800000000 END AS gap
           FROM events WHERE user_id <= 30),
         x AS (
           SELECT user_id, us, gap,
             MAX(us + gap) OVER (PARTITION BY user_id ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_end
           FROM e),
         f AS (
           SELECT user_id, us, gap,
             CASE WHEN prev_end IS NULL OR us >= prev_end
                  THEN 1 ELSE 0 END AS brk
           FROM x),
         s AS (
           SELECT user_id, us, gap,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                            ROWS UNBOUNDED PRECEDING) AS sid
           FROM f),
         g AS (
           SELECT user_id, sid, MIN(us) AS start_us,
             MAX(us + gap) AS end_us, COUNT(*) AS n_events
           FROM s GROUP BY 1, 2)
         SELECT user_id, start_us, end_us,
           CAST(n_events AS BIGINT) AS n_events
         FROM g ORDER BY user_id, start_us""",
    // the sketch is complete+exact at these params, so the oracle is
    // the plain exact top-5
    "q217_approx_topk" ->
      """SELECT CAST(l_suppkey AS BIGINT) AS suppkey, COUNT(*) AS n
         FROM lineitem GROUP BY l_suppkey
         ORDER BY n DESC, suppkey LIMIT 5""",
    "q93_cogroup_reconcile" ->
      """SELECT o_orderkey AS k,
         CAST(round(o_totalprice*100) AS BIGINT) AS o_cents,
         CAST(coalesce(SUM(CAST(round(l_extendedprice*100) AS BIGINT)), 0)
           AS BIGINT) AS item_cents,
         CAST(COUNT(l_orderkey) AS BIGINT) AS n_items
         FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey
         WHERE o_orderkey % 100 = 0
         GROUP BY 1, 2 ORDER BY k""",
    "q89_scd2_dimension" ->
      """WITH dim AS (
           SELECT c_custkey AS key, c_mktsegment AS segment FROM customer),
         upd AS (
           SELECT CASE WHEN c_custkey % 31 = 0 THEN c_custkey + 10000000
                       ELSE c_custkey END AS key,
             CASE WHEN c_custkey % 7 = 2 THEN 'SEG_' || (c_custkey % 3)
                  ELSE c_mktsegment END AS segment
           FROM customer
           WHERE c_custkey % 7 = 2 OR c_custkey % 31 = 0 OR c_custkey % 11 = 3)
         SELECT d.key, d.segment, CAST(1 AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
         FROM dim d LEFT JOIN upd u USING (key)
         WHERE u.key IS NULL OR d.segment = u.segment
         UNION ALL
         SELECT d.key, d.segment, 1, 2, FALSE
         FROM dim d JOIN upd u USING (key) WHERE d.segment <> u.segment
         UNION ALL
         SELECT u.key, u.segment, 2, NULL, TRUE
         FROM upd u LEFT JOIN dim d USING (key)
         WHERE d.key IS NULL OR d.segment <> u.segment
         ORDER BY key, valid_from""",
    // every cell hash-exact: both engines replay the same quantization,
    // portable-arithmetic Morton key, the Hilbert xy2d rotation
    // recurrence (recursive CTE over distinct pairs — min/max zone maps
    // are multiplicity-free), equal-width bucketing, zone-map
    // intersection counts, and integer permille
    "q343_layout_skipping" ->
      s"""WITH RECURSIVE base AS (
           SELECT user_id % 256 AS xq,
             (epoch_us(ts) // 3600000000) % 256 AS yq
           FROM events),
         zed AS (
           SELECT xq, yq,
             (((xq >> 0) & 1) << 1) + (((xq >> 1) & 1) << 3) +
             (((xq >> 2) & 1) << 5) + (((xq >> 3) & 1) << 7) +
             (((xq >> 4) & 1) << 9) + (((xq >> 5) & 1) << 11) +
             (((xq >> 6) & 1) << 13) + (((xq >> 7) & 1) << 15) +
             (((yq >> 0) & 1) << 0) + (((yq >> 1) & 1) << 2) +
             (((yq >> 2) & 1) << 4) + (((yq >> 3) & 1) << 6) +
             (((yq >> 4) & 1) << 8) + (((yq >> 5) & 1) << 10) +
             (((yq >> 6) & 1) << 12) + (((yq >> 7) & 1) << 14) AS zkey
           FROM base),
         psrc AS (
           SELECT DISTINCT xq * 256 + yq AS pid, xq, yq FROM base),
         ${graft.expr.HilbertKey.recursiveSql("hc", "psrc", "pid",
             "xq", "yq", 8)},
         hil AS (
           SELECT id // 256 AS xq, id % 256 AS yq, d AS hkey
           FROM hc WHERE s = 0),
         zones AS (
           SELECT 'linear_x' AS layout, xq // 4 AS b,
             MIN(xq) AS x0, MAX(xq) AS x1, MIN(yq) AS y0, MAX(yq) AS y1
           FROM zed GROUP BY 1, 2
           UNION ALL
           SELECT 'linear_y', yq // 4,
             MIN(xq), MAX(xq), MIN(yq), MAX(yq)
           FROM zed GROUP BY 1, 2
           UNION ALL
           SELECT 'zorder', zkey // 1024,
             MIN(xq), MAX(xq), MIN(yq), MAX(yq)
           FROM zed GROUP BY 1, 2
           UNION ALL
           SELECT 'hilbert', hkey // 1024,
             MIN(xq), MAX(xq), MIN(yq), MAX(yq)
           FROM hil GROUP BY 1, 2
           UNION ALL
           SELECT 'zorder_w768', zkey // 768,
             MIN(xq), MAX(xq), MIN(yq), MAX(yq)
           FROM zed GROUP BY 1, 2
           UNION ALL
           SELECT 'hilbert_w768', hkey // 768,
             MIN(xq), MAX(xq), MIN(yq), MAX(yq)
           FROM hil GROUP BY 1, 2),
         preds AS (
           SELECT * FROM (VALUES
             ('x_range', 16, 31, 0, 255),
             ('y_range', 0, 255, 16, 31),
             ('xy_box', 16, 31, 16, 31))
             AS t(pred, px0, px1, py0, py1)),
         agg AS (
           SELECT layout, pred, COUNT(*) AS n_buckets,
             CAST(SUM(CASE WHEN x1 >= px0 AND x0 <= px1
               AND y1 >= py0 AND y0 <= py1 THEN 1 ELSE 0 END) AS BIGINT)
               AS touched
           FROM zones CROSS JOIN preds
           GROUP BY layout, pred)
         SELECT layout, pred, n_buckets, touched,
           ((n_buckets - touched) * 1000) // n_buckets AS skipped_permille
         FROM agg ORDER BY layout, pred""",
    "q88_zorder_key" ->
      """WITH e AS (
           SELECT event_id, user_id % 65536 AS x,
             (epoch_ns(ts) // 3600000000000) % 65536 AS y
           FROM events)
         SELECT event_id, x, y,
           CAST(SUM(
             (CAST(floor(x / power(2, i)) AS BIGINT) % 2) * power(2, 2*i)
           + (CAST(floor(y / power(2, i)) AS BIGINT) % 2) * power(2, 2*i+1)
           ) AS BIGINT) AS zkey
         FROM e, LATERAL (SELECT unnest(generate_series(0, 15)) AS i) t
         GROUP BY 1, 2, 3 ORDER BY event_id""",
    "q76_hll_mergeability" ->
      """SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
         TRUE AS merged_ok, TRUE AS global_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q27_asof_join" -> AsofOracleSql,
    // the forward traversal: DESC window, same side/tie rule, the
    // 1-hour tolerance as a residual CASE on the carried match time
    "q181_asof_forward" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
           epoch_us(ts) AS us FROM events),
         u AS (
           SELECT event_id, user_id, us, 1 AS side, NULL::BIGINT AS err_id
           FROM ev WHERE event_type = 'purchase'
           UNION ALL
           SELECT event_id, user_id, us, 0 AS side, event_id
           FROM ev WHERE event_type = 'error'),
         c AS (
           SELECT event_id, user_id, us, side,
             last_value(CASE WHEN side = 0 THEN err_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us DESC, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS next_err_id,
             last_value(CASE WHEN side = 0 THEN us END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY us DESC, side, event_id
                     ROWS UNBOUNDED PRECEDING) AS rt
           FROM u)
         SELECT event_id, user_id,
           CASE WHEN rt IS NOT NULL AND rt - us <= 3600000000
                THEN next_err_id END AS next_err_id,
           CASE WHEN rt IS NOT NULL AND rt - us <= 3600000000
                THEN rt - us END AS lag_us
         FROM c WHERE side = 1 ORDER BY event_id""",
    // the native operator must land on the identical result
    "q130_asof_native" -> AsofOracleSql,
    "q28_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
           ('p0_20k', 0.0, 20000.0), ('p20_40k', 20000.0, 40000.0),
           ('p40_60k', 40000.0, 60000.0), ('p60_80k', 60000.0, 80000.0),
           ('p80k_up', 80000.0, 1e12))
         SELECT band, COUNT(*) AS n,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
         FROM lineitem JOIN bands
           ON l_extendedprice >= lo AND l_extendedprice < hi
         GROUP BY band ORDER BY band""",
    "q17_cube" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         coalesce(l_linestatus, '(all)') AS linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q54_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         coalesce(l_linestatus, '(all)') AS linestatus,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n,
         CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY returnflag, linestatus""",
    // the salted rewrite must equal the plain aggregation
    "q55_salted_agg" ->
      """SELECT l_returnflag AS returnflag,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty, COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY returnflag""",
    // the salted join rewrite must equal the plain join
    "q98_skew_join" ->
      """SELECT p_size, COUNT(*) AS n,
         CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 10 GROUP BY p_size ORDER BY p_size""",
    "q104_skew_diagnostic" ->
      """WITH c AS (
           SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders
           GROUP BY o_custkey),
         s AS (SELECT COUNT(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
                      max(cnt) AS max_cnt FROM c)
         SELECT c.key, c.cnt,
           round(CAST(c.cnt AS DOUBLE) / s.n_rows, 6) AS share, s.n_keys,
           round(CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows, 4)
             AS skew_factor
         FROM c CROSS JOIN s ORDER BY c.cnt DESC, c.key LIMIT 15""",
    "q43_approx_distinct" ->
      """SELECT l_returnflag,
         CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
         TRUE AS approx_ok
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // exact top-10 frequencies recomputable; the CMS probe contracts
    // (est >= exact always; est <= exact + ceil(eps*N) at the fixed
    // seed) pinned TRUE — the q43 contract-oracle stance
    "q203_count_min" ->
      """WITH t AS (
           SELECT l_partkey, COUNT(*) AS n_exact FROM lineitem
           GROUP BY 1 ORDER BY n_exact DESC, l_partkey LIMIT 10)
         SELECT l_partkey, n_exact, TRUE AS lower_ok, TRUE AS upper_ok
         FROM t ORDER BY n_exact DESC, l_partkey""",
    // the bloom-pruned join must equal the plain join exactly
    "q74_bloom_join" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           COUNT(*) AS n_lines,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY o_year ORDER BY o_year""",
    // the bounded-heap aggregate must equal the window top-k exactly
    "q68_topk_aggregator" ->
      """WITH r AS (
           SELECT o_orderpriority, o_orderkey,
             CAST(round(o_totalprice*100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC,
                        o_orderkey) AS rnk
           FROM orders)
         SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rank,
           o_orderkey, cents
         FROM r WHERE rnk <= 5
         ORDER BY o_orderpriority, rank""",
    // relational replay of the merge: base minus deletes with updates
    // applied, plus the key-shifted inserts
    "q67_merge_upsert" ->
      """WITH d AS (
           SELECT o_custkey AS key,
             CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS delta
           FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
           GROUP BY 1),
         b AS (
           SELECT c_custkey AS key,
             CAST(round(c_acctbal*100) AS BIGINT) AS bal, c_mktsegment AS segment
           FROM customer)
         SELECT b.key, b.bal + COALESCE(u.delta, 0) AS bal_cents, b.segment
         FROM b
         LEFT JOIN (SELECT key, delta FROM d WHERE key % 10 <> 0) u
           ON b.key = u.key
         WHERE b.key NOT IN (SELECT key FROM d WHERE key % 10 = 0)
         UNION ALL
         SELECT key + 10000000 AS key, delta AS bal_cents, '(new)' AS segment
         FROM d
         ORDER BY key""",
    // the bitmap plumbing must land exactly on plain COUNT(DISTINCT)
    "q118_bitmap_distinct" ->
      """SELECT c_mktsegment AS segment,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct
         FROM customer GROUP BY 1 ORDER BY 1""",
    // every metric recomputed from plain aggregates; "check" quoted
    // (reserved word) — the alias still compares as column `check`
    "q114_quality_audit" ->
      """WITH m AS (
           SELECT COUNT(*) * 1.0 AS n,
             SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) * 1.0 AS nn_ok,
             SUM(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) * 1.0 AS nn_pk,
             SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) * 1.0 AS nn_sd,
             SUM(CASE WHEN l_returnflag IS NULL
                   OR l_returnflag NOT IN ('A','N','R')
                 THEN 1 ELSE 0 END) * 1.0 AS av_rf,
             SUM(CASE WHEN l_linestatus IS NULL OR l_linestatus <> 'O'
                 THEN 1 ELSE 0 END) * 1.0 AS av_ls,
             SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1.0
                   OR l_quantity > 25.0 THEN 1 ELSE 0 END) * 1.0 AS bd_q,
             SUM(CASE WHEN l_discount IS NULL OR l_discount < 0.0
                   OR l_discount > 0.1 THEN 1 ELSE 0 END) * 1.0 AS bd_d
           FROM lineitem),
         dk AS (SELECT COUNT(*) * 1.0 AS dk FROM
           (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)),
         ri1 AS (SELECT COUNT(*) * 1.0 AS v FROM orders o
           LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
             ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL),
         ri2 AS (SELECT COUNT(*) * 1.0 AS v FROM lineitem l
           LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
             ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
         SELECT * FROM (
           SELECT 'row_count' AS "check", '*' AS target, n AS metric,
             n > 0 AS ok FROM m
           UNION ALL SELECT 'unique_key', 'l_orderkey,l_linenumber',
             m.n - dk.dk, m.n = dk.dk FROM m, dk
           UNION ALL SELECT 'not_null', 'l_orderkey', nn_ok, nn_ok = 0 FROM m
           UNION ALL SELECT 'not_null', 'l_partkey', nn_pk, nn_pk = 0 FROM m
           UNION ALL SELECT 'not_null', 'l_shipdate', nn_sd, nn_sd = 0 FROM m
           UNION ALL SELECT 'accepted_values', 'l_linestatus', av_ls,
             av_ls = 0 FROM m
           UNION ALL SELECT 'accepted_values', 'l_returnflag', av_rf,
             av_rf = 0 FROM m
           UNION ALL SELECT 'bounds', 'l_discount', bd_d, bd_d = 0 FROM m
           UNION ALL SELECT 'bounds', 'l_quantity', bd_q, bd_q = 0 FROM m
           UNION ALL SELECT 'ref_integrity', 'o_custkey', v, v = 0 FROM ri1
           UNION ALL SELECT 'ref_integrity', 'l_orderkey', v, v = 0 FROM ri2)
         ORDER BY "check", target""",
    // every observed counter recomputed from plain aggregates
    "q142_observed_metrics" ->
      """SELECT metric, value FROM (
           SELECT 'docs_gt500:' || lang AS metric,
             CAST(COUNT(*) AS BIGINT) AS value
           FROM documents WHERE n_chars > 500 GROUP BY lang
           UNION ALL SELECT 'n_long', CAST(COUNT(*) AS BIGINT)
           FROM documents WHERE n_chars > 500
           UNION ALL SELECT 'n_rows', CAST(COUNT(*) AS BIGINT)
           FROM documents
           UNION ALL SELECT 'total_chars', CAST(SUM(n_chars) AS BIGINT)
           FROM documents)
         ORDER BY metric""",
    // identical LATERAL, identical ordering keys
    "q139_lateral_topk" ->
      """SELECT n.n_name, t.c_name,
           CAST(round(t.c_acctbal * 100) AS BIGINT) AS bal_cents
         FROM nation n,
         LATERAL (SELECT c_name, c_acctbal FROM customer c
                  WHERE c.c_nationkey = n.n_nationkey
                  ORDER BY c_acctbal DESC, c_name LIMIT 2) AS t
         ORDER BY n.n_name, bal_cents DESC, t.c_name""",
    // the same traversal as a DuckDB recursive CTE
    "q138_recursive_cte" ->
      """WITH RECURSIVE dpt(key, depth) AS (
           SELECT CAST(1 AS BIGINT), CAST(0 AS BIGINT)
           UNION ALL
           SELECT c.c_custkey, dpt.depth + 1
           FROM customer c JOIN dpt ON c.c_custkey // 2 = dpt.key
           WHERE c.c_custkey > 1)
         SELECT depth, COUNT(*) AS n, CAST(SUM(key) AS BIGINT) AS sum_keys
         FROM dpt GROUP BY depth ORDER BY depth""",
    // each key's version-v attribute derived straight from the update
    // rules (upd3 overrides upd2 overrides base, gated on v)
    "q136_scd2_lookup" ->
      """WITH f AS (SELECT o_orderkey, o_custkey AS key,
             1 + o_orderkey % 3 AS v FROM orders),
         c AS (SELECT c_custkey AS key, c_mktsegment AS seg FROM customer),
         looked AS (
           SELECT f.v,
             CASE WHEN f.v >= 3 AND f.key % 5 = 1
                    THEN 'SEG3_' || (f.key % 4)
                  WHEN f.v >= 2 AND f.key % 7 = 2
                    THEN 'SEG2_' || (f.key % 3)
                  ELSE c.seg END AS segment
           FROM f JOIN c ON f.key = c.key)
         SELECT v, segment, COUNT(*) AS n_orders
         FROM looked GROUP BY v, segment ORDER BY v, segment""",
    // both axes derived from the update rules: the tx axis selects
    // WHICH corrections are known, the v axis selects which are VALID
    "q333_bitemporal_asof" ->
      """WITH f AS (SELECT o_orderkey, o_custkey AS key,
             1 + o_orderkey % 3 AS v FROM orders),
         c AS (SELECT c_custkey AS key, c_mktsegment AS seg FROM customer),
         j AS (SELECT f.o_orderkey, f.key, f.v, c.seg
               FROM f JOIN c ON f.key = c.key),
         legs AS (
           SELECT CAST(1 AS BIGINT) AS tx, v, seg AS segment FROM j
           UNION ALL
           SELECT 2, v,
             CASE WHEN v >= 2 AND key % 7 = 2
                    THEN 'SEG2_' || (key % 3)
                  ELSE seg END FROM j
           UNION ALL
           SELECT 3, v,
             CASE WHEN v >= 3 AND key % 5 = 1
                    THEN 'SEG3_' || (key % 4)
                  WHEN v >= 2 AND key % 7 = 2
                    THEN 'SEG2_' || (key % 3)
                  ELSE seg END FROM j)
         SELECT tx, v, segment, COUNT(*) AS n_orders
         FROM legs GROUP BY tx, v, segment ORDER BY tx, v, segment""",
    // the delta-maintained JOIN view must equal the from-scratch join
    // rollup (exact distinct via COUNT(DISTINCT), matching the bitmap)
    "q336_join_mv_delta" ->
      """SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
           CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           round(CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 4) AS avg4
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the delete-merged MV must equal the from-scratch rollup over the
    // post-batch fact state (base minus deletes plus inserts =
    // o_orderkey % 10 <> 3)
    // the oracle takes the from-scratch route for the extrema (the
    // incremental route must land on it — that IS the contract) and
    // replays the support-exhaustion triggers exactly: a missed rescan
    // leaves a stale max, a spurious one flips the boolean
    "q347_extrema_support_ivm" ->
      """WITH f AS (
           SELECT o_orderkey, c_mktsegment,
             CAST(round(o_totalprice*100) AS BIGINT) AS cents
           FROM orders JOIN customer ON o_custkey = c_custkey),
         base AS (SELECT * FROM f WHERE o_orderkey % 10 <> 7),
         del AS (SELECT * FROM base WHERE o_orderkey % 10 = 3),
         stored AS (
           SELECT c_mktsegment, MAX(cents) AS mx0, MIN(cents) AS mn0
           FROM base GROUP BY 1),
         sup AS (
           SELECT b.c_mktsegment,
             SUM(CASE WHEN b.cents = st.mx0 THEN 1 ELSE 0 END) AS n_at_mx,
             SUM(CASE WHEN b.cents = st.mn0 THEN 1 ELSE 0 END) AS n_at_mn
           FROM base b JOIN stored st USING (c_mktsegment) GROUP BY 1),
         dsup AS (
           SELECT dl.c_mktsegment,
             SUM(CASE WHEN dl.cents = st.mx0 THEN 1 ELSE 0 END) AS d_at_mx,
             SUM(CASE WHEN dl.cents = st.mn0 THEN 1 ELSE 0 END) AS d_at_mn
           FROM del dl JOIN stored st USING (c_mktsegment) GROUP BY 1),
         scratch AS (
           SELECT c_mktsegment, MAX(cents) AS smx, MIN(cents) AS smn
           FROM f WHERE o_orderkey % 10 <> 3 GROUP BY 1)
         SELECT sc.c_mktsegment,
           sc.smx AS max_cents, sc.smn AS min_cents,
           (coalesce(d.d_at_mx, 0) = s.n_at_mx) AS rescanned_max,
           (coalesce(d.d_at_mn, 0) = s.n_at_mn) AS rescanned_min
         FROM scratch sc
         JOIN sup s USING (c_mktsegment)
         LEFT JOIN dsup d USING (c_mktsegment)
         ORDER BY c_mktsegment""",
    "q339_join_mv_deletes" ->
      """SELECT c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS rev_cents,
           CAST(MAX(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS max_cents,
           CAST(MIN(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             AS min_cents,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
           round(CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
               AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 4) AS avg4
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE o_orderkey % 10 <> 3
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // the delta-merged MV must equal the from-scratch aggregate
    "q131_mv_merge" ->
      """SELECT lang, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars,
         CAST(MAX(n_chars) AS BIGINT) AS max_chars,
         CAST(COUNT(DISTINCT CAST(regexp_extract(source, '([0-9]+)', 1)
           AS BIGINT)) AS BIGINT) AS n_sources
         FROM documents GROUP BY lang ORDER BY lang""",
    // variant extraction must agree with plain JSON-string extraction
    "q123_variant_extract" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
         CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS max_k,
         CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) = 0
              THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         FROM events GROUP BY event_type ORDER BY event_type""",
    // the binned equi-join must land exactly on the plain theta join
    "q125_binned_interval_join" ->
      """WITH ev AS (SELECT event_id, user_id, event_type,
             epoch_us(ts) AS us FROM events),
         c AS (SELECT event_id AS click_id, user_id, us AS click_us
           FROM ev WHERE event_type = 'click'),
         p AS (SELECT event_id AS purchase_id, user_id, us AS p_us
           FROM ev WHERE event_type = 'purchase')
         SELECT click_id, purchase_id, c.user_id AS user_id,
           p_us - click_us AS lag_us
         FROM c JOIN p ON c.user_id = p.user_id
           AND click_us >= p_us - 7200000000 AND click_us <= p_us
         ORDER BY click_id, purchase_id""",
    // same deterministic snapshot derivation, one full-outer diff
    "q115_snapshot_diff" ->
      """WITH ord AS (
           SELECT o_orderkey AS key,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             o_orderstatus AS ostatus
           FROM orders),
         olds AS (SELECT * FROM ord WHERE key % 10 <> 3),
         news AS (SELECT key,
             CASE WHEN key % 5 = 0 THEN price_cents + 100
                  ELSE price_cents END AS price_cents,
             CASE WHEN key % 11 = 0 THEN 'X' ELSE ostatus END AS ostatus
           FROM ord WHERE key % 10 <> 7),
         j AS (SELECT
             o.key IS NOT NULL AS in_o, n.key IS NOT NULL AS in_n,
             CASE WHEN o.price_cents IS DISTINCT FROM n.price_cents
               THEN 1 ELSE 0 END AS cp,
             CASE WHEN o.ostatus IS DISTINCT FROM n.ostatus
               THEN 1 ELSE 0 END AS cs
           FROM olds o FULL OUTER JOIN news n ON o.key = n.key),
         st AS (SELECT
             CASE WHEN NOT in_o THEN 'added'
                  WHEN NOT in_n THEN 'removed'
                  WHEN cp + cs > 0 THEN 'changed'
                  ELSE 'unchanged' END AS status,
             CASE WHEN in_o AND in_n THEN cp ELSE 0 END AS cp,
             CASE WHEN in_o AND in_n THEN cs ELSE 0 END AS cs
           FROM j)
         SELECT status, COUNT(*) AS n_rows,
           CAST(SUM(cp) AS BIGINT) AS n_price_chg,
           CAST(SUM(cs) AS BIGINT) AS n_status_chg
         FROM st GROUP BY status ORDER BY status""",
  )
}
