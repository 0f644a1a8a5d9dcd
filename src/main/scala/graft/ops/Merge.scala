package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics on plain DataFrames (no table format required):
  * the batch form of the reference sink's idempotent upsert-by-id
  * contract (task.ts:215, 238 — CoT upsert absorbs redelivery).
  *
  * `changes` carries a key, an op column ('U' update / 'D' delete /
  * 'I' insert) and the change payload; resolution expressions are given
  * over the joined frame via the `b.` (base) and `c.` (changes)
  * aliases, so an update can combine both sides (e.g. increment).
  *
  * Semantics (SQL MERGE):
  *   - matched,  op='D'          → row removed
  *   - matched,  op='U' (or 'I') → `onUpdate` expressions
  *   - unmatched change, op='I'  → `onInsert` expressions
  *   - unmatched change, op∈{U,D} → no-op (dropped)
  *   - untouched base row        → passes through unchanged
  *
  * Scale: one shuffle on the key for the full-outer join (AQE
  * broadcasts the changes side when it is small, the common case for a
  * change feed). At 100 TB the physical write strategy on top of this
  * is partition-level copy-on-write: join only the base PARTITIONS that
  * contain changed keys (partition-prune via the change feed's key
  * range), rewrite those, leave the rest untouched. Keys must be
  * non-null (join keys; null never matches).
  */
object Merge {

  /** Slowly-Changing-Dimension Type 2 apply: history-preserving upsert.
    * `dim` carries (key, attrs..., valid_from, valid_to, is_current);
    * `updates` carries (key, attrs...) as of version `batchVer`.
    *
    *   - key in updates, current attrs DIFFER → current row closes
    *     (valid_to = batchVer, is_current = false) and a new open row
    *     starts (valid_from = batchVer);
    *   - key in updates, attrs equal → unchanged (idempotent re-apply);
    *   - new key → new open row;
    *   - absent key and all closed history → pass through untouched.
    *
    * PRECONDITION: `updates` must carry at most ONE row per key — the
    * full-outer join otherwise fans out and silently emits multiple
    * open (is_current) rows per key, corrupting the dimension (SQL
    * MERGE raises on a multi-source-row match for the same reason).
    * With `requireUniqueKeys` (default) the precondition is ENFORCED
    * at execution: a distributed per-key count over the update feed
    * feeds an `assert_true` filter, so a duplicate key fails the job
    * with a named key instead of corrupting silently. Cost: one extra
    * shuffle of the (small) update feed; pass false only when the feed
    * is deduplicated upstream.
    *
    * Attribute comparison is null-safe (`<=>`). One key-partitioned
    * shuffle joins ONLY the current slice against the update feed —
    * closed history never joins, so cost scales with |current| +
    * |updates|, not with accumulated history (the dominant term in a
    * years-old 100 TB dimension).
    */
  def scd2(dim: DataFrame, updates0: DataFrame, keyCol: String,
           attrCols: Seq[String], batchVer: Long,
           requireUniqueKeys: Boolean = true): DataFrame = {
    val updates = if (requireUniqueKeys) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      updates0.withColumn("__kc", count(lit(1)).over(w))
        .filter(assert_true(col("__kc") === 1,
          concat(lit(s"scd2: duplicate key in updates feed: $keyCol="),
            col(keyCol).cast("string"))).isNull)
        .drop("__kc")
    } else updates0
    // null-safe: a row with is_current = NULL (never-backfilled flag)
    // must not vanish — it routes to the history passthrough, because
    // `filter(col)` and `filter(!col)` BOTH drop null predicates
    val cur = dim.filter(col("is_current") <=> true)
    val hist = dim.filter(!(col("is_current") <=> true))
    val joined = cur.alias("b").join(updates.alias("c"),
      col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
    val matched = col(s"b.$keyCol").isNotNull && col(s"c.$keyCol").isNotNull
    val differs = attrCols
      .map(a => !(col(s"b.$a") <=> col(s"c.$a")))
      .reduce(_ || _)
    val dimCols = (Seq(keyCol) ++ attrCols ++
      Seq("valid_from", "valid_to", "is_current")).map(col)
    // ONE pass over the full-outer join (r14, guide §1.2/§7.2): the old
    // three filter+select branches (kept / closed / opened) each carried
    // their own copy of `joined` — and through it of the whole dim
    // subtree — so CHAINED scd2 calls compounded to 4^depth dim replays
    // (q136/q333's repeated-dimension disease). Each joined row now
    // emits its branch's row(s) through one conditional array + explode:
    //  - update absent, or present with no attr change → the current row
    //    survives as-is (kept);
    //  - matched with a change → the current version closes at batchVer
    //    AND the update opens as the new current version;
    //  - key new in this batch → only the opened row.
    // Same rows as the old union of branches (the three filters
    // partitioned `joined`); only the pass count changes.
    def keptRow = struct(Seq(col(s"b.$keyCol").as(keyCol)) ++
      attrCols.map(a => col(s"b.$a").as(a)) ++
      Seq(col(s"b.valid_from").as("valid_from"),
        col(s"b.valid_to").as("valid_to"),
        col(s"b.is_current").as("is_current")): _*)
    def closedRow = struct(Seq(col(s"b.$keyCol").as(keyCol)) ++
      attrCols.map(a => col(s"b.$a").as(a)) ++
      Seq(col(s"b.valid_from").as("valid_from"),
        lit(batchVer).as("valid_to"),
        lit(false).as("is_current")): _*)
    def openedRow = struct(Seq(col(s"c.$keyCol").as(keyCol)) ++
      attrCols.map(a => col(s"c.$a").as(a)) ++
      Seq(lit(batchVer).as("valid_from"),
        lit(null).cast("long").as("valid_to"),
        lit(true).as("is_current")): _*)
    val merged = joined
      .select(explode(
        when(col(s"c.$keyCol").isNull || (matched && !differs),
          array(keptRow))
          .when(matched && differs, array(closedRow, openedRow))
          .otherwise(array(openedRow))).as("r"))
      .select((Seq(keyCol) ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current"))
        .map(c => col(s"r.$c").as(c)): _*)
    hist.select(dimCols: _*).unionByName(merged)
  }

  def merge(base: DataFrame, changes: DataFrame, keyCol: String,
            opCol: String, valueCols: Seq[String],
            onUpdate: Map[String, Column],
            onInsert: Map[String, Column]): DataFrame = {
    require(valueCols.forall(onUpdate.contains), "onUpdate must cover all valueCols")
    require(valueCols.forall(onInsert.contains), "onInsert must cover all valueCols")
    val joined = base.alias("b").join(changes.alias("c"),
      col(s"b.$keyCol") === col(s"c.$keyCol"), "full_outer")
    val matched = col(s"b.$keyCol").isNotNull && col(s"c.$keyCol").isNotNull
    val baseOnly = col(s"c.$keyCol").isNull
    val insert = col(s"b.$keyCol").isNull && col(s"c.$opCol") === "I"
    joined
      .filter(baseOnly || insert || (matched && col(s"c.$opCol") =!= "D"))
      .select(
        coalesce(col(s"b.$keyCol"), col(s"c.$keyCol")).as(keyCol) +:
          valueCols.map { v =>
            when(baseOnly, col(s"b.$v"))
              .when(matched, onUpdate(v))
              .otherwise(onInsert(v)).as(v)
          }: _*)
  }
}
