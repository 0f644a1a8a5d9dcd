package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of ("most recent prior event") join (SURVEY.md §2.4 J3).
  *
  * Implemented as the scale-friendly union+window plan rather than a
  * range join: tag both sides, union, ONE shuffle by key, sort within
  * partition by (time, tiebreak), and carry the latest right-side row
  * forward with `last_value(ignoreNulls)`. Cost is one exchange of
  * left+right (same as a sort-merge join) with no range-condition row
  * explosion — this is the plan that survives 100 TB, unlike a
  * BroadcastNestedLoop/theta-join formulation.
  */
object AsOf {

  /** For each left row, attach the most recent right row with
    * `right.timeCol <= left.timeCol` and equal `keyCol`. Ties on time
    * break by each side's own `tieCol`/`rightTieCol` (larger wins),
    * making the result deterministic under any partitioning.
    *
    * @param valueCols right-side columns to carry (renamed as given)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, tieCol: String, rightTieCol: String,
               valueCols: Map[String, String]): DataFrame = {
    val leftTagged = left.withColumn("_side", lit(1))
      .withColumn("_tie", col(tieCol))
    val rightTagged = right.withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieCol))
    val leftCols = left.columns.toSeq
    // one ordered view drives every iteration below (see asofJoinNative)
    val vcs = valueCols.toSeq
    // align schemas: union needs same columns
    val allValueSrc = vcs.map(_._1)
    val l2 = allValueSrc.foldLeft(leftTagged)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val cols = leftCols ++ allValueSrc ++ Seq("_side", "_tie")
    val unioned = l2.select(cols.map(col): _*)
      .unionByName(r2.select(cols.map(col): _*))
    // right rows sort before left rows at the same timestamp (side 0 < 1):
    // a right row with time == left time IS visible to that left row.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = vcs.foldLeft(unioned) { case (df, (src, dst)) =>
      df.withColumn(dst,
        last(when(col("_side") === 0, col(src)), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols ++ vcs.map(_._2)).map(col): _*)
  }

  /** FORWARD as-of with tolerance: for each left row, the EARLIEST
    * right row with `right.timeCol >= left.timeCol` and equal key,
    * dropped (nulls) when it lies more than `toleranceUs` time units
    * ahead — the "next event within a horizon" attribution primitive
    * (pandas `merge_asof(direction='forward', tolerance=...)`). Same
    * single union+exchange plan as [[asofJoin]], traversed in
    * DESCENDING time so the carried right row is the nearest future
    * one; ties on time break by larger `rightTieCol` (the backward
    * variant's rule). The matched right TIME is always carried too, so
    * the tolerance gate is one residual projection — no second join.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCol: String,
                      timeCol: String, tieCol: String, rightTieCol: String,
                      valueCols: Map[String, String],
                      toleranceUs: Long): DataFrame = {
    val leftTagged = left.withColumn("_side", lit(1))
      .withColumn("_tie", col(tieCol))
    val rightTagged = right.withColumn("_side", lit(0))
      .withColumn("_tie", col(rightTieCol))
    val leftCols = left.columns.toSeq
    val vcs = valueCols.toSeq
    val allValueSrc = vcs.map(_._1)
    val l2 = allValueSrc.foldLeft(leftTagged)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val r2 = leftCols.foldLeft(rightTagged)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null)))
    val cols = leftCols ++ allValueSrc ++ Seq("_side", "_tie")
    val unioned = l2.select(cols.map(col): _*)
      .unionByName(r2.select(cols.map(col): _*))
    // DESC traversal; at equal time right rows (side 0) come first so
    // a same-instant right IS visible; larger right tie traversed last
    // → last() picks it, mirroring the backward rule.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).desc, col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRt = unioned.withColumn("_rt",
      last(when(col("_side") === 0, col(timeCol)), ignoreNulls = true).over(w))
    val carried = vcs.foldLeft(withRt) { case (df, (src, dst)) =>
      df.withColumn(dst,
        last(when(col("_side") === 0, col(src)), ignoreNulls = true).over(w))
    }
    val inTol = col("_rt").isNotNull &&
      (col("_rt") - col(timeCol)) <= toleranceUs
    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++
        vcs.map { case (_, dst) => when(inTol, col(dst)).otherwise(lit(null)).as(dst) } ++
        Seq(when(inTol, col("_rt")).otherwise(lit(null)).as("_asof_time"))): _*)
  }

  /** [[asofJoin]] on the native merge-scan operator
    * (graft.plans.AsOfJoin): same single co-partitioning exchange, but
    * O(1) state per partition instead of the union+window's last_value
    * frame — the plan for fact×fact as-of at 100 TB. Same signature and
    * semantics as [[asofJoin]] (most recent right with time ≤ left
    * time; larger right tie wins on equal time; unmatched left rows
    * keep nulls).
    *
    * The strategy installs via `spark.experimental.extraStrategies`
    * (public API) if not already present — config-time deployments get
    * it from `spark.sql.extensions=graft.GraftExtensions` instead.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keyCol: String,
                     timeCol: String, tieCol: String, rightTieCol: String,
                     valueCols: Map[String, String]): DataFrame = {
    val s = left.sparkSession
    graft.expr.GraftFunctions.register(s)
    // read-modify-write of extraStrategies races under concurrent
    // callers; serialize on the session so a duplicate install (harmless
    // but wasteful — the strategy would run twice per plan) can't slip
    // between the check and the write
    s.synchronized {
      if (!s.experimental.extraStrategies
          .contains(graft.plans.AsOfJoin.AsOfJoinStrategy)) {
        s.experimental.extraStrategies =
          s.experimental.extraStrategies :+ graft.plans.AsOfJoin.AsOfJoinStrategy
      }
    }
    // capture ONE ordered view of the value columns and use it for both
    // the right-side projection and the final select: two separate Map
    // iterations are only guaranteed to agree while the Map is one of
    // the specialized ≤4-entry implementations
    val vcs = valueCols.toSeq
    val r = right.select(
      col(keyCol).as("__r_key") +: col(timeCol).as("__r_time") +:
        col(rightTieCol).as("__r_tie") +:
        vcs.map { case (src, dst) => col(src).as(dst) }: _*)
    val cond = call_function(graft.expr.GraftFunctions.AsOfOnName,
      left(keyCol), r("__r_key"), left(timeCol), r("__r_time"),
      left(tieCol), r("__r_tie"))
    left.join(r, cond, "left")
      .select(left.columns.map(left(_)) ++ vcs.map(p => col(p._2)): _*)
  }

  /** Range join of a fact column against a small banded dimension
    * `(band, lo, hi)` with `lo <= v < hi` semantics. The dimension is
    * broadcast; Catalyst plans a BroadcastNestedLoopJoin, which is the
    * right physical plan when the build side is a handful of bands.
    */
  def bandJoin(fact: DataFrame, bands: DataFrame, v: Column): DataFrame =
    fact.join(broadcast(bands), v >= col("lo") && v < col("hi"))
}
