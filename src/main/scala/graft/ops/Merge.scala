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
