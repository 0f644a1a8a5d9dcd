package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions

/** Bloom-filtered join: build a Bloom filter over the (already
  * filtered) dim side's join keys, prune the fact side with it BEFORE
  * the join shuffle, then join. The classic runtime-filter pattern for
  * selective dim joins at scale — fact rows that cannot match never
  * enter the exchange, so shuffle volume drops by the dim's
  * selectivity at the cost of one broadcast bitmap.
  *
  * No false negatives: the result is EXACTLY the plain join's (q74's
  * oracle is the plain join). False positives only waste shuffle, never
  * corrupt results. Spark's AQE does this automatically for some plans
  * (spark.sql.optimizer.runtime.bloomFilter.enabled); this operator is
  * the explicit form for when the planner doesn't.
  *
  * r7: both halves are Spark's OWN runtime-filter expressions, surfaced
  * via the graft function registry — `BloomFilterAggregate` builds the
  * bitmap as a distributed mergeable aggregate (partial sketches OR'd,
  * never a collect of keys), and the probe is the native codegen'd
  * `BloomFilterMightContain` over the one literal bitmap, so the fact
  * scan's filter stays inside WholeStageCodegen (the previous Scala
  * `udf` probe forced a non-codegen eval node in the hot path —
  * PlanSpec now pins its absence).
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pruning fact
    * through a Bloom filter of dim keys first.
    *
    * Key typing (r8, ADVICE): `BloomFilterAggregate`/`MightContain`
    * probe longs, but a blind `.cast("long")` on a non-integral key
    * (string, date, …) yields null → `might_contain(null)` is null →
    * every fact row silently filtered before the join. Integral keys
    * cast directly; everything else is hashed with the SAME codegen'd
    * `xxhash64` on BOTH build and probe sides (hash collisions only
    * add Bloom false positives — extra shuffle, never wrong results,
    * because the real join predicate still runs after the prune).
    */
  def join(fact: DataFrame, dim: DataFrame, factKey: String,
           dimKey: String, expectedDimRows: Long, fpp: Double = 0.01): DataFrame = {
    GraftFunctions.register(fact.sparkSession)
    import org.apache.spark.sql.types._
    def isIntegral(df: DataFrame, name: String): Boolean =
      df.schema(df.schema.fieldIndex(name)).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    val integral = isIntegral(dim, dimKey) && isIntegral(fact, factKey)
    def asLong(c: org.apache.spark.sql.Column) =
      if (integral) c.cast("long") else xxhash64(c)
    // the standard optimal-bits formula, capped at Spark's runtime
    // bloom-filter ceiling (64 Mbit = 8 MB bitmap)
    val numBits = math.min(
      math.ceil(-expectedDimRows * math.log(fpp) /
        (math.log(2) * math.log(2))).toLong,
      67108864L).max(64L)
    val bloomBytes = dim
      .select(call_function(GraftFunctions.BloomAggName,
        asLong(col(dimKey)), lit(expectedDimRows), lit(numBits))
        .as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bloomBytes == null)
      // empty dim side: the plain join is empty too — emit the same
      // (empty) shape without probing a null sketch
      fact.filter(lit(false)).join(dim, col(factKey) === col(dimKey))
    else
      fact.filter(call_function(GraftFunctions.MightContainName,
          lit(bloomBytes), asLong(col(factKey))))
        .join(dim, col(factKey) === col(dimKey))
  }
}
