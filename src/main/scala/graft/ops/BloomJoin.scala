package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * the explicit form for when the planner doesn't, and the bloom build
  * is a distributed treeAggregate on the dim side, not a collect of
  * keys.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pruning fact
    * through a Bloom filter of dim keys first. Keys must be integral
    * (LongType after cast).
    */
  def join(fact: DataFrame, dim: DataFrame, factKey: String,
           dimKey: String, expectedDimRows: Long, fpp: Double = 0.01): DataFrame = {
    val bf = dim.stat.bloomFilter(dimKey, expectedDimRows, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    fact.filter(mightContain(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
