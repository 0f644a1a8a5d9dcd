package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an `Array[Float]` embedding column
  * (north-star EXT, SURVEY.md §2.14).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k — broadcast the (small) query set
  *    against the corpus; one narrow pass per corpus partition, top-k via
  *    window. The 100 TB baseline when the query set is bounded.
  *  - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign
  *    pattern (one narrow pass), queries probe only their bucket; turns
  *    the scan into an equi-join on the bucket key. Approximate: recall
  *    traded for a corpus-partition-pruned plan.
  *
  * All dot products run in double precision via codegen'd higher-order
  * functions (`zip_with` + `aggregate`) — no UDF deserialization of the
  * float arrays (SURVEY.md §7.5#7).
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, left-to-right (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Higher-order-function cosine — works on any numeric array type. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Native fused cosine over `array<float>` (graft.expr.CosineSimilarity,
    * codegen'd, zero per-pair allocation) — requires [[graft.expr
    * .GraftFunctions.register]] on the session; bit-identical to
    * [[cosine]] (same left-to-right accumulation).
    */
  def cosineNative(a: Column, b: Column): Column =
    call_function(graft.expr.GraftFunctions.CosineSimName, a, b)

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries  small DataFrame (qid, qvec) — broadcast side
    * @param corpus   large DataFrame (id, vec)
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val joined = corpus.join(broadcast(queries), col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos"), 6).as("cos6"))
  }

  /** Deterministic pseudo-random hyperplane component: hash-derived value
    * in [-1, 1) from (plane index, dimension index). Zero-egress, seed-free
    * reproducibility — the planes are a pure function of (p, j).
    */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit("plane"), lit(p), j), lit(20000L)).cast("double")
      / 10000.0) - 1.0

  /** Sign-pattern bucket id of a vector under `nPlanes` hyperplanes. */
  def lshBucket(vec: Column, nPlanes: Int = 8): Column =
    (0 until nPlanes).map { p =>
      val d = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, j) => x.cast("double") * planeComponent(p, j)),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: probe only the query's own LSH bucket. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(corpus.sparkSession)
    val bq = queries.withColumn("bucket", lshBucket(col("qvec"), nPlanes))
    val bc = corpus.withColumn("bucket", lshBucket(col("vec"), nPlanes))
    val joined = bc.join(broadcast(bq), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id").as("nid"),
        cosineNative(col("qvec"), col("vec")).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("nid"))
    joined.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos"), 6).as("cos6"))
  }
}
