package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Accumulated second moments of a fixed-dimension vector column:
  * row count, per-dimension sum, and the upper triangle of the Gram
  * matrix Σ v·vᵀ packed row-major (index of (i,j), i≤j, is
  * `i*dim - i*(i-1)/2 + (j-i)`).
  */
case class GramBuf(var n: Long, sum: Array[Double], gram: Array[Double])

case class GramResult(n: Long, sum: Seq[Double], gram: Seq[Double])

/** One-pass distributed moment aggregation for covariance / PCA
  * (SURVEY.md §2.13 UDAF surface; §2.14 embedding ops).
  *
  * The buffer is O(D²) per partition — for D=64 that is one 2 080-double
  * array, ~16 KiB — regardless of row count, and `merge` is element-wise
  * addition, so the shuffle moves one buffer per map partition and
  * nothing else. This is the same shape `RowMatrix.computeGramianMatrix`
  * uses in Spark MLlib: the only scalable way to get a covariance matrix
  * out of 100 TB of vectors is a map-side-combined Gram aggregate,
  * never a D×D join of exploded coordinates (the oracle does that —
  * at verify scale — precisely because it is the independent slow way).
  *
  * Per-row cost is D(D+1)/2 fused multiply-adds, embarrassingly
  * parallel; the finalization (divide by n, subtract the mean outer
  * product, eigensolve) is O(D²)–O(D³) DRIVER work on one tiny matrix
  * (graft.ext.Embeddings).
  */
class GramMoments(dim: Int)
    extends Aggregator[Seq[Float], GramBuf, GramResult] {
  require(dim > 0, s"dim must be positive, got $dim")

  private val triLen = dim * (dim + 1) / 2

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](dim), new Array[Double](triLen))

  override def reduce(buf: GramBuf, v: Seq[Float]): GramBuf = {
    require(v != null && v.length == dim,
      s"expected $dim-dim vector, got ${if (v == null) "null" else v.length}")
    // IndexedSeq fast path: WrappedArray from the row converter
    val a = new Array[Double](dim)
    var i = 0
    while (i < dim) { a(i) = v(i).toDouble; i += 1 }
    buf.n += 1
    var idx = 0
    i = 0
    while (i < dim) {
      buf.sum(i) += a(i)
      var j = i
      while (j < dim) { buf.gram(idx) += a(i) * a(j); idx += 1; j += 1 }
      i += 1
    }
    buf
  }

  override def merge(b1: GramBuf, b2: GramBuf): GramBuf = {
    b1.n += b2.n
    var i = 0
    while (i < dim) { b1.sum(i) += b2.sum(i); i += 1 }
    i = 0
    while (i < triLen) { b1.gram(i) += b2.gram(i); i += 1 }
    b1
  }

  override def finish(b: GramBuf): GramResult =
    GramResult(b.n, b.sum.toSeq, b.gram.toSeq)

  override def bufferEncoder: Encoder[GramBuf] = ExpressionEncoder()

  override def outputEncoder: Encoder[GramResult] = ExpressionEncoder()
}

object GramMoments {
  /** Input encoder for `functions.udaf(new GramMoments(d), encoder)`. */
  val inputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()
}
