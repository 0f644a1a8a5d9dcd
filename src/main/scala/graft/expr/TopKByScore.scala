package graft.expr

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Input/output element of the bounded top-k aggregate. */
case class Scored(score: Long, id: Long)

/** Bounded top-k aggregate (SURVEY.md §2.13 — the engine's UDAF
  * surface, as a typed `Aggregator` wired into DataFrames via
  * `functions.udaf`).
  *
  * The buffer is a k-capped array kept sorted by (score desc, id asc);
  * `merge` is a bounded merge of two capped buffers. That bound is the
  * whole point at scale: per-group state is O(k) on the map side, in
  * the shuffle, and in the reducer — against `collect_list`+`slice`
  * whose state is O(group size). Top-k per group over 100 TB shuffles
  * k rows per (partition, group), nothing more.
  *
  * Ties are broken by ascending id, so the result is total-ordered and
  * oracle-deterministic (DuckDB: row_number over score DESC, id ASC).
  */
class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private def worseThanLast(buf: Seq[Scored], x: Scored): Boolean = {
    val last = buf.last
    x.score < last.score || (x.score == last.score && x.id > last.id)
  }

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.size == k && worseThanLast(buf, x)) buf // O(1) fast path
    else (buf :+ x).sortBy(s => (-s.score, s.id)).take(k)

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sortBy(s => (-s.score, s.id)).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopKByScore {
  /** Input encoder for `functions.udaf(new TopKByScore(k), encoder)`. */
  val inputEncoder: Encoder[Scored] = Encoders.product[Scored]
}
