package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Retrieval

/** Hand-computed fixtures for the lexical retrieval operators
  * (ext/Retrieval): BM25 scores against the Robertson–Spärck-Jones
  * formula evaluated by hand on a 3-doc corpus with known tf/df/dl/
  * avgdl, the null/empty-text population contract (N and avgdl over
  * the same filtered docs), empty-token hygiene for irregular spacing,
  * distinct-token overlap ranking, and RRF fusion including items
  * present in only one input list.
  */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  // d1: tf(apple)=2, dl=3; d2: dl=2; d3: dl=1. N=3, avgdl=2.0.
  private def docs: DataFrame = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "durian")).toDF("doc_id", "text")

  private def qs(rows: (Long, String)*): DataFrame = rows.toDF("qid", "qtext")

  private def bm25(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double,
                   k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) *
      (tf * (k1 + 1)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  private def scoreMap(out: DataFrame): Map[(Long, Long), Double] =
    out.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("bm25Scores: matches the hand-evaluated formula (tf=2 case, multi-term sum)") {
    val out = scoreMap(Retrieval.bm25Scores(docs, "doc_id", "text",
      qs((1L, "apple"), (2L, "banana durian"))))
    // q1 'apple': only d1 matches; tf=2, df=1
    val expApple = bm25(tf = 2, dl = 3, df = 1, n = 3, avgdl = 2.0)
    assert(math.abs(out((1L, 1L)) - expApple) < 1e-12)
    // q2 'banana durian': d1 (banana tf=1 df=2), d2 (banana), d3 (durian df=1)
    val expB1 = bm25(1, 3, 2, 3, 2.0)
    val expB2 = bm25(1, 2, 2, 3, 2.0)
    val expD3 = bm25(1, 1, 1, 3, 2.0)
    assert(math.abs(out((2L, 1L)) - expB1) < 1e-12)
    assert(math.abs(out((2L, 2L)) - expB2) < 1e-12)
    assert(math.abs(out((2L, 3L)) - expD3) < 1e-12)
    assert(out.size === 4, "no pair without a matching term may appear")
    // idf is the non-negative RSJ form: strictly positive even at df=N-ish
    assert(out.values.forall(_ > 0))
  }

  test("bm25Scores: N/avgdl/df computed over the same null-filtered population") {
    val noisy = docs.unionByName(Seq(
      (10L, null.asInstanceOf[String]),
      (11L, ""),
      (12L, "   ")).toDF("doc_id", "text"))
    val clean = scoreMap(Retrieval.bm25Scores(docs, "doc_id", "text",
      qs((1L, "apple"))))
    val withNulls = scoreMap(Retrieval.bm25Scores(noisy, "doc_id", "text",
      qs((1L, "apple"))))
    // null/empty docs must not change N or avgdl — scores identical
    assert(clean === withNulls)
  }

  test("bm25Scores: irregular spacing produces no empty tokens (dl, df unaffected)") {
    val spaced = Seq(
      (1L, " apple  banana apple "), // same tokens as d1, extra spaces
      (2L, "banana cherry"),
      (3L, "durian")).toDF("doc_id", "text")
    val a = scoreMap(Retrieval.bm25Scores(docs, "doc_id", "text", qs((1L, "apple"))))
    val b = scoreMap(Retrieval.bm25Scores(spaced, "doc_id", "text", qs((1L, "apple"))))
    assert(a === b)
    // a double-space query must not probe an "" postings term
    val empt = Retrieval.bm25Scores(spaced, "doc_id", "text", qs((9L, "apple  banana")))
    assert(empt.count() === 2) // d1, d2 (banana), not d3
  }

  test("bm25TopK: rounded-score ordering with doc-id tiebreak") {
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        qs((2L, "banana durian")), k = 2)
      .orderBy(col("rank")).collect()
    assert(out.length === 2)
    // d3 scores highest (rare term, shortest doc), then banana docs
    assert(out(0).getAs[Long]("doc_id") === 3L && out(0).getAs[Long]("rank") === 1L)
    val r2 = out(1)
    assert(math.abs(r2.getAs[Double]("score_r") -
      math.rint(bm25(1, 2, 2, 3, 2.0) * 1e4) / 1e4) < 1e-9)
    // equal rounded scores resolve by id: duplicate-text corpus
    val tied = Seq((5L, "pear"), (4L, "pear"), (6L, "pear")).toDF("doc_id", "text")
    val ranks = Retrieval.bm25TopK(tied, "doc_id", "text", qs((1L, "pear")), k = 3)
      .orderBy(col("rank")).collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ranks === Seq(4L, 5L, 6L))
  }

  test("overlapTopK: |Q ∩ D| distinct-token ranking, ties by id") {
    val out = Retrieval.overlapTopK(docs, "doc_id", "text",
        qs((1L, "apple banana cherry")), k = 3)
      .orderBy(col("rank")).collect()
    // d1 {apple,banana} inter=2; d2 {banana,cherry} inter=2; tie → id
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("inter"))).toSeq
      === Seq((1L, 2L), (2L, 2L)))
    // duplicate tokens in the DOC count once (distinct semantics)
    val rep = Seq((1L, "apple apple apple"), (2L, "apple banana")).toDF("doc_id", "text")
    val o2 = Retrieval.overlapTopK(rep, "doc_id", "text", qs((1L, "apple banana")), k = 2)
      .orderBy(col("rank")).collect()
    assert(o2.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("inter"))).toSeq
      === Seq((2L, 2L), (1L, 1L)))
  }

  test("rrfFuse: full-outer semantics — items in only one list keep a null rank") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "doc_id", "rank")
    val b = Seq((1L, 11L, 1L), (1L, 12L, 2L)).toDF("qid", "doc_id", "rank")
    val out = Retrieval.rrfFuse(a, b, "doc_id", k = 3)
      .orderBy(col("rank")).collect()
    // 11: 1/62 + 1/61 wins; 10: 1/61; 12: 1/62
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(11L, 10L, 12L))
    assert(out(1).isNullAt(out(1).fieldIndex("rank_b")))
    assert(out(2).isNullAt(out(2).fieldIndex("rank_a")))
    val exp11 = math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6
    assert(math.abs(out(0).getAs[Double]("rrf6") - exp11) < 1e-12)
    val exp10 = math.rint((1.0 / 61) * 1e6) / 1e6
    assert(math.abs(out(1).getAs[Double]("rrf6") - exp10) < 1e-12)
  }
}
