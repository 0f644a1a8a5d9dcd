package graft

import org.apache.spark.sql.functions._

import graft.ext.{NearDup, Similarity}

/** Semantics of the non-SQL-expressible EXT operators (rows-only under
  * the driver gate): MinHash/LSH near-dup recall, SimHash hamming
  * behavior, Jaccard exactness, cosine top-k ground truth.
  */
class NearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the river bank today"
  private val docs = Seq(
    (1L, base),
    (2L, base + " extra"), // near-dup of 1
    (3L, base.replace("quick", "rapid")), // near-dup of 1
    (4L, "completely different content about spark shuffles and parquet files"),
    (5L, "another unrelated document that talks about volcanoes and geology")
  ).toDF("doc_id", "text")

  test("minhash: near-dups found, unrelated pairs absent") {
    val pairs = NearDup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => b == 4L || a == 4L })
    assert(!pairs.exists { case (a, b) => b == 5L || a == 5L })
  }

  test("deltaDedup: exact / near / new classification with normalization") {
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different text about parquet files and shuffles")
    ).toDF("doc_id", "text")
    val newBatch = Seq(
      // whitespace/case noise only → exact_dup after normalization
      (10L, "The  quick brown fox jumps over the lazy  dog today "),
      // one appended token → high shingle overlap → near_dup
      (11L, "the quick brown fox jumps over the lazy dog today extra"),
      (12L, "entirely fresh content that matches nothing at all here")
    ).toDF("doc_id", "text")
    val got = NearDup.deltaDedup(newBatch, existing, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "exact_dup", 11L -> "near_dup", 12L -> "new"))
  }

  test("jaccard: exact value on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(NearDup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.collect()(0).getDouble(0) - 0.5) < 1e-12)
  }

  test("simhash: native SimHash64 byte-identical to the composed column form") {
    graft.expr.GraftFunctions.register(spark)
    val edge = docs.unionByName(Seq(
      (6L, ""),              // split("") = [""] — one token
      (7L, "one"),           // single token: simhash = its hash
      (8L, "a a a b")        // majority vote with repeats
    ).toDF("doc_id", "text"))
    val both = edge
      .select(col("doc_id"), NearDup.tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"),
        NearDup.simhashFromHashes(col("hs")).as("native"),
        NearDup.simhashFromHashesComposed(col("hs")).as("composed"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"simhash mismatch for doc ${r.getLong(0)}")
    }
  }

  test("simhash: identical text → identical hash; near text → small hamming") {
    graft.expr.GraftFunctions.register(spark)
    val sims = docs
      .select(col("doc_id"), NearDup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(sims(1L), sims(2L)) < ham(sims(1L), sims(4L)))
    assert(ham(sims(1L), sims(3L)) < ham(sims(1L), sims(5L)))
    // deterministic across evaluations
    val again = docs.select(NearDup.simhash(col("text"))).collect().map(_.getLong(0))
    assert(again.toSeq == docs.select(col("doc_id")).collect()
      .map(r => sims(r.getLong(0))).toSeq)
  }

  test("simhashNearDups: exact duplicate collapses to hamming 0") {
    val dup = Seq((1L, base), (2L, base), (3L, "something else entirely here"))
      .toDF("doc_id", "text")
    val pairs = NearDup.simhashNearDups(dup, "doc_id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("cosine top-k: exact neighbors on constructed vectors") {
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f)), // closest to 0
      (2L, Array(0f, 1f, 0f)),
      (3L, Array(0f, 0.9f, 0.1f)), // closest to 2
      (4L, Array(-1f, 0f, 0f)) // opposite of 0
    ).toDF("id", "vec")
    val qs = vecs.filter(col("id") === 0L)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val top = Similarity.bruteTopK(qs, vecs, 4).orderBy(col("rank")).collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(top.last.getDouble(3) == -1.0) // cosine to the opposite vector
  }

  test("ShingleHashes: byte-identical to composed array_distinct/transform/xxhash64") {
    graft.expr.GraftFunctions.register(spark)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short one"),
      (3L, "x"),
      (4L, "a a a a a repeated repeated a a a"),
      (5L, "unicode \u00fc\u00f1\u00ee tokens mixed in \u00fc\u00f1\u00ee text here")
    ).toDF("id", "text").select(col("id"), split(lower(col("text")), " ").as("toks"))
    val composed = texts.select(col("id"),
      array_distinct(transform(NearDup.shinglesFromTokens(col("toks"), 3),
        x => xxhash64(x))).as("sh"))
    val native = texts.select(col("id"), NearDup.shingleHashes(col("toks"), 3).as("sh"))
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(c == n)
  }

  test("winnowing: stable under local edits (shared-run fingerprints survive)") {
    graft.expr.GraftFunctions.register(spark)
    val w = 4
    def fp(text: String): Set[Long] = {
      val df = Seq(Tuple1(text)).toDF("text")
        .select(split(lower(col("text")), " ").as("toks"))
        .select(NearDup.shingleHashesOrdered(col("toks"), 3).as("hs"))
        .select(array_distinct(transform(
          sequence(lit(1), greatest(size(col("hs")) - (w - 1), lit(1))),
          i => array_min(slice(col("hs"), i, lit(w))))).as("fp"))
      df.collect()(0).getSeq[Long](0).toSet
    }
    val doc = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val same = fp(doc)
    assert(same == fp(doc))
    // appending text must not disturb fingerprints selected early in the doc
    val edited = fp(doc + " appended tail of new words here")
    val shared = (same intersect edited).size.toDouble / same.size
    assert(shared >= 0.6, s"local edit destroyed fingerprints (shared=$shared)")
    // unrelated text shares (essentially) nothing
    val other = fp("one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen")
    assert((same intersect other).isEmpty)
  }

  test("blockedJaccardPairs: degenerate shared shingle can't produce B² rows") {
    // every doc shares exactly one stop-shingle ("common shared footer")
    // and nothing else — the worst case for the inverted index: one
    // bucket holding all B docs, B² candidate fanout if uncapped
    val n = 10
    val degenerate = (1 to n).map(i =>
      (i.toLong, "en", 10L, s"unique$i token$i word$i common shared footer"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val full = NearDup.blockedJaccardPairs(degenerate, topK = 100)
    assert(full.count() == n.toLong * (n - 1) / 2) // under the cap: exact
    // a bucket over maxBucket is dropped whole — its B² pairs never exist
    val capped = NearDup.blockedJaccardPairs(degenerate, topK = 100, maxBucket = 5)
    assert(capped.count() == 0)
  }

  test("ShingleGenerate: row stream byte-identical to explode(WordShingles), incl. short docs") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y"),          // shorter than the window → one whole-doc shingle
      (3L, "only"),
      (4L, "p q r")).toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("w"))
    def rows(sql: String) = docs.selectExpr("id", sql)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    val gen = rows("graft_shingle_rows(w, 3) AS s")
    val arr = rows("explode(graft_word_shingles(w, 3)) AS s")
    assert(gen == arr && gen.nonEmpty)
    assert(gen.filter(_._1 == 2L).map(_._2) == Seq("x y"))
    // fixture cross-check: same equality over real documents
    val fix = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), split(lower(col("text")), " ").as("w"))
    val a = fix.selectExpr("doc_id", "graft_shingle_rows(w, 3) AS s")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = fix.selectExpr("doc_id", "explode(graft_word_shingles(w, 3)) AS s")
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    // both expressions reject a non-positive window identically
    intercept[IllegalArgumentException](graft.expr.WordShingles(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 0))
    intercept[IllegalArgumentException](graft.expr.ShingleGenerate(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 0))
  }

  test("duplicateSpans: maximal shared runs, unique docs silent") {
    // docs 1 and 2 share tokens 0..6 (7 tokens) and nothing else; doc 3
    // is unique; doc 4 repeats the shared run at a LATER offset, so its
    // span sits at positions 3..9
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val d = Seq(
      (1L, shared + " one uniqa uniqb uniqc uniqd uniqe uniqf"),
      (2L, shared + " two otheru otherv otherw otherx othery otherz"),
      (3L, "totally disjoint words nobody else uses anywhere at all"),
      (4L, "pre1 pre2 pre3 " + shared + " post1 post2 post3")
    ).toDF("doc_id", "text")
    val spans = NearDup.duplicateSpans(d, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // a 7-token run has 3 five-gram start positions (0,1,2) → one
    // coalesced span of 7 tokens per sharing doc
    assert(spans == Set(
      (1L, 0L, 6L, 7L, 3L),
      (2L, 0L, 6L, 7L, 3L),
      (4L, 3L, 9L, 7L, 3L)))
  }

  test("duplicateSpans: two disjoint shared runs stay two spans") {
    val runA = "a1 a2 a3 a4 a5"
    val runB = "b1 b2 b3 b4 b5"
    val d = Seq(
      (1L, runA + " gapx gapy gapz " + runB),
      (2L, runA + " uniq1 uniq2 uniq3 uniq4 uniq5 uniq6"),
      (3L, runB + " uniq7 uniq8 uniq9 uniq10 uniq11 uniq12")
    ).toDF("doc_id", "text")
    val spans = NearDup.duplicateSpans(d, "doc_id", "text", k = 5)
      .filter(col("doc_id") === 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // doc 1: runA at 0..4, runB at 8..12, the gap tokens break the island
    assert(spans == Set((0L, 4L), (8L, 12L)))
  }

  test("crossDuplicateSpans: corpus spans matching the ref set only") {
    val benchRun = "q1 q2 q3 q4 q5 q6"
    val ref = Seq((100L, benchRun + " tailr1 tailr2")).toDF("doc_id", "text")
    val corpus = Seq(
      // bench run embedded mid-doc → span at positions 2..7
      (1L, "c1 c2 " + benchRun + " c3 c4 c5 c6"),
      // clean doc, nothing shared with ref
      (2L, "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"),
      // corpus docs 1 and 3 share a run with EACH OTHER but not with
      // ref — cross mode must stay silent about corpus-internal dups
      (3L, "c1 c2 x1 x2 x3 x4 x5 x6 x7 x8")
    ).toDF("doc_id", "text")
    val spans = NearDup.crossDuplicateSpans(corpus, ref, "doc_id", "text",
        k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 6-token run → 2 five-gram start positions (2,3) → one span 2..7
    assert(spans == Set((1L, 2L, 7L)))
  }

  test("exciseSpans: flagged ranges cut, clean docs pass through untouched") {
    val d = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (2L, "clean doc with no spans at all")
    ).toDF("doc_id", "text")
    val spans = Seq((1L, 1L, 2L), (1L, 5L, 6L))
      .toDF("doc_id", "span_start", "span_end")
    val got = NearDup.exciseSpans(d, spans, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got(1L) == ((8L, 4L, "t0 t3 t4 t7")))
    assert(got(2L) == ((7L, 0L, "clean doc with no spans at all")))
  }

  test("repeatedSpans: later recurrences only, first occurrence kept") {
    val d = Seq(
      // "r1 r2 r3" at pos 0 and again at pos 5 → the pos-5 trigram is
      // a repeat; first occurrence never flagged
      (1L, "r1 r2 r3 u1 u2 r1 r2 r3 u3 u4"),
      // no trigram repeats anywhere
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    val spans = NearDup.repeatedSpans(d, "doc_id", "text", k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
      .toSet
    assert(spans == Set((1L, 5L, 7L, 1L)))
  }
}
