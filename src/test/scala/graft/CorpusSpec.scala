package graft

import org.apache.spark.sql.functions._

import graft.ext.Corpus

/** Pins the corpus-curation operators (ext.Corpus) on constructed data
  * where the expected values are hand-computable, plus the scale
  * contracts (sampling is a scan predicate; packing never splits a doc).
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("tokenStats: exact counts on constructed docs") {
    val docs = Seq(
      (1L, "a a b c"),        // 4 tokens, 3 distinct, top 2
      (2L, "x"),              // 1 token
      (3L, "Y y y y")         // lowercased: 4 tokens, 1 distinct, top 4
    ).toDF("doc_id", "text")
    val got = Corpus.tokenStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 4L, 3L, 2L), (2L, 1L, 1L, 1L), (3L, 4L, 1L, 4L)))
  }

  test("repetitionFilter: keep decision matches the ratio thresholds") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),   // distinct 1.0, top 0.1 → kept
      (2L, "a a a a a a a a b c")    // distinct 0.3, top 0.8 → dropped
    ).toDF("doc_id", "text")
    val kept = Corpus.repetitionFilter(docs, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getAs[Boolean]("kept"))
    assert(kept.toSeq == Seq(true, false))
  }

  test("segmentDedup: first occurrence wins, within-doc repeats drop, full dedup yields empty text") {
    val docs = Seq(
      (1L, "a b c x y z a b c"),  // segs: "a b c", "x y z", "a b c" — 3rd repeats the 1st IN-DOC
      (2L, "x y z q r"),          // "x y z" already seen in doc 1; "q r" (short tail) is new
      (3L, "a b c")               // fully boilerplate — everything seen
    ).toDF("doc_id", "text")
    val got = Corpus.segmentDedup(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[String]("kept_text")))
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, "a b c x y z"),
      (2L, 2L, 1L, "q r"),
      (3L, 1L, 0L, "")))
  }

  test("segmentDedup: segment boundaries clip, single narrow pass builds segments") {
    val docs = Seq((7L, "t1 t2 t3 t4")).toDF("doc_id", "text") // "t1 t2 t3" + "t4"
    val out = Corpus.segmentDedup(docs, "doc_id", "text").collect().head
    assert(out.getLong(1) == 2L && out.getAs[String]("kept_text") == "t1 t2 t3 t4")
    // scale contract: the token stream is never exploded — the only
    // generator in the plan explodes the (much smaller) segment array
    val plan = Corpus.segmentDedup(docs, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("posexplode(split"))
  }

  test("stratifiedSample: deterministic, rate-proportional, a pure scan predicate") {
    val df = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    def run() = Corpus.stratifiedSample(df, col("doc_id"), col("lang"),
      Map("en" -> 300L), 150L)
    val a = run().select("doc_id").collect().map(_.getLong(0)).toSet
    val b = run().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty) // identical sample across runs
    // rate lands in a loose band around the target (multiplicative hash
    // on sequential ids is near-uniform)
    val en = df.filter(col("lang") === "en").count().toDouble
    val enSampled = run().filter(col("lang") === "en").count().toDouble
    assert(enSampled / en > 0.15 && enSampled / en < 0.45,
      s"en rate ${enSampled / en} far from 0.30")
    // no shuffle: the predicate evaluates at the scan
    assert(!run().queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("packShards: budget respected, docs never split, strata independent") {
    val docs = Seq(
      ("en", 1L, 900L), ("en", 2L, 900L), ("en", 3L, 900L), // cum 900/1800/2700
      ("de", 10L, 2500L),                                   // oversized → own shard 0
      ("de", 11L, 100L)
    ).toDF("lang", "doc_id", "w")
    val got = Corpus.packShards(docs, col("lang"), col("doc_id"), col("w"), 2000L)
      .select("lang", "doc_id", "shard").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // en start offsets 0/900/1800, all < 2000 → shard 0 (a doc may
    // overflow the budget it STARTS under, but is never split);
    // de row 11 starts at 2500 → shard 1
    assert(got == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L),
      ("de", 10L, 0L), ("de", 11L, 1L)))
  }

  test("scrubPii: global replacement of emails and phones, text otherwise intact") {
    val got = Seq(
      "mail a@b.co and c.d+e@f-g.org end",
      "call 555-123-4567 or 555.987.6543",
      "no pii here 12345",
      "almost@nope and 55-123-4567"
    ).toDF("t").select(Corpus.scrubPii(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(got(0) == "mail <EMAIL> and <EMAIL> end")
    assert(got(1) == "call <PHONE> or <PHONE>")
    assert(got(2) == "no pii here 12345")
    assert(got(3) == "almost@nope and 55-123-4567")
  }

  test("trainTestSplit: deterministic, keyed by identity, roughly rate-proportional") {
    val df = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    def run() = Corpus.trainTestSplit(df, col("doc_id"), 200L)
    val a = run().filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = run().filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "split must be identical across re-runs")
    val n = df.count()
    assert(a.size > n / 10 && a.size < n * 3 / 10,
      s"test fraction ${a.size}/$n should be near 20%")
  }

  test("crossSplitLeakage: flags exactly the fingerprints present in both splits") {
    val rows = Seq(
      (1L, "train", Some("dup")), (2L, "test", Some("dup")), // leaked both ways
      (3L, "train", Some("only_train")), (4L, "test", Some("only_test")),
      (5L, "train", Some("dup2")), (6L, "train", Some("dup2")), // same split: NOT leaked
      (7L, "test", None)  // null fingerprint: kept in output, never leaked
    ).toDF("id", "split", "fp")
    val got = Corpus.crossSplitLeakage(rows, col("split"), col("fp"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Boolean]("leaked")))
    assert(got.toSeq == Seq(1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> false, 6L -> false, 7L -> false))
  }

  test("wordNgrams: positions, joining, and the short-doc empty case") {
    val got = Seq("a b c d", "a b", "").toDF("t")
      .select(Corpus.wordNgrams(split(col("t"), " "), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }

  test("contaminationScreen: hit counts and overlap against a tiny benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"), // shares "the quick brown fox" window? n=4
      (2L, "totally unrelated text goes here now"),
      (3L, "the quick brown fox jumps high today") // superset of doc 1's grams
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox")).toDF("doc_id", "text")
    val got = Corpus.contaminationScreen(corpus, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_ngrams"),
        r.getAs[Long]("n_hit")))
    // doc1: 3 4-grams, 1 hit; doc2: 3, 0; doc3: 4, 1
    assert(got.toSeq == Seq((1L, 3L, 1L), (2L, 3L, 0L), (3L, 4L, 1L)))
  }

  test("sliceSequences: exact boundaries, docs split across sequences, strata independent") {
    val docs = Seq(
      ("en", 0L, 0L),                                       // zero-weight at stratum start
      ("en", 1L, 300L), ("en", 2L, 300L), ("en", 3L, 500L), // offsets 0/300/600
      ("de", 10L, 1200L)                                    // spans 3 sequences alone
    ).toDF("lang", "doc_id", "n_tok")
    val got = Corpus.sliceSequences(docs, col("lang"), col("doc_id"),
        col("n_tok"), 512L)
      .select("lang", "doc_id", "seq_id", "tok_start", "tok_end")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == Set(
      ("en", 1L, 0L, 0L, 300L),      // fits in seq 0
      ("en", 2L, 0L, 300L, 512L),    // split: head fills seq 0...
      ("en", 2L, 1L, 512L, 600L),    // ...tail opens seq 1
      ("en", 3L, 1L, 600L, 1024L),   // split across 1 and 2
      ("en", 3L, 2L, 1024L, 1100L),
      ("de", 10L, 0L, 0L, 512L),     // one doc, three sequences
      ("de", 10L, 1L, 512L, 1024L),
      ("de", 10L, 2L, 1024L, 1200L)))
    // every interior sequence is exactly 512 tokens
    val seqTotals = Corpus.sliceSequences(docs, col("lang"), col("doc_id"),
        col("n_tok"), 512L)
      .groupBy("lang", "seq_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("n"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    assert(seqTotals(("en", 0L)) == 512L && seqTotals(("en", 1L)) == 512L
      && seqTotals(("en", 2L)) == 76L)
  }

  test("stripMarkup: script bodies die with tags, entities decode, whitespace collapses") {
    val got = Seq(
      "<div><p>hello  world</p><script>var x=1;</script></div>",
      "a &amp; b &lt;c&gt;",
      "plain text",
      "<style type=\"text/css\">.x{color:red}</style>after",
      "x &amp;lt;b&amp;gt; y"  // doubly-escaped: must decode ONE level
    ).toDF("t").select(Corpus.stripMarkup(col("t")).as("s"))
      .collect().map(_.getString(0))
    assert(got(0) == "hello world")
    assert(got(1) == "a & b <c>")
    assert(got(2) == "plain text")
    assert(got(3) == "after")
    assert(got(4) == "x &lt;b&gt; y",
      "&amp; must decode LAST or double-escapes double-unescape")
  }

  test("graft_normalize: NFC composes decomposed marks, ASCII passes through, NFD expands") {
    graft.expr.GraftFunctions.register(spark)
    val decomposed = "cafe\u0301"        // e + COMBINING ACUTE (5 cp)
    val composed = "caf\u00e9"           // U+00E9 (4 cp)
    val df = Seq(decomposed, "ascii only", composed).toDF("t")
      .selectExpr("graft_normalize(t) AS nfc", "graft_normalize(t, 'NFD') AS nfd",
        "length(t) AS n_raw", "length(graft_normalize(t)) AS n_nfc")
    val rows = df.collect()
    // decomposed e+COMBINING ACUTE -> single U+00E9 under NFC
    assert(rows(0).getString(0) == composed && rows(0).getInt(3) == 4
      && rows(0).getInt(2) == 5)
    // ASCII unchanged under every form
    assert(rows(1).getString(0) == "ascii only" && rows(1).getString(1) == "ascii only")
    // pre-composed input: NFC identity, NFD expands back to 5 codepoints
    assert(rows(2).getString(0) == composed && rows(2).getString(1) == decomposed)
  }

  test("denseIds: equals the serial global window, ids dense 0..n-1, parallel partitions") {
    val df = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val got = Corpus.denseIds(df, col("doc_id"), partitions = 7)
      .select("doc_id", "dense_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = df.count()
    // serial reference: rank of doc_id in sorted order
    val sorted = df.select("doc_id").collect().map(_.getLong(0)).sorted
    sorted.zipWithIndex.foreach { case (id, i) =>
      assert(got(id) == i.toLong, s"doc $id")
    }
    assert(got.values.min == 0L && got.values.max == n - 1
      && got.values.toSeq.distinct.size == n.toInt)
  }

  test("keepCanonical: highest quality wins, ties break to smallest order") {
    val rows = Seq(
      (1L, "c1", 100L), (2L, "c1", 300L), (3L, "c1", 300L), // tie: 2 beats 3
      (4L, "c2", 50L),                                      // singleton
      (5L, "c3", 10L), (6L, "c3", 20L)
    ).toDF("id", "cluster", "q")
    val kept = Corpus.keepCanonical(rows, col("cluster"), col("q"), col("id"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("rebalanceMixture: achieved mix near target, zero-share strata dropped, deterministic") {
    val df = Graft.table(spark, "/root/testdata/sf0.001", "documents")
    def run() = Corpus.rebalanceMixture(df, col("lang"), col("doc_id"),
      Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2))
    val counts = run().groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet.subsetOf(Set("en", "de", "zh")),
      s"zero-share strata must be dropped: $counts")
    val raw = df.filter(col("lang").isin("en", "de", "zh"))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum < raw.values.sum,
      s"rebalance must actually downsample: kept $counts of $raw")
    val total = counts.values.sum.toDouble
    // hash-threshold sampling is approximate: shares within ±10 points
    assert(math.abs(counts("en") / total - 0.5) < 0.10, counts.toString)
    assert(math.abs(counts("de") / total - 0.3) < 0.10, counts.toString)
    val again = run().groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts, "sample must be identical across re-runs")
  }

  test("weightedSample: A-Res priorities — heavier rows likelier, reproducible, w≤0 excluded") {
    val df = (1L to 400L).map(i => (i, if (i <= 200) 1L else 100L))
      .toDF("id", "w")
      .unionByName(Seq((401L, 0L), (402L, -5L)).toDF("id", "w"))
    val got = Corpus.weightedSample(df, col("id"), col("w"), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(401L) && !got.contains(402L),
      "non-positive weights must be excluded")
    // the 100×-weight half must dominate the sample
    val heavy = got.count(_ > 200)
    assert(heavy > 35, s"heavy rows in sample: $heavy/50")
    // deterministic across re-runs
    val again = Corpus.weightedSample(df, col("id"), col("w"), k = 50)
      .collect().map(_.getLong(0)).toSet
    assert(again === got)
    // matches a local recomputation of the exact same priorities
    val expected = (1L to 400L).map { i =>
      val u = (math.floorMod(i * 2654435761L, 1000L) + 0.5) / 1000.0
      val w = if (i <= 200) 1.0 else 100.0
      (i, math.pow(u, 1.0 / w))
    }.sortBy { case (i, p) => (-p, i) }.take(50).map(_._1).toSet
    assert(got === expected)
  }

  test("vocabCoverage: OOV ratios against a hand-built vocabulary") {
    val docs = Seq(
      (1L, "a b c", "en"),     // all in vocab(2) iff vocab = {a, b}? c is oov
      (2L, "a a a", "en"),     // fully covered by {a,..}
      (3L, "z q", "de")        // fully oov vs {a, b}
    ).toDF("doc_id", "text", "lang")
    // df: a→2 docs, b→1, c→1, z→1, q→1; top-2 by (df desc, term) = a, b
    val got = Corpus.vocabCoverage(docs, "doc_id", "text", col("lang"), 2)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // en: doc1 oov 1/3, doc2 oov 0 → avg (0.3333+0)/2 = 0.1667, full_cover 1
    // de: doc3 oov 2/2 = 1.0, full_cover 0
    assert(got.toSeq === Seq(("de", 1L, 1.0, 0L), ("en", 2L, 0.1667, 1L)))
  }

  test("bigramLmScore: hand-computed add-one-smoothed perplexity") {
    // reference doc: tokens [a,b,a,c] → bigrams {a b, b a, a c},
    // unigrams a:2 b:1 c:1, V=3
    val ref = Seq((0L, "a b a c")).toDF("doc_id", "text")
    // candidate [a,b,x]: lp(a b)=ln((1+1)/(2+3)), lp(b x)=ln((0+1)/(1+3))
    // → ppl = (0.4*0.25)^(-1/2) = 3.1623; one unseen bigram
    val cand = Seq((1L, "a b x"), (2L, "y")).toDF("doc_id", "text")
    val got = Corpus.bigramLmScore(cand, ref, "doc_id", "text").collect()
    assert(got.length === 1, "single-token doc must be absent")
    val r = got.head
    assert(r.getLong(0) === 1L && r.getLong(1) === 2L && r.getLong(2) === 1L)
    assert(math.abs(r.getDouble(3) - 3.1623) < 1e-9)
  }

  test("qualityScoreLinear: arithmetic weights, mean pool, sigmoid") {
    // "ab": 2*37+97*17+98 = 1821 → %201 = 12 → w=-0.88
    // "z":  1*37+122*17+122 = 2233 → %201 = 22 → w=-0.78
    // "t":  1*37+116*17+116 = 2125 → %201 = 115 → w=+0.15
    val df = Seq((1L, "ab z"), (2L, "t"), (3L, "")).toDF("doc_id", "text")
    val got = Corpus.qualityScoreLinear(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(!got.contains(3L), "empty doc must be absent")
    val s1 = 1.0 / (1.0 + math.exp(0.83))
    assert(got(1L)._1 === 2 &&
      math.abs(got(1L)._2 - math.rint(s1 * 1e4) / 1e4) < 1e-12 &&
      !got(1L)._3)
    val s2 = 1.0 / (1.0 + math.exp(-0.15))
    assert(got(2L)._1 === 1 &&
      math.abs(got(2L)._2 - math.rint(s2 * 1e4) / 1e4) < 1e-12 &&
      got(2L)._3)
  }

  test("keyHistogram: counts, shares, and skew factor on a constructed skew") {
    import graft.ops.Diagnose
    // key 7 → 60 rows, keys 1..20 → 2 rows each: 100 rows, 21 keys(?) no:
    // 7 also in 1..20 → 62 rows for key 7? keep keys disjoint: 21..40
    val df = (Seq.fill(60)(7L) ++ (21L to 40L).flatMap(k => Seq(k, k)))
      .toDF("k")
    val got = Diagnose.keyHistogram(df, col("k"), topK = 3)
      .orderBy(col("cnt").desc, col("key")).collect()
    assert(got.length === 3)
    val top = got.head
    assert(top.getAs[Long]("key") === 7L && top.getAs[Long]("cnt") === 60L)
    assert(math.abs(top.getAs[Double]("share") - 0.6) < 1e-9)
    assert(top.getAs[Long]("n_keys") === 21L)
    // skew = max/mean = 60 / (100/21) = 12.6
    assert(math.abs(top.getAs[Double]("skew_factor") - 12.6) < 1e-9)
    assert(got(1).getAs[Long]("cnt") === 2L && got(1).getAs[Long]("key") === 21L)
  }

  test("chunkOverlap: stride windows cover every token, last chunk short, tiny doc = one chunk") {
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"), // 7 toks, len 3 stride 2 → ceil(4/2)+1 = 3 chunks
      (2L, "a")                     // 1 tok → exactly one chunk
    ).toDF("doc_id", "text")
    val got = Corpus.chunkOverlap(docs, "doc_id", "text", chunkLen = 3, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("n_toks"),
        r.getAs[String]("chunk")))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 3L, "t0 t1 t2"),
      (1L, 1L, 2L, 3L, "t2 t3 t4"),
      (1L, 2L, 4L, 3L, "t4 t5 t6"),
      (2L, 0L, 0L, 1L, "a")))
    // every token index appears in some chunk (coverage), adjacent
    // chunks overlap by chunkLen - stride
    val eight = Seq((3L, (0 until 8).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Corpus.chunkOverlap(eight, "doc_id", "text", 3, 2)
      .select("tok_start", "n_toks").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val covered = chunks.flatMap { case (s, n) => s until (s + n) }.toSet
    assert(covered == (0L until 8L).toSet)
  }

  test("topPBudget: boundary doc kept, p=0 keeps nothing, p=1000 keeps all") {
    // lang en: tokens by quality desc = 50, 30, 20 (total 100)
    val docs = Seq(
      (1L, "en", 9L, 50L), (2L, "en", 5L, 30L), (3L, "en", 1L, 20L),
      (4L, "de", 7L, 10L)
    ).toDF("doc_id", "lang", "q", "n_tok")
    def kept(p: Long) = Corpus.topPBudget(docs, col("lang"), col("q"),
        col("doc_id"), col("n_tok"), p)
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    // p=600: doc1 (cum_before 0 < 60) kept, doc2 (50 < 60) kept —
    // crosses the budget and stops it: doc3 (80 >= 60) dropped
    assert(kept(600) == Set(1L, 2L, 4L))
    assert(kept(0) == Set.empty[Long])
    assert(kept(1000) == Set(1L, 2L, 3L, 4L))
  }

  test("importanceWeights: hand-computed log ratios, target-likeness ordering") {
    // target (t=true): "a a b"; reference = all: "a a b" + "c c d"
    // counts: a (kt=2, kr=2), b (1,1), c (0,2), d (0,1); nt=3, nr=6, v=4
    val docs = Seq(
      (1L, true, "a a b"), (2L, false, "c c d")
    ).toDF("doc_id", "is_t", "text")
    val got = Corpus.importanceWeights(docs, "doc_id", "text", col("is_t"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    def lr(kt: Long, kr: Long): Double =
      BigDecimal(math.log((kt + 1) * 1.0 / (3 + 4)) -
          math.log((kr + 1) * 1.0 / (6 + 4)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    def doc(lrs: Seq[Double]): Double =
      BigDecimal(lrs.sum / lrs.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = doc(Seq(lr(2, 2), lr(2, 2), lr(1, 1)))
    val d2 = doc(Seq(lr(0, 2), lr(0, 2), lr(0, 1)))
    assert(got.length == 2)
    assert(math.abs(got(0)._3 - d1) < 1e-12 && got(0)._4 == (d1 >= 0))
    assert(math.abs(got(1)._3 - d2) < 1e-12 && got(1)._4 == (d2 >= 0))
    // the target doc scores strictly higher than the off-target doc
    assert(got(0)._3 > got(1)._3 && got(0)._4 && !got(1)._4)
  }

  test("bpePairCounts: vocabulary-weighted adjacent pair counts") {
    // "abab" ×3 (pairs ab,ba,ab), "ab" ×2, "cd" ×1, "x" ignored (len 1)
    val docs = Seq(
      (1L, "abab ab x"),
      (2L, "abab ab"),
      (3L, "abab cd x")
    ).toDF("doc_id", "text")
    val got = Corpus.bpePairCounts(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    // ab: 2 per "abab" ×3 + 1 per "ab" ×2 = 8; ba: 1×3 = 3; cd: 1
    assert(got == List(("ab", 8L), ("ba", 3L), ("cd", 1L)))
  }

  test("bpePairCounts: topN cut follows the total order (count desc, pair asc)") {
    val docs = Seq((1L, "aa bb aa bb cc")).toDF("doc_id", "text")
    // all three pairs have count... aa:2, bb:2, cc:1 → top2 = aa, bb (tie
    // broken ascending), cc cut
    val got = Corpus.bpePairCounts(docs, "text", topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(got == List(("aa", 2L), ("bb", 2L)))
  }

  test("fimExamples: PSM layout at the deterministic cuts, short docs dropped") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"), // n=12 → cuts 4, 8
      (2L, "too short to survive the minimum")         // n=6 → dropped
    ).toDF("doc_id", "text")
    val got = Corpus.fimExamples(docs, "doc_id", "text", minTokens = 12)
      .collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((12L, 4L, 4L, 4L)))
    assert(r.getString(5) ==
      "<fim_prefix> t1 t2 t3 t4 <fim_suffix> t9 t10 t11 t12" +
        " <fim_middle> t5 t6 t7 t8")
  }

  test("bpeLearn/bpeEncode: Sennrich fixture — exact merges and encodings") {
    // hand-derivation: r1 ties (e,s)=9=(s,t) → pair-asc picks (e,s);
    // r2 (es,t)=9; r3 ties (l,o)=7=(o,w) → (l,o); r4 (lo,w)=7;
    // r5 ties at 6 → (e,w); r6 ties (ew,est)=6=(n,ew) → (ew,est)
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L)).toDF("w", "wc")
    val merges = Corpus.bpeLearn(vocab, "w", "wc", k = 6)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est")))
    val enc = vocab
      .select(col("w"), Corpus.bpeEncode(col("w"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
      .toMap
    assert(enc("low") == List("low"))
    assert(enc("lower") == List("low", "e", "r"))
    assert(enc("newest") == List("n", "ewest"))
    assert(enc("widest") == List("w", "i", "d", "est"))
  }

  test("applyBpeMerge: left-to-right non-overlapping — lll → [ll, l]") {
    val got = Seq("lll").toDF("w")
      .select(Corpus.applyBpeMerge(split(col("w"), ""), "l", "l").as("t"))
      .collect()(0).getSeq[String](0).toList
    assert(got == List("ll", "l"))
  }

  test("packBinsFFD: hand fixture — first-fit beats next-fit, no overflow, stratum reset") {
    // weights 6,5,4,3,2 @ budget 10, sorted desc:
    //   FFD: bin0 [6,4], bin1 [5,3,2]            → 2 bins
    //   NF (same order): [6] [5,4] [3,2]         → 3 bins
    val docs = spark.createDataset(Seq(
      Corpus.DocW(1L, "en", 6L), Corpus.DocW(2L, "en", 5L),
      Corpus.DocW(3L, "en", 4L), Corpus.DocW(4L, "en", 3L),
      Corpus.DocW(5L, "en", 2L),
      // second stratum: packer state must reset
      Corpus.DocW(6L, "de", 9L), Corpus.DocW(7L, "de", 9L)))
    val out = Corpus.packBinsFFD(docs, budget = 10L).collect()
      .map(p => p.id -> p).toMap
    assert(out(1L).bin == 0L && out(3L).bin == 0L) // 6+4 share bin0
    assert(out(2L).bin == 1L && out(4L).bin == 1L && out(5L).bin == 1L)
    assert(out.values.filter(_.stratum == "en").map(_.nf_bin).max == 2L)
    // per-bin loads never exceed budget
    val loads = out.values.groupBy(p => (p.stratum, p.bin))
      .view.mapValues(_.map(_.w).sum)
    assert(loads.values.forall(_ <= 10L), loads.toMap)
    // de stratum restarts at bin 0 with two solo bins
    assert(out(6L).bin == 0L && out(7L).bin == 1L)
  }

  test("kAnonymize: rare quasi tuples suppressed to '*', common kept") {
    val df = Seq(
      ("en", "web"), ("en", "web"), ("en", "web"),
      ("de", "book") // rare: 1 < k
    ).toDF("lang", "source")
    val got = Corpus.kAnonymize(df, Seq("lang", "source"), k = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(got.count(_ == (("en", "web", false))) == 3)
    assert(got.count(_ == (("*", "*", true))) == 1)
  }
}
