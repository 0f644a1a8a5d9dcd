package graft

import org.apache.spark.sql.functions._

import graft.Graft.table
import graft.ext.Similarity

/** Pins the approximate similarity paths against their exact baselines
  * on the sf0.001 embeddings fixture (500 × 64-dim float vectors).
  * The approximate operators are the 100 TB paths (no cross join); the
  * exact ones are the verification references the driver oracle-checks.
  */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb = table(spark, dir, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("lshNearDupPairs: subset of exact pairs (precision 1.0), recall pinned") {
    val tau = 0.35
    val exact = Similarity.cosinePairsExact(emb, tau)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshNearDupPairs(emb, tau)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // exact-verify step makes false positives impossible
    assert(approx.subsetOf(exact))
    val recall = approx.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall (approx ${approx.size}/${exact.size})")
  }

  test("HyperplaneSignBits: bit-identical to the HOF bucket form (8 and 16 planes)") {
    graft.expr.GraftFunctions.register(spark)
    for (nPlanes <- Seq(8, 16)) {
      val diff = emb.select(
          Similarity.lshBucket(col("vec"), nPlanes).as("native"),
          Similarity.lshBucketHof(col("vec"), nPlanes).as("hof"))
        .filter(col("native") =!= col("hof"))
        .count()
      assert(diff == 0, s"native/HOF bucket mismatch on $diff rows at nPlanes=$nPlanes")
    }
    // buckets actually discriminate (not all vectors in one bucket)
    val distinct = emb.select(Similarity.lshBucket(col("vec"), 8)).distinct().count()
    assert(distinct > 1)
  }

  test("ArgMaxCosine: matches driver-side argmax on all vectors; assignment is narrow") {
    graft.expr.GraftFunctions.register(spark)
    val rows = emb.orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val cmat: Seq[Seq[Float]] = rows.take(8).map(_._2.toSeq).toSeq
    def expected(v: Seq[Float]): Int = {
      val scores = cmat.map { c =>
        val dot = v.zip(c).map { case (a, b) => a.toDouble * b.toDouble }.sum
        val nc = c.map(x => x.toDouble * x.toDouble).sum
        dot / math.sqrt(nc)
      }
      scores.indexOf(scores.max)
    }
    val df = emb.withColumn("list_id", Similarity.argMaxCosine(col("vec"), cmat))
    val got = df.orderBy("id").collect().map(_.getAs[Int]("list_id"))
    rows.zip(got).foreach { case ((id, v), g) =>
      assert(g == expected(v.toSeq), s"vec $id assigned $g")
    }
    // the whole assignment is one narrow map: no join, no exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"centroid assignment is not narrow:\n$plan")
  }

  test("ivfTopK: recall@3 vs brute force pinned; no self-matches") {
    val qs = emb.filter(col("id") < 50)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteTopK(qs, emb, 3))
    val ivf = Similarity.ivfTopK(qs, emb, 3)
    val ivfPairs = pairs(ivf)
    assert(brute.size == 150 && ivfPairs.size == 150)
    assert(!ivfPairs.exists(p => p._1 == p._2))
    val recall = (brute intersect ivfPairs).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@3 $recall")
  }

  test("quantizeInt8: hand-computed codes, error bound, zero-vector guard") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f))
    ).toDF("id", "vec")
    val got = df.select(col("id"), Similarity.quantizeInt8(col("vec")).as("qz"))
      .select(col("id"), col("qz.scale"), col("qz.q"))
      .orderBy("id").collect()
    val scale = got(0).getDouble(1)
    assert(math.abs(scale - 1.0 / 127) < 1e-15)
    // floor(v/scale + 0.5) = floor(127 v + 0.5): 127, -63, 32, 0
    assert(got(0).getSeq[Long](2) == Seq(127L, -63L, 32L, 0L))
    assert(got(1).isNullAt(2), "zero vector must yield null codes, not a crash")

    // reconstruction: |v - q*scale| <= scale/2 element-wise
    val errs = df.filter(col("id") === 1)
      .select(Similarity.quantizeInt8(col("vec")).as("qz"), col("vec"))
      .select(Similarity.dequantError(col("vec"), col("qz.q"), col("qz.scale"))
        .as("e"))
      .head.getSeq[Double](0)
    assert(errs.forall(_ <= scale / 2 + 1e-15), errs.toString)
    assert(math.abs(errs(1) - 0.003937) < 1e-4)
  }

  test("PQ: encode picks the nearest codeword; ADC distance exact on a hand codebook") {
    import spark.implicits._
    graft.expr.GraftFunctions.register(spark)
    // 4-dim, m=2 subspaces × 2 codewords each, hand-placed
    val cb: Seq[Seq[Seq[Float]]] = Seq(
      Seq(Seq(0f, 0f), Seq(1f, 1f)),
      Seq(Seq(0f, 1f), Seq(1f, 0f)))
    val cbLit = typedlit(cb)
    val df = Seq(
      (1L, Seq(0.9f, 0.8f, 0.1f, 0.9f)), // → codes (1, 0)
      (2L, Seq(0.1f, 0.2f, 0.9f, 0.4f))  // → codes (0, 1)
    ).toDF("id", "vec")
    val enc = df.select(col("id"),
        call_function("graft_pq_encode", col("vec"), cbLit).as("codes"))
      .orderBy("id").collect()
    assert(enc(0).getSeq[Int](1) == Seq(1, 0))
    assert(enc(1).getSeq[Int](1) == Seq(0, 1))
    // ADC vs a hand-computed distance: q = the id=1 vector against
    // codes (0, 1): (0.9² + 0.8²) + ((0.1−1)² + 0.9²) = 3.07
    val adc = df.filter(col("id") === 1)
      .select(call_function("graft_pq_adc",
        typedlit(Seq(0, 1)), col("vec"), cbLit))
      .head.getDouble(0)
    assert(math.abs(adc - 3.07) < 1e-6)
  }

  test("pqTopKRerank: with a full-corpus shortlist the re-rank equals brute force") {
    val qs = emb.filter(col("id") < 5)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val train = emb.filter(col("id") < 256).orderBy(col("id"))
      .select(col("vec")).collect().map(_.getSeq[Float](0)).toSeq
    val cb = Similarity.pqTrain(train, m = 8, k = 16)
    // deterministic training: same input → identical codebook
    assert(cb == Similarity.pqTrain(train, m = 8, k = 16))
    val full = Similarity.pqTopKRerank(qs, emb, 3, shortlist = 1000, cb)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Similarity.bruteTopK(qs, emb, 3)
      .select("qid", "nid", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(full == brute,
      "full-shortlist rerank must reproduce exact top-k (quantization only gates the shortlist)")
    // honest-shortlist recall pinned on the fixture
    val short = Similarity.pqTopKRerank(qs, emb, 3, shortlist = 50, cb)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bruteIds = brute.map(t => (t._1, t._2))
    val recall = (short intersect bruteIds).size.toDouble / bruteIds.size
    assert(recall >= 0.4, s"recall@3 $recall")
  }

  test("semDedupPairs: within-bucket drops with minimal witness; cross-bucket blind") {
    import spark.implicits._
    // bucket = signs of dims 1..4. v1/v2/v3 share bucket 15 (all
    // positive) and point the same way; v4 is v1 with dim-1 sign
    // flipped → different bucket, never compared (blocking miss by
    // design); v5 shares bucket 15 but is near-orthogonal to v1.
    val mk = (a: Float, b: Float, c: Float, dd: Float, e: Float, f: Float) =>
      Array(a, b, c, dd, e, f)
    val emb = Seq(
      (1L, mk(1f, 1f, 1f, 1f, 0f, 0f)),
      (2L, mk(1f, 1f, 1f, 1.01f, 0f, 0f)),
      (3L, mk(1.02f, 1f, 1f, 1f, 0f, 0f)),
      (4L, mk(-1f, 1f, 1f, 1f, 0f, 0f)),
      (5L, mk(0.01f, 0.01f, 0.01f, 0.01f, 9f, 9f))
    ).toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val got = Similarity.semDedupPairs(emb, tau = 0.9, signBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 2 and 3 both drop against witness 1 (min id_a); n_dups counts
    // EARLIER neighbors only — 2 has {1}, 3 has {1,2} (1↔2, 1↔3, 2↔3
    // all ≥ 0.9); 4 survives (other bucket); 5 survives (same bucket,
    // low cosine)
    assert(got == Set((2L, 1L, 1L), (3L, 1L, 2L)))
  }

  test("mutualKnnFromPairs: asymmetric neighbors prune; mutual pairs survive") {
    import spark.implicits._
    // node 1's best is 2, but node 2's top-1 is 3 → (1,2) pruned;
    // 2 and 3 pick each other → (2,3) survives
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.99), (1L, 3L, 0.5))
      .toDF("id_a", "id_b", "cos6")
    val got = Similarity.mutualKnnFromPairs(pairs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 3L)))
  }

  test("mutualKnnFromPairs: k large enough keeps every candidate edge; tie ranks by id") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.99), (1L, 3L, 0.5))
      .toDF("id_a", "id_b", "cos6")
    val all = Similarity.mutualKnnFromPairs(pairs, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (2L, 3L), (1L, 3L)))
    // equal scores: neighbor ranking breaks by smaller id first
    val tied = Seq((10L, 11L, 0.8), (10L, 12L, 0.8))
      .toDF("id_a", "id_b", "cos6")
    val got = Similarity.mutualKnnFromPairs(tied, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((10L, 11L)))
  }

  test("knnGraphFromPairs: out-degree capped at k; hub keeps outbound links mutual would drop") {
    import spark.implicits._
    // hub 1 is everyone's candidate; nodes 2/3/4 each prefer the hub.
    // With k=1 the mutual graph keeps only (1, best-of-hub); the
    // navigation graph keeps EVERY node's outbound edge to its best.
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.8), (1L, 4L, 0.7))
      .toDF("id_a", "id_b", "cos6")
    val nav = Similarity.knnGraphFromPairs(pairs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nav == Set((1L, 2L), (2L, 1L), (3L, 1L), (4L, 1L)))
    val mutual = Similarity.mutualKnnFromPairs(pairs, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mutual == Set((1L, 2L)))
    // degree cap holds for any k
    val deg = Similarity.knnGraphFromPairs(pairs, k = 2)
      .groupBy(col("id")).count().agg(max(col("count"))).head().getLong(0)
    assert(deg <= 2)
  }

  test("graphBeamTopK: walks hops beyond the seed set to the true neighbor") {
    import spark.implicits._
    // chain in 2-D angle space: node i at angle i*10°; query at 52° —
    // true top-1 is node 5. Seed ONLY node 0 (cos ≈ 0.6 to the query):
    // reaching node 5 requires walking the chain, so a pass proves the
    // hops contribute beyond seed scoring.
    def v(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val corpus = (0 to 9).map(i => (i.toLong, v(i * 10.0)))
      .toDF("id", "vec")
    val edges = (0 to 8).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id", "nb") // symmetrized inside graphBeamTopK
    val qs = Seq((100L, v(52.0))).toDF("qid", "qvec")
    val seeds = Seq((100L, 0L)).toDF("qid", "id")
    val out = Similarity.graphBeamTopK(qs, corpus, edges, seeds,
        k = 2, beam = 2, hops = 6)
      .orderBy(col("rank")).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(5L, 6L))
    // determinism: same inputs, same ranked list
    val again = Similarity.graphBeamTopK(qs, corpus, edges, seeds,
        k = 2, beam = 2, hops = 6)
      .orderBy(col("rank")).collect().map(_.getLong(1)).toSeq
    assert(again == Seq(5L, 6L))
    // bounded hops: 2 hops from node 0 can reach at best node 2
    val short = Similarity.graphBeamTopK(qs, corpus, edges, seeds,
        k = 1, beam = 2, hops = 2)
      .collect().map(_.getLong(1)).toSeq
    assert(short == Seq(2L))
  }

  test("lshSeedCandidates: per-query cap holds; seeds share a band with the query") {
    val qs = emb.filter(col("id") < 10)
      .select(col("id").as("qid"), col("vec").as("qvec"))
    val seeds = Similarity.lshSeedCandidates(qs, emb, perQuery = 5)
    val perQ = seeds.groupBy(col("qid")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perQ <= 5)
    // every seed collides with its query on ≥1 band key by construction
    val qk = qs.select(col("qid"),
      explode(Similarity.lshBandKeys(col("qvec"), 16, 8)).as("bk"))
    val ck = emb.select(col("id"),
      explode(Similarity.lshBandKeys(col("vec"), 16, 8)).as("bk"))
    val legal = qk.join(ck, Seq("bk")).select("qid", "id").distinct()
    assert(seeds.join(legal, Seq("qid", "id"), "left_anti").count() == 0)
  }
}
