package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.{Scored, TopKByScore}

/** TopKByScore (the §2.13 UDAF): algebraic properties the oracle query
  * can't see — buffer bound, merge associativity with the sort-take
  * reference, and the partial+final plan shape that makes it O(k) per
  * group across the shuffle.
  */
class AggregatorSpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get

  private def reference(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  test("reduce+merge equal sort-take under arbitrary splits; buffer stays capped") {
    val gen = for {
      xs <- Gen.listOf(Gen.zip(Gen.chooseNum(-100L, 100L), Gen.chooseNum(0L, 50L)))
      k <- Gen.chooseNum(1, 8)
      cut <- Gen.chooseNum(0, xs.size)
    } yield (xs.map { case (s, i) => Scored(s, i) }, k, cut)
    sample(gen, 200, seed = 42L).foreach { case (xs, k, cut) =>
      val agg = new TopKByScore(k)
      val (l, r) = xs.splitAt(cut)
      val b1 = l.foldLeft(agg.zero)(agg.reduce)
      val b2 = r.foldLeft(agg.zero)(agg.reduce)
      assert(b1.size <= k && b2.size <= k)
      assert(agg.merge(b1, b2) === reference(xs, k))
    }
  }

  test("q68 plans partial+final ObjectHashAggregate (map-side combine)") {
    val df = SparkEntry.queries("q68_topk_aggregator")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$p")
  }

  test("duplicate scores tie-break by ascending id") {
    import spark.implicits._
    val topk = udaf(new TopKByScore(2), TopKByScore.inputEncoder)
    val out = Seq((10L, 3L), (10L, 1L), (10L, 2L)).toDF("score", "id")
      .agg(topk(col("score"), col("id")).as("top"))
      .select(explode(col("top")).as("r")).select("r.id")
      .as[Long].collect().toSeq
    assert(out === Seq(1L, 2L))
  }

  test("HeavyHitterSketch: MG guarantee holds under any split/merge shape") {
    import graft.expr.HeavyHitterSketch
    // 3 heavy items (freq > n/(k+1)) buried in a long tail, k = 10
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(350)("beta") ++
      Seq.fill(300)("gamma")
    val tail = (0 until 900).map(i => s"t$i")
    val data = new scala.util.Random(7).shuffle(heavy ++ tail)
    val agg = new HeavyHitterSketch(10)
    val n = data.size
    for (nParts <- Seq(1, 2, 7, 32)) {
      val partials = data.grouped(math.max(1, n / nParts)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      partials.foreach(p => assert(p.size <= 10))
      val out = agg.finish(partials.reduce(agg.merge))
      assert(out.size <= 10)
      for (h <- Seq("alpha", "beta", "gamma"))
        assert(out.contains(h), s"$h missing with $nParts partitions")
    }
  }

  test("HeavyHitterSketch end-to-end: two-pass q81 equals exact HAVING") {
    import spark.implicits._
    val df = SparkEntry.queries("q81_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
    val total = toks.count()
    val exact = toks.groupBy("tok").count()
      .filter(col("count") >= math.ceil(total * 0.03))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(df.nonEmpty && df.toSet == exact)
  }
}
