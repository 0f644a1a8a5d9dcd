package graft

/** Every native expression must actually COMPILE under Janino — Spark
  * silently falls back to interpreted eval when expression codegen
  * fails (the q88 Janino shift-paren bug shipped value-correct but
  * interpreted for four rounds exactly this way), so value assertions
  * alone cannot catch the regression. CODEGEN_ONLY makes the compile
  * failure fatal; whole-stage codegen is disabled so every expression
  * goes through the generated-projection path this config governs.
  */
class CodegenCompileSpec extends SparkSpec {
  import spark.implicits._

  test("all scalar native expressions compile under CODEGEN_ONLY") {
    graft.expr.GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val df = Seq(("hello world text sample", 7L, 9L,
          Array(1.0f, 2.0f, 3.0f, 4.0f), Array(5L, 6L, 7L)))
        .toDF("text", "x", "y", "vec", "hashes")
      // 2 subspaces × 2 centroids × dim 2 (vec dim 4) / 2 centroids of
      // dim 4 for the coarse argmax — minimal shapes, foldable literals
      val cb = "array(array(array(0.1F,0.2F),array(0.3F,0.4F))," +
        "array(array(0.5F,0.6F),array(0.7F,0.8F)))"
      val cents = "array(array(1.0F,0.0F,0.0F,0.0F)," +
        "array(0.0F,1.0F,0.0F,0.0F))"
      val out = df.selectExpr(
        "graft_cosine_sim(vec, vec) AS a",
        "graft_shingle_hashes(split(text, ' '), 3) AS b",
        "graft_shingle_hashes_all(split(text, ' '), 3) AS c",
        "graft_minhash_sig(hashes, 8) AS d",
        "graft_word_shingles(split(text, ' '), 2) AS e",
        "graft_hyperplane_bits(vec, 8) AS f",
        "graft_normalize(text) AS g",
        "graft_zorder(x, y) AS h",
        "graft_simhash64(hashes) AS i",
        s"graft_argmax_cosine(vec, $cents) AS j",
        s"graft_pq_encode(vec, $cb) AS k",
        s"graft_pq_adc(graft_pq_encode(vec, $cb), vec, $cb) AS l",
        "graft_geohash(CAST(57.64911 AS DOUBLE), CAST(10.40744 AS DOUBLE), 5) AS m",
        "graft_hilbert(x, y, 8) AS n"
      ).collect()
      assert(out.length == 1)
      assert(out.head.getLong(7) == ZOrderRef.zref(7L, 9L, 16))
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }
}

/** Shared hand-rolled Morton reference (also used by ZOrderSpec). */
object ZOrderRef {
  def zref(x: Long, y: Long, bits: Int): Long = {
    val m = (1L << bits) - 1
    val (a, b) = (x & m, y & m)
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }
  }
}
