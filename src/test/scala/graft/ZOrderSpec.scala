package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.ZOrderKey

/** Pins the native Z-order expression: interpreted eval against a
  * hand-rolled reference, codegen path through a real query, masking,
  * and the locality property that makes it a layout key.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def zref(x: Long, y: Long, bits: Int): Long = {
    val m = (1L << bits) - 1
    val (a, b) = (x & m, y & m)
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }
  }

  test("interpreted eval matches reference on random pairs (incl. mask overflow)") {
    val gen = for {
      x <- Gen.chooseNum(0L, 1L << 40)
      y <- Gen.chooseNum(0L, 1L << 40)
      bits <- Gen.chooseNum(1, 31)
    } yield (x, y, bits)
    var seed = Seed(11L)
    (1 to 300).foreach { _ =>
      val (x, y, bits) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val e = ZOrderKey(
        org.apache.spark.sql.catalyst.expressions.Literal(x),
        org.apache.spark.sql.catalyst.expressions.Literal(y), bits)
      assert(e.eval(null) == zref(x, y, bits), s"($x, $y, $bits)")
    }
  }

  test("codegen path (SQL function) matches reference; known vectors") {
    graft.expr.GraftFunctions.register(spark)
    // x=0b101=5, y=0b011=3 → z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val rows = Seq((5L, 3L), (0L, 0L), (65535L, 65535L), (65536L, 0L))
      .toDF("x", "y")
      .selectExpr("graft_zorder(x, y) AS z").as[Long].collect()
    assert(rows(0) == 27L)
    assert(rows(1) == 0L)
    assert(rows(2) == (1L << 32) - 1)  // all 32 low bits set
    assert(rows(3) == 0L)              // 65536 masked to 0 at bits=16
    // cross-check a spread of values through the real codegen path
    val df = (0L until 200L).map(i => (i * 131L, i * 37L)).toDF("x", "y")
      .selectExpr("x", "y", "graft_zorder(x, y) AS z").collect()
    df.foreach(r => assert(r.getLong(2) == zref(r.getLong(0), r.getLong(1), 16)))
  }

  test("codegen COMPILES — no silent interpreted fallback (Janino shift-paren regression)") {
    // Janino misparses `x << (2 * i)` as a cast; Spark then silently
    // falls back to interpreted eval, so a value test alone can't catch
    // it. CODEGEN_ONLY makes the compile failure fatal.
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      graft.expr.GraftFunctions.register(spark)
      val got = Seq((5L, 3L)).toDF("x", "y")
        .selectExpr("graft_zorder(x, y) AS z").as[Long].collect()
      assert(got.head == 27L)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.wholeStage")
    }
  }

  test("locality: nearby (x,y) cells share high-order zkey prefixes") {
    // points inside one 256x256 tile agree on the top 16 of 32 bits
    val tile = for (dx <- 0 to 255 by 51; dy <- 0 to 255 by 51)
      yield zref(4096L + dx, 8192L + dy, 16) >> 16
    assert(tile.distinct.size == 1, "tile must map to one zkey prefix")
  }
}
