package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: function injection via SparkSessionExtensions —
  * the cluster deployment path (`--conf spark.sql.extensions=
  * graft.GraftExtensions`). The conf-string form only applies when the
  * SparkContext is CREATED, so in this shared-context JVM the suite
  * routes the same extensions object through `builder.withExtensions`
  * (identical injection machinery) into a REAL session, drives the
  * functions from SQL only, then proves they survive `newSession()`
  * clones (base registry, not temp functions — per-session
  * `GraftFunctions.register` does not).
  */
class ExtensionsSpec extends AnyFunSuite {

  test("SparkSessionExtensions injection registers graft_* for SQL") {
    val base = Graft.session("local[4]")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s ne base, "builder must create a fresh session for the extension conf")
      val cos = s.sql(
        """SELECT graft_cosine_sim(
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
          |  array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c""".stripMargin)
        .head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)

      val shingles = s.sql("SELECT graft_word_shingles(array('a','b','c'), 2) AS sh")
        .head.getSeq[String](0)
      assert(shingles == Seq("a b", "b c"))

      // injected functions live in the base registry → clones inherit them
      val clone = s.newSession()
      val bits = clone.sql(
        """SELECT graft_hyperplane_bits(
          |  array(CAST(1.0 AS FLOAT), CAST(-1.0 AS FLOAT)), 8) AS b""".stripMargin)
        .head.getLong(0)
      assert(bits >= 0L && bits < 256L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
