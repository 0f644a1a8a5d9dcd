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

      // injected OPTIMIZER RULE: defensive double-normalization from
      // composed stages folds to one call. Inputs must be NON-foldable
      // (a range column) — a literal would constant-fold away entirely
      // and the collapse assertion would pass vacuously.
      def nNormalize(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.optimizedPlan.expressions.map(_.collect {
          case e: graft.expr.NfcNormalize => e
        }.size).sum
      val doubled = s.sql(
        """SELECT graft_normalize(graft_normalize(
          |  concat(CAST(id AS STRING), 'Caf\u00e9'))) AS t
          |FROM range(1)""".stripMargin)
      assert(nNormalize(doubled) == 1, "same-form nest must collapse")
      assert(doubled.head.getString(0) == "0Caf\u00e9")
      // ...an outer form absorbs a CANONICAL inner form...
      val mixed = s.sql(
        """SELECT graft_normalize(graft_normalize(
          |  concat(CAST(id AS STRING), 'Caf\u00e9'), 'NFC'), 'NFD') AS t
          |FROM range(1)""".stripMargin)
      assert(nNormalize(mixed) == 1, "canonical inner must collapse")
      assert(mixed.head.getString(0) == "0Cafe\u0301") // NFD: decomposed
      // ...but a compatibility inner form is information-losing and
      // must NOT collapse (NFKC maps \u2460 to '1'; dropping it changes bytes)
      val kept = s.sql(
        """SELECT graft_normalize(graft_normalize(
          |  concat(CAST(id AS STRING), '\u2460'), 'NFKC'), 'NFC') AS t
          |FROM range(1)""".stripMargin)
      assert(nNormalize(kept) == 2, "compat inner must be preserved")
      assert(kept.head.getString(0) == "01")

      // injected PLANNER STRATEGY: a LEFT OUTER join on the
      // graft_asof_on marker must plan into the native AsOfJoinExec
      // purely from the extension config — no programmatic
      // extraStrategies install (what asofJoinNative would do)
      import org.apache.spark.sql.functions.{call_function, col}
      import scala.jdk.CollectionConverters._
      val lRows = Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(1L, 1L, 10L)).asJava
      val rRows = Seq[org.apache.spark.sql.Row](
        org.apache.spark.sql.Row(1L, 5L, 7L)).asJava
      val lsch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("us",
          org.apache.spark.sql.types.LongType)))
      val rsch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__r_key",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__r_time",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("__r_tie",
          org.apache.spark.sql.types.LongType)))
      val lv = s.createDataFrame(lRows, lsch)
      val rv = s.createDataFrame(rRows, rsch)
      val joined = lv.join(rv, call_function("graft_asof_on",
        lv("user_id"), rv("__r_key"), lv("us"), rv("__r_time"),
        lv("event_id"), rv("__r_tie")), "left")
      assert(joined.queryExecution.executedPlan.toString
        .contains("AsOfJoin asofon"),
        "config-injected strategy must plan the marker join")
      val row = joined.select(col("event_id"), col("__r_tie")).head
      assert(row.getLong(0) == 1L && row.getLong(1) == 7L)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
