package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expr.GraftFunctions

/** Config-time registration of graft's native expressions
  * (SURVEY.md §7.4: SparkSessionExtensions is the deployment path —
  * per-session [[graft.expr.GraftFunctions.register]] is the
  * programmatic one; both share the same builder table).
  *
  * Any session on any cluster picks the functions up with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — no code
  * change, SQL-only users included:
  *
  * {{{
  *   SELECT graft_cosine_sim(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * Injected this way the functions live in the session's base registry
  * (not the temp-function namespace), so they survive `newSession()`
  * clones — exactly what a long-lived 1000-executor SQL gateway needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder))
    }
    // optimizer surface (also public API): composed library stages
    // normalize defensively at their boundaries — fold the no-op
    ext.injectOptimizerRule(_ => graft.plans.CollapseRedundantNormalize)
    // planner surface (also public API): the whole-operator tier —
    // LEFT OUTER joins on the graft_asof_on marker plan into the
    // merge-scan AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoin.AsOfJoinStrategy)
  }
}
