package graft.plans

import java.text.Normalizer.Form

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expr.NfcNormalize

/** Optimizer rule (deployed via the PUBLIC
  * `SparkSessionExtensions.injectOptimizerRule` — same no-internals
  * stance as the function injection, SURVEY.md §4): collapse redundant
  * nested Unicode normalizations.
  *
  * Composed pipelines normalize defensively at stage boundaries (every
  * stage of a q119-style chain canonicalizes its input), so
  * `graft_normalize(graft_normalize(x))` shows up whenever two library
  * stages compose — at 100 TB that's a second full String
  * materialization per non-ASCII row for zero semantic effect.
  *
  * Soundness (byte-exact, not approximate):
  *  - F(F(x)) = F(x): every Unicode normalization form is idempotent
  *    (UAX #15).
  *  - F(G(x)) = F(x) when G is canonical (NFC/NFD): G(x) is canonically
  *    equivalent to x, and any form maps canonically-equivalent inputs
  *    to identical output.
  *  - A compatibility inner form (NFKC/NFKD) is NOT collapsed: K-forms
  *    lose information (e.g. ① → 1), so F(NFKC(x)) ≠ F(x) in general.
  */
object CollapseRedundantNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_, g), f)
          if f == g || g == Form.NFC || g == Form.NFD =>
        if (f == g) inner else NfcNormalize(inner.child, f)
    }
}
