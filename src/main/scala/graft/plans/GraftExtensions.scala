package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.functions.LevenshteinTrimmed

/** Optimizer rule: rewrite the built-in two-argument `levenshtein` to
  * the prefix/suffix-trimmed kernel ([[graft.functions.LevenshteinTrimmed]]).
  * Value-identical on every input (the trim is distance-preserving and
  * the spec pins parity), but near-duplicate pairs — the dominant case
  * in any dedup re-scoring pass — cost O(edit_window²) instead of
  * O(document²). Users writing plain SQL `levenshtein(a, b)` get the
  * fast kernel transparently; the three-argument threshold form has
  * different semantics (early-exit -1) and is left untouched, as are
  * non-default string collations.
  */
object RewriteLevenshtein extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Levenshtein(l, r, None)
          if l.dataType == StringType && r.dataType == StringType =>
        LevenshteinTrimmed(l, r)
    }
}

/** Session-extensions entry point — production wiring is
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`; tests can
  * instead append [[RewriteLevenshtein]] to
  * `spark.experimental.extraOptimizations` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteLevenshtein)
}
