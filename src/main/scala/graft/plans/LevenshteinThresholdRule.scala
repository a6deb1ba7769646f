package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bound edit-distance predicates.
  *
  * A user-written `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|)
  * dynamic program per row pair, then throws the distance away. Spark's
  * `Levenshtein` expression has a banded three-argument form
  * (`levenshtein(a, b, k)`) that runs in O(k·min(|a|,|b|)) with an early
  * exit, returning -1 whenever the true distance exceeds k — but only
  * callers who know about it use it. This rule rewrites the naive
  * predicate into the banded form wherever the comparison bound is a
  * non-negative integer literal, so SQL-entry users (the fuzzy-join /
  * dedup-verify shapes in rel/Linkage.scala and llm/Dedup.scala, where
  * the engine code already hand-writes the 3-arg form) get the O(k·n)
  * plan for free:
  *
  *  - `lev(a,b) <= k`  →  `lev(a,b,k) >= 0`       (k ≥ 0)
  *  - `lev(a,b) <  k`  →  `lev(a,b,k-1) >= 0`     (k ≥ 1)
  *  - `lev(a,b) =  k`  →  `lev(a,b,k) = k`        (k ≥ 0)
  *
  * (plus the mirrored literal-first comparisons). Soundness: within the
  * band the 3-arg form returns the exact distance, above it -1, and -1
  * fails every rewritten comparison exactly when the original predicate
  * is false; NULL inputs yield NULL on both sides. At 100 TB the win is
  * quadratic-to-linear on the verify leg of every blocked fuzzy join —
  * the text columns there are ~100-char names/documents, and k is
  * typically ≤ 4, a ~25× per-pair cost cut that needs no code change.
  *
  * Idempotent by construction: every rewrite produces a `threshold =
  * Some(_)` Levenshtein, and the patterns only match `threshold = None`.
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`), the `spark.sql.extensions` deployment route.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  /** `lev(a,b,k) >= 0` — true iff the true distance is ≤ k. */
  private def within(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None),
                           Literal(k: Int, IntegerType)) if k >= 0 =>
        within(a, b, k)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType),
                              Levenshtein(a, b, None)) if k >= 0 =>
        within(a, b, k)
      case LessThan(Levenshtein(a, b, None),
                    Literal(k: Int, IntegerType)) if k >= 1 =>
        within(a, b, k - 1)
      case GreaterThan(Literal(k: Int, IntegerType),
                       Levenshtein(a, b, None)) if k >= 1 =>
        within(a, b, k - 1)
      case EqualTo(Levenshtein(a, b, None),
                   Literal(k: Int, IntegerType)) if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
      case EqualTo(Literal(k: Int, IntegerType),
                   Levenshtein(a, b, None)) if k >= 0 =>
        EqualTo(Levenshtein(a, b, Some(Literal(k))), Literal(k))
    }
}
