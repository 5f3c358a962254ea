package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Derived-predicate optimizer rule: a top-level filter conjunct
  * `size(graft_tokens(t)) >= k` (k ≥ 1) implies `length(t) >= 2k−1` —
  * k non-empty tokens need k non-whitespace chars separated by at least
  * k−1 whitespace chars. The derived envelope is PREPENDED to the
  * condition — `And` short-circuits left to right in both interpreted
  * and generated code, so a short document is rejected by one `length()`
  * call before the tokenizer ever runs (appending it instead would be
  * functionally inert: the expensive size(tokens()) conjunct would still
  * evaluate first on every row). Every shingle-blocked dedup query
  * (`size(tokens(text)) >= 3`) hits this shape.
  *
  * Strictly a CONSERVATIVE necessary condition (the exact token-count
  * filter still runs where it was): rows the envelope admits but the
  * original rejects are filtered exactly as before, so plans with and
  * without the rule are result-identical (equivalence-tested). Only
  * whole conjuncts of the filter condition are matched — a token-count
  * predicate under an OR derives nothing.
  *
  * Wired in via [[GraftExtensions]] (`injectOptimizerRule`) or on a live
  * session through [[GraftFunctions.installOptimizations]].
  */
object TokenCountEnvelope extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The implied length envelope of one conjunct, if any. */
  private def envelope(conjunct: Expression): Option[Expression] = conjunct match {
    case GreaterThanOrEqual(Size(t: Tokens, _), Literal(k: Int, IntegerType)) if k >= 1 =>
      Some(GreaterThanOrEqual(Length(t.child), Literal(2 * k - 1)))
    case GreaterThan(Size(t: Tokens, _), Literal(k: Int, IntegerType)) if k >= 0 =>
      Some(GreaterThanOrEqual(Length(t.child), Literal(2 * (k + 1) - 1)))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val existing = conjuncts(cond)
      val derived = existing
        .flatMap(envelope)
        .filterNot(e => existing.exists(_.semanticEquals(e)))
        .distinct
      if (derived.isEmpty) f
      else Filter(And(derived.reduce(And), cond), child)
  }
}
