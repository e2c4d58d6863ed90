package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Composable optimizer-rule combinators — the reference's
  * TransformationCombinators
  * (ivm/optimization/TransformationCombinators.scala) re-expressed over
  * Catalyst's `Rule[LogicalPlan]`. The reference builds expression
  * transforms as Kleisli arrows composed with `&` (sequence), `|`
  * (alternative) and `rep`/`kleeneStar` (apply-to-fixpoint); a Catalyst
  * rule is already a total `LogicalPlan => LogicalPlan`, so the same
  * algebra needs no monad:
  *
  *   - `r andThenRule s`  — sequence (the reference's `&`)
  *   - `r orElseRule s`   — try r; if it left the plan unchanged, try s
  *                          (the reference's `|` under the Option monad)
  *   - `fixpoint(r)`      — bounded kleene star (`rep`)
  *   - `expressions(pf)`  — lift an expression-level PartialFunction into
  *                          a whole-plan rule: the granularity the
  *                          reference's transformers operate at
  *
  * A user extending the optimizer writes one combinator expression and
  * injects the result once — GraftExtensions wires its own two rewrites
  * through exactly this path (see GraftExtensions.optimizerRules).
  */
object RuleCombinators {

  /** Named rule from a plain function — the `Transformer(...)` factory. */
  def rule(nm: String)(f: LogicalPlan => LogicalPlan): Rule[LogicalPlan] =
    new Rule[LogicalPlan] {
      override val ruleName: String = nm
      override def apply(plan: LogicalPlan): LogicalPlan = f(plan)
    }

  /** Lift an expression-level partial rewrite into a plan rule. */
  def expressions(nm: String)(
      pf: PartialFunction[Expression, Expression]): Rule[LogicalPlan] =
    rule(nm)(_.transformAllExpressions(pf))

  implicit class RichRule(private val r: Rule[LogicalPlan]) extends AnyVal {

    /** Sequence (reference `&`): apply `r`, then `s` on the result. */
    def andThenRule(s: Rule[LogicalPlan]): Rule[LogicalPlan] =
      rule(s"${r.ruleName} >> ${s.ruleName}")(p => s(r(p)))

    /** Alternative (reference `|`): `r`'s result when it changed the
      * plan, else `s`. "Changed" is structural (`fastEquals`), the same
      * success notion the reference encodes with Option.
      */
    def orElseRule(s: Rule[LogicalPlan]): Rule[LogicalPlan] =
      rule(s"${r.ruleName} | ${s.ruleName}") { p =>
        val p2 = r(p)
        if (p2 fastEquals p) s(p) else p2
      }
  }

  /** Bounded kleene star (reference `rep`/`kleeneStar`): re-apply until
    * the plan stops changing. Bounded, because a non-confluent rewrite
    * pair must terminate with a diagnostic rather than hang the
    * optimizer.
    */
  def fixpoint(r: Rule[LogicalPlan], maxIter: Int = 100): Rule[LogicalPlan] =
    rule(s"fix(${r.ruleName})") { p0 =>
      var p = p0
      var i = 0
      var done = false
      while (!done) {
        val n = r(p)
        done = n fastEquals p
        p = n
        i += 1
        if (!done && i >= maxIter)
          throw new IllegalStateException(
            s"fix(${r.ruleName}) did not converge in $maxIter iterations — " +
              "the composed rewrites are not confluent")
      }
      p
    }
}
