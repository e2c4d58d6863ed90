package graft.plans

import graft.functions.{DotProductD, IntersectSize}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Size}
import org.apache.spark.sql.catalyst.expressions.ArrayIntersect
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** SparkSessionExtensions wiring — tier (c) of the extension ladder:
  * custom functions + a custom optimizer rule, the Spark-native analog of
  * the reference's hand-rolled transform registry
  * (ivm/optimization/Optimization.scala's transform list).
  *
  * Install via `.withExtensions(GraftExtensions(_))` or
  * `spark.sql.extensions=graft.plans.GraftExtensionsInjector`.
  */
object GraftExtensions {

  /** Rewrite `size(array_intersect(a, b))` to the non-materializing
    * IntersectSize — the same fuse-the-consumer rewrite the reference
    * performs in FoldPhysicalOperators.scala (e.g. Size∘View folding,
    * sizeToEmpty): the intersection array is never built when only its
    * cardinality is consumed. Fires only for non-null elements of
    * integral/string-like types: float/double are excluded because the
    * java.util.HashSet path would distinguish -0.0 from 0.0 while
    * ArrayIntersect normalizes them equal — and this rule is injected
    * session-wide, so it must never change ANY query's results.
    */
  object RewriteSizeOfIntersect extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        // legacySizeOfNull=false only: the legacy flag makes size(null) = -1,
        // IntersectSize returns null there, so don't rewrite under legacy.
        case Size(ArrayIntersect(a, b), false)
          if rewritableElems(a) && rewritableElems(b) =>
          IntersectSize(a, b)
      }

    private[plans] def rewritableElems(e: Expression): Boolean = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(et, containsNull) =>
        import org.apache.spark.sql.types._
        !containsNull && (et match {
          case StringType | IntegerType | LongType | ShortType | ByteType |
               BooleanType | DateType | TimestampType => true
          case _ => false // float/double (-0.0), interval, nested, decimal
        })
      case _ => false
    }
  }

  /** Eliminate/commute array_sort when its order cannot be observed — the
    * composition partner of [[RewriteSizeOfIntersect]], showing the
    * extension point carries a RULE SET, not one rewrite (the reference's
    * composable TransformationCombinators,
    * ivm/optimization/TransformationCombinators.scala):
    *
    *  - `size(array_sort(x))`           → `size(x)`           (sort is a no-op under cardinality)
    *  - `array_contains(array_sort(x))` → `array_contains(x)` (membership is order-blind)
    *  - `array_sort(array_sort(x))`     → `array_sort(x)`     (idempotent)
    *  - `array_distinct(array_sort(x))` → `array_sort(array_distinct(x))`
    *    (both produce the sorted distinct elements; distinct-first sorts
    *     the smaller array — the cheaper evaluation order)
    *
    * Only default-comparator sorts are touched (a custom lambda can
    * observe anything), and the commute fires only for the same
    * non-float element types as RewriteSizeOfIntersect (float/double
    * -0.0/NaN normalization differs between sort- and hash-based paths).
    */
  object EliminateRedundantArraySort extends Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ArrayDistinct, ArraySort, GreaterThan, If, LambdaFunction, LessThan, Literal, NamedExpression}
    import org.apache.spark.sql.types.IntegerType

    /** The ANALYZED form of ArraySort.defaultComparator:
      * (l, r) -> if (l < r) -1 else if (l > r) 1 else 0 over the bound
      * lambda variables. Matched structurally — the unresolved
      * defaultComparator object can't semanticEquals a resolved lambda.
      */
    private def isDefaultComparator(f: Expression): Boolean = f match {
      case LambdaFunction(
          If(LessThan(a1, b1), Literal(-1, IntegerType),
            If(GreaterThan(a2, b2), Literal(1, IntegerType), Literal(0, IntegerType))),
          Seq(l: NamedExpression, r: NamedExpression), _) =>
        a1.semanticEquals(l) && b1.semanticEquals(r) &&
          a2.semanticEquals(l) && b2.semanticEquals(r)
      case _ => false
    }

    private def isDefault(s: ArraySort): Boolean = isDefaultComparator(s.function)

    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case Size(s: ArraySort, legacy) if isDefault(s) =>
          Size(s.argument, legacy)
        case ArrayContains(s: ArraySort, v) if isDefault(s) =>
          ArrayContains(s.argument, v)
        case outer @ ArraySort(inner: ArraySort, _, _)
          if isDefault(outer) && isDefault(inner) =>
          inner
        // reuse the matched sort's RESOLVED lambda — the optimizer must
        // never introduce unresolved expressions
        case ArrayDistinct(s: ArraySort)
          if isDefault(s) && RewriteSizeOfIntersect.rewritableElems(s) =>
          s.copy(argument = ArrayDistinct(s.argument))
      }
  }

  /** The rule SET as one combinator expression (reference
    * TransformationCombinators): sequence the two rewrites and run them
    * to fixpoint, since one can expose the other (array_sort elimination
    * can surface a size∘array_intersect; the intersect fuse can strip a
    * Size consumer an array_sort rewrite keyed on). Injected rules
    * already sit in a fixed-point batch — the explicit fixpoint makes the
    * composition self-contained rather than batch-dependent.
    */
  private[plans] val optimizerRules: Rule[LogicalPlan] = {
    import RuleCombinators._
    fixpoint(RewriteSizeOfIntersect.andThenRule(EliminateRedundantArraySort))
  }

  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_distsq"),
      new ExpressionInfo(classOf[graft.functions.DistSqD].getName, "vec_distsq"),
      (children: Seq[Expression]) => graft.functions.DistSqD(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_argmin"),
      new ExpressionInfo(classOf[graft.functions.ArgminCost].getName, "vec_argmin"),
      (children: Seq[Expression]) => {
        // 4th arg selects the cost and must be a compile-time boolean
        // (true = squared L2, false = negated cosine over norms)
        require(children.length == 4 && children(3).foldable,
          "vec_argmin(emb, nrm, cbook, l2) needs a literal boolean 4th arg")
        graft.functions.ArgminCost(children(0), children(1), children(2),
          children(3).eval(null) == true)
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_signs"),
      new ExpressionInfo(classOf[graft.functions.SignSketch].getName, "vec_signs"),
      (children: Seq[Expression]) => graft.functions.SignSketch(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "intersect_size"),
      (children: Seq[Expression]) => IntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[graft.functions.SimHashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => graft.functions.SimHashBits(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("collect_set_bounded"),
      new ExpressionInfo(classOf[graft.functions.CollectSetBounded].getName,
        "collect_set_bounded"),
      (children: Seq[Expression]) => {
        // cap must be a compile-time positive int — it sizes agg buffers
        require(children.length == 2 && children(1).foldable,
          "collect_set_bounded(col, cap) needs a literal int cap")
        children(1).eval(null) match {
          case n: Number =>
            graft.functions.CollectSetBounded(children(0), n.intValue())
              .toAggregateExpression()
          case bad => // thrown during analysis — descriptive, not a ClassCast/NPE
            throw new IllegalArgumentException(
              "collect_set_bounded(col, cap) needs a literal int cap; got " +
                (if (bad == null) "NULL" else s"'$bad'"))
        }
      }))
    ext.injectOptimizerRule(_ => optimizerRules)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

/** For spark.sql.extensions config-based installation. */
class GraftExtensionsInjector extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions(ext)
}
