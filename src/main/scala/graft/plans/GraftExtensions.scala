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

    private def rewritableElems(e: Expression): Boolean = e.dataType match {
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

  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "vec_dot"),
      (children: Seq[Expression]) => DotProductD(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, "intersect_size"),
      (children: Seq[Expression]) => IntersectSize(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[graft.functions.SimHashBits].getName, "simhash_bits"),
      (children: Seq[Expression]) => graft.functions.SimHashBits(children.head)))
    ext.injectOptimizerRule(_ => RewriteSizeOfIntersect)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
  }
}

/** For spark.sql.extensions config-based installation. */
class GraftExtensionsInjector extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftExtensions(ext)
}
