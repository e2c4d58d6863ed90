package graft

import graft.plans.RuleCombinators._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Limit, LogicalPlan}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** The rule-combinator algebra (reference TransformationCombinators):
  * sequence, alternative, and bounded fixpoint over Rule[LogicalPlan],
  * plus the expression-level lift. The production composition
  * (GraftExtensions.optimizerRules) is covered end-to-end by
  * FunctionsSpec's rewrite tests; this spec pins the combinators'
  * own semantics.
  */
class RuleCombinatorsSpec extends SparkSpec {

  private def base: LogicalPlan = {
    import spark.implicits._
    Seq(1).toDF("x").queryExecution.analyzed
  }

  private def litPlan(n: Int): LogicalPlan = {
    import spark.implicits._
    Seq(1).toDF("x").select(lit(n).as("c")).queryExecution.analyzed
  }

  // decrement every positive int literal by one — fires once per apply
  private val dec = expressions("dec") {
    case Literal(n: Int, IntegerType) if n > 0 => Literal(n - 1, IntegerType)
  }
  private val noop = rule("noop")(identity)

  test("andThenRule sequences both rules") {
    val p = (dec andThenRule dec)(litPlan(5))
    val lits = p.expressions.flatMap(_.collect { case Literal(n: Int, IntegerType) => n })
    assert(lits.contains(3), p)
  }

  test("orElseRule: first rule wins when it changes the plan, else second applies") {
    var bFired = 0
    val b = rule("b") { p => bFired += 1; Limit(Literal(1), p) }
    // dec fires on a positive literal → b never consulted
    val p1 = (dec orElseRule b)(litPlan(2))
    assert(bFired == 0)
    assert(p1.expressions.flatMap(_.collect {
      case Literal(n: Int, IntegerType) => n }).contains(1), p1)
    // dec can't fire on the zero literal → falls through to b
    val p2 = (dec orElseRule b)(litPlan(0))
    assert(bFired == 1)
    assert(p2.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.GlobalLimit], p2)
  }

  test("fixpoint runs to convergence and is a no-op on a stable plan") {
    val p = fixpoint(dec)(litPlan(7))
    val lits = p.expressions.flatMap(_.collect { case Literal(n: Int, IntegerType) => n })
    assert(lits.contains(0) && !lits.exists(_ > 0), p)
    val stable = base
    assert(fixpoint(noop)(stable) fastEquals stable)
  }

  test("fixpoint refuses a non-confluent rewrite with a diagnostic, not a hang") {
    val inc = expressions("inc") {
      case Literal(n: Int, IntegerType) => Literal(n + 1, IntegerType)
    }
    val e = intercept[IllegalStateException](fixpoint(inc, maxIter = 8)(litPlan(0)))
    assert(e.getMessage.contains("not confluent"), e.getMessage)
  }

  test("the injected production composition fires both member rewrites in one pass") {
    // non-literal input (a table column), so constant folding can't
    // collapse the expressions before the injected rule sees them
    val words = Tables.documents(spark, sfTiny)
      .withColumn("w", split(col("text"), " "))
      .withColumn("v", split(col("source"), "-"))
    val df = words.select(org.apache.spark.sql.functions.size(
      array_intersect(col("w"), col("v"))).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("intersect_size"),
      df.queryExecution.optimizedPlan.toString)
    val df2 = words.select(org.apache.spark.sql.functions.size(
      array_sort(col("w"))).as("n"))
    val opt2 = df2.queryExecution.optimizedPlan.toString
    assert(!opt2.contains("array_sort"), opt2)
  }
}
