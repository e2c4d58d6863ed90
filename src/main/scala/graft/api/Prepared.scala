package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.DataType

/** Named parameter marker: behaves exactly like its `default` literal
  * until [[Prepared.compile]] captures it and a later `bind` swaps in a
  * fresh constant. Evaluable as-is (delegating to the default), so an
  * unbound skeleton still explains and runs — the "sample constant" the
  * reference embeds when persisting a compiled query.
  */
case class ParamMarker(name: String, child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = s"param_$name"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): ParamMarker =
    copy(child = newChild)
}

/** Cross-stage persistence of compiled queries — the Spark-first analog of
  * the reference's CrossStagePersistence + Compile pair
  * (/root/reference/src/main/scala/ivm/expressiontree/CrossStagePersistence.scala,
  * Compile.scala): there, a query tree is compiled once and its embedded
  * constants are persisted/rebound across stages so recompilation is never
  * paid twice. Here the "compiled" artifact is the ANALYZED Catalyst plan:
  * [[Prepared.compile]] resolves the query exactly once, then every
  * [[Prepared#bind]] is a single tree transform that replaces the named
  * [[ParamMarker]]s with plain literals and hands the plan back to the
  * session — no re-parse and no name resolution per execution.
  *
  * Binding to a plain [[Literal]] (rather than keeping a variable-like
  * node) is what keeps the 100 TB plan intact: a literal predicate reaches
  * the parquet scan as a pushed filter and participates in constant
  * folding and partition pruning, which no "runtime parameter" expression
  * would (PreparedSpec pins the PushedFilters). Catalyst re-checks the
  * already-resolved plan on execution, but that fixed-point pass over a
  * resolved tree is O(plan) with no unresolved work — the parse/resolve
  * cost the reference's persistence avoids is avoided here too.
  */
final class Prepared private (
    session: org.apache.spark.sql.SparkSession,
    /** the analyzed skeleton — resolved once, shared by every bind */
    val skeleton: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    val params: Set[String]) {

  /** Execute the persisted plan with fresh constants: one transform, no
    * re-analysis of unresolved trees. Every declared parameter must bind
    * (partial binding would silently run on defaults — an error the
    * reference's persistence layer also refuses).
    */
  def bind(values: (String, Any)*): DataFrame = {
    val m = values.toMap
    val unknown = m.keySet -- params
    require(unknown.isEmpty, s"unknown parameter(s): ${unknown.mkString(", ")}")
    val missing = params -- m.keySet
    require(missing.isEmpty, s"unbound parameter(s): ${missing.mkString(", ")}")
    val bound = skeleton.transformAllExpressions {
      case p: ParamMarker => Literal.create(m(p.name), p.dataType)
    }
    Shim.ofRows(session, bound)
  }

  /** The skeleton run on its embedded defaults — explain/debug surface. */
  def onDefaults: DataFrame = Shim.ofRows(session, skeleton)
}

object Prepared {

  /** A named parameter usable anywhere a Column is; `default` fixes the
    * type and makes the unbound skeleton runnable.
    */
  def param(name: String, default: Any): Column =
    Shim.column(ParamMarker(name, Literal(default)))

  /** Analyze the query once and persist the resolved plan + parameter
    * inventory. Duplicate markers with one name are allowed (one bind
    * fills all of them); the same name at two different types is not.
    */
  def compile(df: DataFrame): Prepared = {
    val analyzed = df.queryExecution.analyzed
    val markers = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    analyzed.transformAllExpressions { case p: ParamMarker =>
      markers.get(p.name).foreach { dt =>
        require(dt == p.dataType,
          s"parameter '${p.name}' used at two types: $dt vs ${p.dataType}")
      }
      markers.update(p.name, p.dataType)
      p
    }
    new Prepared(df.sparkSession, analyzed, markers.keySet.toSet)
  }
}
