package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the hot paths of the similarity and
  * dedup operators — tier (b) of the extension ladder (custom Expression
  * with doGenCode beats a UDF, SURVEY §2/§4; reference analog: SQuOpt
  * compiles reified query trees to Scala, Compile.scala — here Spark's
  * whole-stage codegen plays that role and these expressions stay inside
  * it).
  *
  * DotProductD computes the SAME left-to-right sequential double fold as
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` — so
  * swapping it in changes no results, bit for bit — but without
  * materializing the zipped intermediate array per row.
  */
/** Shared float/double element handling for the vector fold expressions:
  * each side may be array<float> or array<double>; floats are cast to
  * double per element BEFORE the arithmetic, exactly like the HOF form.
  */
trait VectorFold { self: BinaryExpression =>

  protected def foldName: String

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$foldName expects array<float|double> on both sides, got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  protected def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected def elem(x: ArrayData, fl: Boolean, i: Int): Double =
    if (fl) x.getFloat(i).toDouble else x.getDouble(i)

  protected def elemCode(arr: String, fl: Boolean, i: String): String =
    if (fl) s"((double) $arr.getFloat($i))" else s"$arr.getDouble($i)"
}

case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override protected def foldName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += elem(x, lf, i) * elem(y, rf, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${elemCode(a, isFloat(left), i)} * ${elemCode(b, isFloat(right), i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance — the same left-to-right sequential double fold as
  * `aggregate(zip_with(a, b, (x,c) -> (double(x)-double(c))*(double(x)-double(c))), 0d, +)`,
  * bit-identical results, no intermediate array. The hot inner loop of
  * the k-means / PQ assignment passes.
  */
case class DistSqD(left: Expression, right: Expression)
    extends BinaryExpression with VectorFold {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_distsq"
  override protected def foldName: String = "vec_distsq"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = elem(x, lf, i) - elem(y, rf, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${elemCode(a, isFloat(left), i)} - ${elemCode(b, isFloat(right), i)};
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DistSqD =
    copy(left = newLeft, right = newRight)
}

/** Count of the distinct-element intersection of two string arrays —
  * `size(array_intersect(a, b))` without materializing the intersection
  * array. Matches ArrayIntersect + Size semantics for non-null string
  * elements (our shingle arrays are distinct + non-null by construction).
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val seen = new java.util.HashSet[Any]()
    var i = 0
    while (i < x.numElements()) { seen.add(x.get(i, et)); i += 1 }
    var cnt = 0
    val matched = new java.util.HashSet[Any]()
    var j = 0
    while (j < y.numElements()) {
      val v = y.get(j, et)
      if (seen.contains(v) && matched.add(v)) cnt += 1
      j += 1
    }
    cnt
  }

  // interpreted path only: this expression sits behind joins/aggregates in
  // the dedup verify stage where per-row cost is dominated by the hash set
  // anyway; codegen would inline the same loop.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = left.dataType.asInstanceOf[ArrayType].elementType
    val etRef = ctx.addReferenceObj("etype", et, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val seen = ctx.freshName("seen")
      val matched = ctx.freshName("matched")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val cnt = ctx.freshName("cnt")
      s"""
         |java.util.HashSet<Object> $seen = new java.util.HashSet<Object>();
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  $seen.add($a.get($i, $etRef));
         |}
         |java.util.HashSet<Object> $matched = new java.util.HashSet<Object>();
         |int $cnt = 0;
         |for (int $j = 0; $j < $b.numElements(); $j++) {
         |  Object $v = $b.get($j, $etRef);
         |  if ($seen.contains($v) && $matched.add($v)) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points usable on any session (no registration
  * needed); `GraftExtensions` additionally registers them for SQL use.
  */
object vec {
  def vec_dot(a: Column, b: Column): Column =
    Shim.column(DotProductD(Shim.expression(a), Shim.expression(b)))

  def vec_distsq(a: Column, b: Column): Column =
    Shim.column(DistSqD(Shim.expression(a), Shim.expression(b)))

  def intersect_size(a: Column, b: Column): Column =
    Shim.column(IntersectSize(Shim.expression(a), Shim.expression(b)))
}
