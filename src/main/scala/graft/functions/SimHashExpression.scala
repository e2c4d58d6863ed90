package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass SimHash bit-vote kernel. */
object SimHashUtil {
  /** For each of the 32 hex positions of every digest, vote +1 if the hex
    * digit's high bit is set ('8'..'9','a'..'f'), else -1; emit '1' where
    * the tally is positive. Exactly the semantics of the 32-subexpression
    * SQL formulation (strpos('89abcdef', substr(m, b, 1)) > 0) it
    * replaces, in one pass over the digests.
    */
  def compute(md5s: ArrayData): UTF8String = {
    val counts = new Array[Int](32)
    val n = md5s.numElements()
    var i = 0
    while (i < n) {
      val s = md5s.getUTF8String(i)
      if (s != null && s.numBytes() >= 32) {
        val bytes = s.getBytes
        var b = 0
        while (b < 32) {
          val c = bytes(b)
          val hi = (c >= '8' && c <= '9') || (c >= 'a' && c <= 'f')
          counts(b) += (if (hi) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var b = 0
    while (b < 32) {
      out(b) = if (counts(b) > 0) '1' else '0'
      b += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** simhash_bits(array<string of md5 hex>) → 32-char '0'/'1' signature. */
case class SimHashBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash_bits expects array<string>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      a => s"${ev.value} = graft.functions.SimHashUtil.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object simhash {
  def simhash_bits(md5s: Column): Column =
    Shim.column(SimHashBits(Shim.expression(md5s)))
}
