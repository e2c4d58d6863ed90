package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused token-count kernel for the text_tokencount heuristics.
  *
  * The composed form ran TWO regex engines per document —
  * `regexp_extract_all(text, '\S+')` and
  * `regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')` —
  * each materializing an array of every matched substring just to take
  * its size. Both counts fall out of one byte scan with a four-class
  * state machine:
  *
  *   - ws_tokens: maximal runs of non-whitespace. The whitespace class
  *     is Java regex `\s` = ASCII [ \t\n\x0B\f\r] (the dialect the
  *     Spark side always computed; RE2's \s on the DuckDB side differs
  *     only on \x0B, outside every gate corpus). Multi-byte UTF-8
  *     units contain no ASCII bytes, so byte-level run detection ≡
  *     character-level.
  *   - bpeish_tokens: the alternation counts one per LETTER run, one
  *     per DIGIT run, and one per OTHER code point (single-char class
  *     — each non-alnum non-ws CODE POINT is its own match; counted at
  *     UTF-8 lead bytes, `(b & 0xC0) != 0x80`).
  *
  * Returns struct(ws_tokens, bpeish_tokens); null in, null out.
  * HashCoinsSpec-style equality with the regex forms is pinned in
  * FunctionsSpec incl. multi-byte text.
  */
case class TextTokenCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpeish_tokens", LongType, nullable = false)))
  override def prettyName: String = "text_token_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text_token_counts expects string, got ${other.simpleString}")
    }

  def countsOf(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    var ws = 0L
    var bpeish = 0L
    // classes: 0 = whitespace, 1 = letter, 2 = digit, 3 = other
    var prev = 0
    var inToken = false
    var pos = 0
    while (pos < len) {
      val b = bytes(pos)
      val isLead = (b & 0xC0) != 0x80
      val cls =
        if (b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r') 0
        else if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) 1
        else if (b >= '0' && b <= '9') 2
        else 3
      if (cls == 0) {
        inToken = false
        prev = 0
      } else {
        if (!inToken) { ws += 1; inToken = true }
        if (cls == 3) {
          // continuation bytes extend the current OTHER code point
          if (isLead) bpeish += 1
          prev = 3
        } else {
          if (cls != prev) bpeish += 1
          prev = cls
        }
      }
      pos += 1
    }
    InternalRow(ws, bpeish)
  }

  override protected def nullSafeEval(input: Any): Any =
    countsOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("textTokenCounts", this)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.countsOf($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): TextTokenCounts =
    copy(child = newChild)
}

object TokenCounts {
  def text_token_counts(c: Column): Column =
    Shim.column(TextTokenCounts(Shim.expression(c)))
}
