package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Merges-table BPE token counting (VERDICT r12 #8 — the
  * tokenizer-faithful replacement for the "BPE-ish" regexp count).
  *
  * Semantics, pinned to the DuckDB-expressible form so the oracle can
  * recompute it exactly (TextAnalysis.bpeOracleTokensCte holds the SQL):
  * each word splits into Unicode code points, then the RANKED merge
  * rules apply in rank order, each rule as one greedy left-to-right
  * pass replacing adjacent (a, b) token pairs with the merged token
  * a||b (non-overlapping: a freshly merged token re-merges only via a
  * LATER rule, exactly like the oracle's fold). The token count is the
  * sum of per-word token counts. This sequential-rank application is
  * the tokenizer's DEFINED semantics — the merges list is a frozen
  * artifact exactly like a shipped tokenizer vocab, and both engines
  * apply it identically.
  *
  * Why a codegen expression and not the pure array-HOF fold: the HOF
  * form allocates a fresh token array per (word, rule) step — measured
  * unaffordable at the 1000× smoke scale — while this kernel is one
  * tight loop per word reusing a scratch buffer, and it stays inside
  * the enclosing WholeStageCodegen span (same pattern as SimHashBits).
  */
object BpeUtil {
  /** Merges pre-interned as (a, b, a||b) so the hot loop never
    * re-concatenates the merged token per occurrence.
    */
  def compile(merges: Seq[(String, String)]): Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b, a + b) }.toArray

  /** Apply the ranked merges to one word; returns the token list.
    * Exposed for specs (the registered expression only needs counts).
    */
  def tokensOf(word: String, merges: Array[Array[String]]): Array[String] = {
    if (word.isEmpty) return Array.empty
    // scratch buffer reused across rule passes: each pass compacts
    // in place (write index ≤ read index always holds)
    var n = 0
    var buf = new Array[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      buf(n) = new String(Character.toChars(cp))
      n += 1
      i += Character.charCount(cp)
    }
    var r = 0
    while (r < merges.length) {
      val m = merges(r)
      val a = m(0); val b = m(1); val ab = m(2)
      var w = 0
      var j = 0
      while (j < n) {
        val t = buf(j) // saved before writes: w-1, w ≤ j so in-place is safe
        if (w > 0 && t == b && buf(w - 1) == a) buf(w - 1) = ab
        else { buf(w) = t; w += 1 }
        j += 1
      }
      n = w
      r += 1
    }
    java.util.Arrays.copyOfRange(buf, 0, n)
  }

  def countTokens(words: ArrayData, merges: Array[Array[String]]): Long = {
    var total = 0L
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) total += tokensOf(w, merges).length
      }
      i += 1
    }
    total
  }

  /** Token → vocab id under the deterministic vocab layout the encode
    * op pins (and the DuckDB oracle mirrors): printable ASCII base
    * tokens (code points 32..126) map to `cp - 32` (ids 0..94), the
    * rank-i merge PRODUCT maps to `95 + i`, anything else (a non-ASCII
    * single code point — multi-code-point tokens are always merge
    * products by construction) is OOV = -1.
    */
  def tokenId(t: String, productIdx: java.util.HashMap[String, Integer]): Int = {
    val p = productIdx.get(t)
    if (p != null) 95 + p.intValue
    else if (t.nonEmpty && t.codePointCount(0, t.length) == 1) {
      val cp = t.codePointAt(0)
      if (cp >= 32 && cp <= 126) cp - 32 else -1
    } else -1
  }

  /** Count + first-`headK` token ids in document order (words in order,
    * tokens within each word in order), ids space-joined.
    */
  def encodeHead(words: ArrayData, merges: Array[Array[String]],
      productIdx: java.util.HashMap[String, Integer], headK: Int): (Long, String) = {
    var total = 0L
    val sb = new java.lang.StringBuilder
    var emitted = 0
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) {
          val toks = tokensOf(w, merges)
          total += toks.length
          var j = 0
          while (j < toks.length && emitted < headK) {
            if (emitted > 0) sb.append(' ')
            sb.append(tokenId(toks(j), productIdx))
            emitted += 1
            j += 1
          }
        }
      }
      i += 1
    }
    (total, sb.toString)
  }
}

/** bpe_token_count(array<string> words) → bigint. Null words array →
  * null; null/empty elements count zero tokens (the callers filter
  * empty words out anyway, mirroring the oracle's list_filter).
  */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_token_count expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val mergesArr: Array[Array[String]] =
    BpeUtil.compile(merges)

  def count(words: ArrayData): Long = BpeUtil.countTokens(words, mergesArr)

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** bpe_encode_head(array<string> words) → struct<bpe_tokens: bigint,
  * ids_head: string>: the total token count plus the first `headK`
  * vocab ids in document order, space-joined — the id stream a
  * training pipeline feeds a model, bounded per row so the output
  * stays a scalar column (the driver-gate contract forbids arrays).
  * Vocab layout pinned in [[BpeUtil.tokenId]]. Merge PRODUCTS must be
  * distinct strings (two rules producing one string would make ids
  * ambiguous — checked at construction).
  */
case class BpeEncodeHead(child: Expression, merges: Seq[(String, String)],
    headK: Int) extends UnaryExpression {
  require(headK >= 1 && headK <= 4096, s"bpe_encode_head: headK=$headK")
  require(merges.map(m => m._1 + m._2).distinct.size == merges.size,
    "bpe_encode_head: merge products must be distinct strings")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("bpe_tokens", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("ids_head", StringType, nullable = false)))
  override def prettyName: String = "bpe_encode_head"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_head expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val mergesArr: Array[Array[String]] =
    BpeUtil.compile(merges)
  @transient private lazy val productIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + b, i) }
    m
  }

  def encode(words: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val (total, head) = BpeUtil.encodeHead(words, mergesArr, productIdx, headK)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, org.apache.spark.unsafe.types.UTF8String.fromString(head)))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncode", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeHead =
    copy(child = newChild)
}

/** bpe_encode_ids(array<string> words) → array<int>: the COMPLETE
  * vocab-id stream in document order — the payload a training shard
  * stores on disk. Unlike [[BpeEncodeHead]] this is unbounded per row,
  * so it must never surface in a registered op's OUTPUT columns (the
  * driver-gate contract forbids arrays); it exists for the
  * tokenize→pack→write export, where the array lands in parquet and
  * the op's gate-visible columns are read-back aggregates. Vocab
  * layout identical to [[BpeUtil.tokenId]] (encode-head and the id
  * stream can never disagree — same merges compile, same id map).
  */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.map(m => m._1 + m._2).distinct.size == merges.size,
    "bpe_encode_ids: merge products must be distinct strings")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_ids expects array<string>, got ${other.simpleString}")
    }

  @transient private lazy val mergesArr: Array[Array[String]] =
    BpeUtil.compile(merges)
  @transient private lazy val productIdx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) => m.put(a + b, i) }
    m
  }

  def encode(words: ArrayData): ArrayData = {
    // primitive doubling buffer — this kernel runs per document in the
    // 100 TB shard export, so no per-token boxing (the countTokens /
    // encodeHead discipline)
    var buf = new Array[Int](64)
    var m = 0
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i).toString
        if (w.nonEmpty) {
          val toks = BpeUtil.tokensOf(w, mergesArr)
          if (m + toks.length > buf.length) {
            var cap = buf.length * 2
            while (cap < m + toks.length) cap *= 2
            buf = java.util.Arrays.copyOf(buf, cap)
          }
          var j = 0
          while (j < toks.length) {
            buf(m) = BpeUtil.tokenId(toks(j), productIdx)
            m += 1
            j += 1
          }
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOfRange(buf, 0, m))
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.encode($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeTokenCountFn {
  def bpe_token_count(words: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeTokenCount(Shim.expression(words), merges))

  def bpe_encode_head(words: Column, merges: Seq[(String, String)],
      headK: Int): Column =
    Shim.column(BpeEncodeHead(Shim.expression(words), merges, headK))

  def bpe_encode_ids(words: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeEncodeIds(Shim.expression(words), merges))
}
