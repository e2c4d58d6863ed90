package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Raw-digest MD5 coin kernel. The builtin `md5()` expression
  * materializes the full 32-char hex UTF8String per call (digest →
  * hex char[] → String → UTF8String re-encode), and the sampling
  * predicate built on it pays a further `substring` allocation plus an
  * `isin` chain of string compares — all to read FOUR BITS of the
  * digest. This kernel computes the digest into a thread-local
  * MessageDigest and returns the first hex nibble as an int; the
  * sampling predicate becomes integer arithmetic. Semantics are pinned
  * to the hex form so DuckDB oracles keep using
  * `substring(md5(g),1,1)`: nibble = value of the first hex digit =
  * `(digest[0] >>> 4) & 0xF`.
  */
object HashCoinUtil {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Nibble0(s: UTF8String): Int = {
    val md = tl.get()
    md.reset()
    // getBytes avoids the copy when the UTF8String spans its whole
    // backing array (the common case for freshly-built gram strings)
    val d = md.digest(s.getBytes)
    (d(0) >> 4) & 0xF
  }

  private val HEX = "0123456789abcdef".toCharArray

  def md5HexOf(s: UTF8String): String = {
    val md = tl.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xF)
      out(2 * i + 1) = HEX(d(i) & 0xF)
      i += 1
    }
    new String(out)
  }

  /** Min md5 digest over all w-code-point windows; see [[WinnowMinMd5]]. */
  def winnowMinMd5(s: UTF8String, w: Int): UTF8String = {
    val bytes = s.getBytes
    val len = bytes.length
    val md = tl.get()
    val scratch = new Array[Byte](16)
    val best = new Array[Byte](16)
    var have = false
    val ring = new Array[Int](w + 1)
    def hashWindow(from: Int, until: Int): Unit = {
      md.reset()
      md.update(bytes, from, until - from)
      md.digest(scratch, 0, 16)
      if (!have) { System.arraycopy(scratch, 0, best, 0, 16); have = true }
      else {
        var i = 0
        var cmp = 0
        while (i < 16 && cmp == 0) {
          cmp = (scratch(i) & 0xFF) - (best(i) & 0xFF)
          i += 1
        }
        if (cmp < 0) System.arraycopy(scratch, 0, best, 0, 16)
      }
    }
    var pos = 0
    var cp = 0
    while (pos < len) {
      if ((bytes(pos) & 0xC0) != 0x80) {
        if (cp >= w) hashWindow(ring((cp - w) % (w + 1)), pos)
        ring(cp % (w + 1)) = pos
        cp += 1
      }
      pos += 1
    }
    if (cp >= w) hashWindow(ring((cp - w) % (w + 1)), len)
    else hashWindow(0, len) // short/empty text: one whole-text window
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((best(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HEX(best(i) & 0xF).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The k lexicographically smallest md5 hex digests of the non-null
    * elements, ascending — one pass, bounded k-slot insertion (most
    * elements reject on one compare against the current k-th).
    */
  def md5BottomK(xs: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): Array[String] = {
    val keep = new Array[String](k)
    var n = 0
    val total = xs.numElements()
    var i = 0
    while (i < total) {
      if (!xs.isNullAt(i)) {
        val h = md5HexOf(xs.getUTF8String(i))
        if (n < k || h.compareTo(keep(n - 1)) < 0) {
          // insertion position by linear scan from the tail (k is small)
          var p = math.min(n, k - 1)
          while (p > 0 && keep(p - 1).compareTo(h) > 0) {
            keep(p) = keep(p - 1)
            p -= 1
          }
          keep(p) = h
          if (n < k) n += 1
        }
      }
      i += 1
    }
    java.util.Arrays.copyOfRange(keep, 0, n)
  }
}

/** md5_nibble0(string) → int 0..15: the first hex nibble of the MD5
  * digest, without materializing the hex string. `md5_nibble0(g) % 4
  * === 0` ≡ `substring(md5(g),1,1) IN ('0','4','8','c')` — proven
  * hash-identical over the posting stream in HashCoinsSpec and
  * adjudicated against the hex form in ngram_ab_r13.jsonl.
  */
case class Md5Nibble0(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "md5_nibble0"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_nibble0 expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    HashCoinUtil.md5Nibble0(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      s => s"${ev.value} = graft.functions.HashCoinUtil.md5Nibble0($s);")

  override protected def withNewChildInternal(newChild: Expression): Md5Nibble0 =
    copy(child = newChild)
}

/** md5_bottom_k(array<string>, k) → the k lexicographically smallest
  * md5 hex digests of the elements, ascending. For null-free element
  * arrays this is EXACTLY `slice(array_sort(transform(xs, x ->
  * md5(x))), 1, k)` (HashCoinsSpec pins it), computed as one bounded
  * selection pass instead of materializing the full digest array and
  * string-sorting it — the difference between O(n log n) string sort
  * and O(n) compares per document on the minhash sketch path. Null
  * ELEMENTS are skipped (the sort form would sort them last; the
  * graft shingle builders never produce null elements); a null array
  * yields null.
  */
case class Md5BottomK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1 && k <= 1024, s"md5_bottom_k: k=$k out of range [1, 1024]")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "md5_bottom_k"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"md5_bottom_k expects array<string>, got ${other.simpleString}")
    }

  def bottomK(xs: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashCoinUtil.md5BottomK(xs, k).map(UTF8String.fromString))

  override protected def nullSafeEval(input: Any): Any =
    bottomK(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5BottomK", this)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.bottomK($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5BottomK =
    copy(child = newChild)
}

/** winnow_min_md5(text, w) → the lexicographic minimum of the md5 hex
  * digests of all w-CHARACTER windows of the text (the winnowing-family
  * fingerprint), as one streaming pass over the UTF-8 bytes. The
  * composed form (`array_min(transform(sequence(...), i ->
  * md5(substring(text, i, w))))`) allocates one substring AND one
  * 32-char hex string per character position; this kernel hashes each
  * window as a byte range between code-point boundaries (a ring buffer
  * of the last w+1 boundary offsets — `substring` is code-point-based
  * in Spark and DuckDB alike) and keeps one 16-byte running minimum,
  * hex-encoding only the winner. Texts shorter than w characters hash
  * as one whole-text window (the composed form's greatest(·,1) floor);
  * empty text yields md5(''). Null in, null out.
  */
case class WinnowMinMd5(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1 && w <= 255, s"winnow_min_md5: w=$w out of range [1, 255]")

  override def dataType: DataType = StringType
  override def prettyName: String = "winnow_min_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_min_md5 expects string, got ${other.simpleString}")
    }

  def winnowOf(s: UTF8String): UTF8String = HashCoinUtil.winnowMinMd5(s, w)

  override protected def nullSafeEval(input: Any): Any =
    winnowOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowMinMd5", this)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.winnowOf($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowMinMd5 =
    copy(child = newChild)
}

object HashCoins {
  def md5_nibble0(c: Column): Column =
    Shim.column(Md5Nibble0(Shim.expression(c)))

  def md5_bottom_k(c: Column, k: Int): Column =
    Shim.column(Md5BottomK(Shim.expression(c), k))

  def winnow_min_md5(c: Column, w: Int): Column =
    Shim.column(WinnowMinMd5(Shim.expression(c), w))
}
