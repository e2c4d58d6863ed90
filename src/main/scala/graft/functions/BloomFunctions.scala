package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Column-API access to Spark's own Bloom-filter sketch expressions —
  * the machinery behind Catalyst's runtime row-level filtering
  * (InjectRuntimeFilter), exposed here so a pipeline can use the same
  * semi-join reduction EXPLICITLY: build a bloom over the big side's
  * join keys once, prefilter the probe side to "maybe present", and pay
  * the exact join only for the maybe set.
  *
  * The sketch is deterministic: the bit array is an order-independent OR
  * of fixed-seed hash positions, so partial-aggregation order never
  * changes the bytes — safe under the oracle gate (the bytes themselves
  * are never emitted by any operator; only exact post-verified rows are).
  */
object bloom {

  /** Aggregate: a bloom filter (as bytes) over a LONG column — hash
    * non-long keys first (xxhash64). `expectedItems` sizes the bit
    * array (~1.2 bytes/item at the default 3% fpp); at 100 TB size it
    * from a prior approx_count_distinct or a per-shard budget.
    */
  def bloom_filter_agg(keys: Column, expectedItems: Long): Column =
    Shim.column(new BloomFilterAggregate(Shim.expression(keys), expectedItems)
      .toAggregateExpression())

  /** Predicate: may `key` be in the serialized filter? False negatives
    * are impossible — `!might_contain` proves absence; `might_contain`
    * admits ~fpp false positives, so a positive needs exact verification.
    */
  def might_contain(bloomBytes: Array[Byte], key: Column): Column =
    Shim.column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType), Shim.expression(key)))

  /** Per-bucket probe for a FAMILY of bloom filters in one codegen'd
    * pass: `might_contain_bucketed(filters, bkt, key)` answers "may
    * `key` be in bucket `bkt`'s filter?" — the single-scan form of a
    * bucketed membership sketch (one branch per bucket would scan the
    * probe side `buckets` times). A bucket with no filter (empty corpus
    * bucket) answers false: nothing was inserted, so absence is proven.
    *
    * RESIDENCY (honest, r13): the whole filter map rides the plan like
    * any sketch literal — the driver, the task binary, and EVERY task
    * that deserializes it hold ALL buckets' filters. This is the
    * small-map tool (total filter bytes must fit in a plan closure
    * comfortably, say ≤ a few hundred MB). For the bucketed scale form
    * where each task must carry only ITS bucket's bytes, use
    * [[might_contain_keyed]] under a bucket-keyed shuffle join (the
    * shape `Dedup.bloomNewDocsBucketed` registers).
    */
  def might_contain_bucketed(filters: Map[Long, Array[Byte]], bkt: Column,
      key: Column): Column =
    Shim.column(BucketedBloomMightContain(filters,
      Shim.expression(bkt), Shim.expression(key)))

  /** Join-shipped per-bucket probe: `might_contain_keyed(bkt, bf, key)`
    * answers "may `key` be in the filter whose serialized bytes ride
    * the row's `bf` column?" — the scale form of the bucketed
    * membership sketch. The filters live in a `(bkt, bf)` DataFrame
    * and reach the probe rows through a bucket-keyed shuffle join, so
    * each task receives exactly its buckets' filter bytes, and the
    * expression deserializes each bucket ONCE PER TASK (a per-task
    * cache keyed by `bkt` — never per row, which would also pay a
    * per-row copy of the bytes out of the UnsafeRow). A null `bf`
    * (bucket absent from the corpus ⇒ outer-join miss) answers false:
    * nothing was inserted, so absence is proven. Null `bkt` or `key`
    * answers null.
    */
  def might_contain_keyed(bkt: Column, bf: Column, key: Column): Column =
    Shim.column(BloomMightContainKeyed(
      Shim.expression(bkt), Shim.expression(bf), Shim.expression(key)))

  /** Merge two serialized bloom filters by bitwise OR (r15 — the bloom
    * family's absorb-back primitive): `or(build(A), build(B))` is
    * BYTE-IDENTICAL to `build(A ∪ B)` because the bit array is an
    * order-independent OR of fixed-seed hash positions — so an upsert
    * that ORs a shard's filters into persisted state provably equals a
    * full rebuild (DedupSpec pins the byte equality). Both inputs MUST
    * share the filter geometry (same expectedItems at build time);
    * Spark's sketch throws IncompatibleMergeException otherwise —
    * fail-fast, never a silently widened fpp.
    */
  def bloom_or(a: Column, b: Column): Column =
    Shim.column(BloomOr(Shim.expression(a), Shim.expression(b)))
}

/** `might_contain_bucketed`'s expression: (bkt long, key long) → boolean
  * against a driver-built map of serialized per-bucket bloom filters.
  * Null in either input yields null (mirroring BloomFilterMightContain);
  * a bucket absent from the map yields false (no insertions ⇒ proven
  * absent). Codegen'd via a plan reference to this instance, so the
  * probe stays inside the enclosing WholeStageCodegen span.
  */
case class BucketedBloomMightContain(filters: Map[Long, Array[Byte]],
    left: Expression, right: Expression) extends BinaryExpression
    // analysis-time rejection of non-long inputs: without this a wrong
    // type ClassCastExceptions in interpreted eval but silently widens in
    // the generated code path — inconsistent behavior for a public
    // Column API (the trait lives in graftshim: AbstractDataType is
    // private[sql])
    with org.apache.spark.sql.graftshim.ExpectsLongLongInputs {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "might_contain_bucketed"

  @transient private lazy val deser
      : Map[Long, org.apache.spark.util.sketch.BloomFilter] =
    filters.collect { case (b, bytes) if bytes != null =>
      b -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    }

  def probe(bkt: Long, key: Long): Boolean =
    deser.get(bkt).exists(_.mightContainLong(key))

  override protected def nullSafeEval(bkt: Any, key: Any): Any =
    probe(bkt.asInstanceOf[Long], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketedBloom", this)
    nullSafeCodeGen(ctx, ev, (b, k) => s"${ev.value} = $ref.probe($b, $k);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BucketedBloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** `bloom_or`'s expression: (binary, binary) → binary. Deserializes
  * both filters, merges in place (bitwise OR of identical-geometry bit
  * arrays), reserializes. Null-safe: null either side → null (callers
  * coalesce with the non-null side — an absent shard bucket absorbs to
  * the base's filter unchanged).
  */
case class BloomOr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_or"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_or expects (binary, binary), got $other")
    }
  }

  def mergeBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    import org.apache.spark.util.sketch.BloomFilter
    val x = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val y = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    x.mergeInPlace(y)
    val out = new java.io.ByteArrayOutputStream()
    x.writeTo(out)
    out.toByteArray
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    mergeBytes(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomOr", this)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.mergeBytes($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomOr =
    copy(left = newLeft, right = newRight)
}

object BloomMightContainKeyed {
  /** Filters deserialized across all tasks in this JVM — a spec hook:
    * under the bucket-keyed shuffle join, each non-empty bucket is
    * deserialized in exactly the one task that holds its partition, so
    * a local-mode run pins `deserialized.sum == non-empty buckets`
    * (vs. buckets × tasks if every task carried the whole family).
    */
  val deserialized = new java.util.concurrent.atomic.LongAdder
}

/** `might_contain_keyed`'s expression: (bkt long, bf binary, key long)
  * → boolean. The `bf` child is evaluated LAZILY — only on a per-task
  * cache miss for the row's `bkt` — because reading a binary column
  * out of an UnsafeRow copies the bytes, and the filter bytes are the
  * big thing this operator exists to not move per row. Null semantics:
  * null `bkt` or `key` → null (mirroring BloomFilterMightContain);
  * null/absent `bf` for a non-null `bkt` → false (outer-join miss ⇒
  * empty corpus bucket ⇒ proven absent).
  */
case class BloomMightContainKeyed(bktE: Expression, bfE: Expression,
    keyE: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = bktE
  override def second: Expression = bfE
  override def third: Expression = keyE
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "might_contain_keyed"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.LongType
    (bktE.dataType, bfE.dataType, keyE.dataType) match {
      case (LongType, BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"might_contain_keyed expects (long, binary, long), got $other")
    }
  }

  // per-task-instance cache (the expression is deserialized with each
  // task's binary, so this map holds exactly the buckets THAT task's
  // partition contains; null value = admitted empty bucket)
  @transient private lazy val cache =
    new java.util.HashMap[Long, org.apache.spark.util.sketch.BloomFilter]

  def hasBucket(bkt: Long): Boolean = cache.containsKey(bkt)

  def admit(bkt: Long, bytes: Array[Byte]): Unit = {
    val bf = if (bytes == null) null
    else {
      BloomMightContainKeyed.deserialized.increment()
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    }
    cache.put(bkt, bf)
  }

  def probe(bkt: Long, key: Long): Boolean = {
    val bf = cache.get(bkt)
    bf != null && bf.mightContainLong(key)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val b = bktE.eval(input)
    if (b == null) return null
    val k = keyE.eval(input)
    if (k == null) return null
    val bkt = b.asInstanceOf[Long]
    if (!hasBucket(bkt))
      admit(bkt, bfE.eval(input).asInstanceOf[Array[Byte]])
    probe(bkt, k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("keyedBloom", this)
    val bktG = bktE.genCode(ctx)
    val keyG = keyE.genCode(ctx)
    val bfG = bfE.genCode(ctx)
    ev.copy(code = code"""
      ${bktG.code}
      ${keyG.code}
      boolean ${ev.isNull} = true;
      boolean ${ev.value} = false;
      if (!${bktG.isNull} && !${keyG.isNull}) {
        ${ev.isNull} = false;
        if (!$ref.hasBucket(${bktG.value})) {
          ${bfG.code}
          $ref.admit(${bktG.value}, ${bfG.isNull} ? null : ${bfG.value});
        }
        ${ev.value} = $ref.probe(${bktG.value}, ${keyG.value});
      }""")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BloomMightContainKeyed =
    copy(bktE = newFirst, bfE = newSecond, keyE = newThird)
}
