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
    * The filter map rides the plan like any sketch literal (the same
    * shipping shape as Catalyst's InjectRuntimeFilter bloom), is
    * deserialized lazily ONCE per executor JVM, and each row pays one
    * map lookup + one bloom probe.
    */
  def might_contain_bucketed(filters: Map[Long, Array[Byte]], bkt: Column,
      key: Column): Column =
    Shim.column(BucketedBloomMightContain(filters,
      Shim.expression(bkt), Shim.expression(key)))
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
