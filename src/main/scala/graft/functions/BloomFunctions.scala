package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType

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
}
