package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, MapType}

/** `collect_set` with a hard cap on the aggregation buffer: groups whose
  * distinct-value count exceeds `cap` evaluate to NULL instead of a set.
  *
  * This is the memory-bounded form of the posting-list pattern every
  * banded dedup operator here uses (group doc ids per shingle/band, drop
  * groups larger than the df cap, expand pairs in-group). The plain
  * formulation — `collect_set(id)` then `filter(size(ids) <= cap)` —
  * gives the same ANSWER but materializes the full posting list in the
  * ObjectHashAggregate buffer first: one ultra-common shingle in a 100 TB
  * corpus ("the quick brown fox…" boilerplate shared by 100 M pages)
  * holds 100 M ids in a single group buffer before the filter discards
  * them. This operator stops accumulating at cap+1 elements, so the
  * per-group buffer is O(cap) regardless of corpus pathology.
  *
  * The overflow flag is EXACT, not heuristic: a buffer only ever stops
  * growing once it holds cap+1 distinct elements, so (a) if a group's
  * true distinct count is ≤ cap, no partial buffer ever truncates and
  * the result is exactly `collect_set`; (b) if it exceeds cap, every
  * merge chain ends with ≥ cap+1 elements and the group evaluates to
  * NULL deterministically. Results never depend on partial-aggregation
  * order — the property the DuckDB oracle gate requires.
  *
  * Reference analog: the df-capped candidate generation in the dedup
  * family (see Dedup.scala) — this moves the cap from a post-aggregation
  * filter into the aggregation buffer itself, which is what survives a
  * hostile key distribution at scale.
  */
case class CollectSetBounded(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[CompactBoundedSet] with UnaryLike[Expression] {

  require(cap >= 1, "collect_set_bounded cap must be >= 1")

  // CompactBoundedSet, not mutable.HashSet[Any]: one buffer lives per
  // distinct key in the ObjectHashAggregate map, and the map side of a
  // high-cardinality posting aggregation holds nearly every key in
  // every task — at the boxed-HashSet ~90 B/element the 300× smoke OOMed
  // the ngram-shingle aggregation (200k keys × cap-64 buffers ≈ 1.5 GB
  // per task). Unboxed long storage is ~8 B/element, which is what makes
  // the sortBased.fallbackThreshold a memory BOUND rather than a bet.
  override def createAggregationBuffer(): CompactBoundedSet =
    new CompactBoundedSet

  // identical to CollectSet: buffer elements are copied catalyst values
  // of the child type (UnsafeRow-backed values are materialized so the
  // buffer owns its memory)
  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  /** Stop inserting once the buffer holds cap+1 elements — the overflow
    * sentinel state. The +1 is what makes the flag exact under merges.
    */
  override def update(
      buffer: CompactBoundedSet,
      input: InternalRow): CompactBoundedSet =
    if (buffer.size > cap) buffer else super.update(buffer, input)

  override def merge(
      buffer: CompactBoundedSet,
      other: CompactBoundedSet): CompactBoundedSet = {
    val it = other.iterator
    while (buffer.size <= cap && it.hasNext) buffer += it.next()
    buffer
  }

  override def eval(buffer: CompactBoundedSet): Any =
    if (buffer.size > cap) null else new GenericArrayData(buffer.toSeq)

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    // same restriction as collect_set: map elements have no well-defined
    // set equality (existsRecursively is private[sql]; hand-rolled walk)
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case org.apache.spark.sql.types.ArrayType(et, _) => hasMap(et)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    if (hasMap(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        "collect_set_bounded does not support map-typed elements")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def prettyName: String = "collect_set_bounded"

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetBounded =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetBounded =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectSetBounded =
    copy(child = newChild)
}

object CollectSetBounded {
  /** Column-API form: `collect_set_bounded(col, cap)` — NULL when the
    * group's distinct count exceeds cap, exactly `collect_set` otherwise.
    */
  def collect_set_bounded(c: Column, cap: Int): Column =
    Shim.column(CollectSetBounded(Shim.expression(c), cap).toAggregateExpression())
}
