package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.DataType

/** Max-heap buffer of the k SMALLEST elements seen. The heap is the
  * whole point: per-group state is O(k) at ANY input volume, and partial
  * heaps merge associatively (the k smallest of a union is a function of
  * the operands' k-smallest sets), so the result never depends on
  * partial-aggregation order — the oracle-gate requirement.
  */
final class BoundedTopKHeap(k: Int, ord: Ordering[Any])
    extends mutable.Growable[Any] with Iterable[Any] {
  // max-heap: head is the LARGEST of the kept k — the eviction candidate
  private val pq = mutable.PriorityQueue.empty[Any](ord)
  override def addOne(e: Any): this.type = {
    if (pq.size < k) pq.enqueue(e)
    else if (ord.lt(e, pq.head)) { pq.dequeue(); pq.enqueue(e) }
    this
  }
  override def clear(): Unit = pq.clear()
  override def knownSize: Int = pq.knownSize
  override def iterator: Iterator[Any] = pq.iterator
  def sortedAsc: Seq[Any] = pq.toSeq.sorted(ord)
}

/** Aggregate keeping the `k` smallest child values (ascending output
  * array) under the type's natural total order — for a struct child,
  * lexicographic field order, so `topk_agg(struct(delay, id), 4)` is
  * "the 4 earliest (delay, id) pairs".
  *
  * vs TopKPerKeyExec: the exec EXCHANGES the full candidate set to
  * cluster it by key before any heap sees it; this aggregate runs
  * map-side PARTIAL heaps inside the producer's own partitioning, so
  * the exchange carries ≤ k rows per (key, task).
  *
  * BOUNDED-KEYS CAVEAT (learned the hard way): the partial heaps live
  * in ObjectHashAggregate, which falls back to SORT-BASED aggregation
  * past the per-task key threshold — and the fallback SORTS THE INPUT
  * STREAM. Feeding it an output-quadratic producer whose keys-per-task
  * are unbounded (a broadcast range join hands every task every key;
  * AQE partition coalescing re-widens shuffle-join tasks) reintroduces
  * the full-stream sort this aggregate exists to avoid — measured as a
  * ~35 GB spill and disk-full death on a skew-300x capped range join.
  * Use it where the producer's partitioning bounds keys per task; for
  * quadratic pair producers use a rank composition that never forms
  * the pair set at all (GraftApi.rangeJoinEarliestK).
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[BoundedTopKHeap] with UnaryLike[Expression] {

  require(k >= 1 && k <= 65536, s"topk_agg k=$k out of range [1, 65536]")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedTopKHeap =
    new BoundedTopKHeap(k, ord)

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def eval(buffer: BoundedTopKHeap): Any =
    new GenericArrayData(buffer.sortedAsc)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg requires an orderable type, got ${child.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "topk_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  /** Column-API form: ascending array of the group's k smallest values
    * of `c` (nulls are skipped — Collect semantics). O(k) buffer per
    * group, map-side partial heaps.
    */
  def topk_agg(c: Column, k: Int): Column =
    Shim.column(TopKAgg(Shim.expression(c), k).toAggregateExpression())
}
