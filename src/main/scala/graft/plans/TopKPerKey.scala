package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator extension — tier (c) of the extension ladder (SURVEY
  * §2/§7): per-key top-k as a first-class operator.
  *
  * Spark's idiom for "top k rows per key" is a row_number window + filter,
  * which sorts every key group in full. This operator keeps a bounded
  * binary heap of k rows per key instead: O(n log k) with O(keys·k)
  * memory, no per-partition sort. The reference's optimizer does the same
  * class of rewrite — swapping an algorithmically better physical operator
  * under unchanged semantics (FoldPhysicalOperators.scala).
  *
  * Semantics: rows ordered by `order` DESC, ties broken by `tiebreak` ASC
  * (both arbitrary orderable expressions); exactly min(k, |group|) rows
  * per distinct `key` — identical to
  * row_number().over(partitionBy(key).orderBy(order.desc, tiebreak.asc)) <= k.
  */
case class TopKPerKeyNode(key: Expression, order: Expression,
    tiebreak: Expression, k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** One heap pass. Planned as a PARTIAL/FINAL pair (the aggregation
  * idiom): the partial instance runs on the child's existing partitioning
  * and shrinks each partition to ≤ keys·k rows BEFORE the exchange, so
  * the shuffle carries partitions·keys·k rows instead of the full input —
  * per-key top-k is decomposable (a global top-k row is necessarily in
  * its partition's local top-k). The final instance requires co-location
  * and reduces the partial winners. For an ANN re-rank scoring |corpus|
  * candidate rows per query this is the difference between shuffling the
  * corpus and shuffling k rows per (partition, query).
  */
case class TopKPerKeyExec(key: Expression, order: Expression,
    tiebreak: Expression, k: Int, child: SparkPlan,
    partial: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Final: all rows of one key co-located; the planner inserts the
    * exchange (hash on key) only when the child isn't already partitioned
    * compatibly — bucketed/pre-shuffled inputs skip it. Partial: runs
    * wherever the rows already are.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(Seq(key)) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    val keyExpr = BindReferences.bindReference(key, child.output)
    val orderExpr = BindReferences.bindReference(order, child.output)
    val tieExpr = BindReferences.bindReference(tiebreak, child.output)
    val kk = k
    // Null-aware orderings, matching the window-function equivalence
    // (order DESC NULLS LAST, tiebreak ASC NULLS FIRST): under both, a
    // null sorts BELOW every non-null in the base ordering, so one
    // nulls-first wrapper serves both roles (PhysicalDataType.ordering
    // alone would NPE unboxing a null).
    def nullsFirst(base: Ordering[Any]): Ordering[Any] = new Ordering[Any] {
      def compare(x: Any, y: Any): Int =
        if (x == null && y == null) 0
        else if (x == null) -1
        else if (y == null) 1
        else base.compare(x, y)
    }
    val orderOrd = nullsFirst(
      PhysicalDataType.ordering(orderExpr.dataType).asInstanceOf[Ordering[Any]])
    val tieOrd = nullsFirst(
      PhysicalDataType.ordering(tieExpr.dataType).asInstanceOf[Ordering[Any]])

    child.execute().mapPartitions({ rows =>
      // heap entry: (orderVal, tieVal, row); the heap is a MIN-heap under
      // the output ordering (order DESC, tie ASC), so the head is the
      // weakest row currently kept and is evicted first.
      implicit val entryOrd: Ordering[(Any, Any, UnsafeRow)] =
        new Ordering[(Any, Any, UnsafeRow)] {
          def compare(a: (Any, Any, UnsafeRow), b: (Any, Any, UnsafeRow)): Int = {
            val c = orderOrd.compare(a._1, b._1)          // smaller order = weaker
            if (c != 0) c else tieOrd.compare(b._2, a._2) // larger tie = weaker
          }
        }
      val heaps = new java.util.HashMap[Any, scala.collection.mutable.PriorityQueue[(Any, Any, UnsafeRow)]]()
      val copier = UnsafeProjection.create(child.output, child.output)
      // Partial memory guard (the aggregation fallback idiom): pre-shuffle
      // a partition can see EVERY key, so the heap map is capped — rows of
      // keys beyond the cap pass through unreduced, which is always
      // correct (the final phase reduces them; partial reduction is an
      // optimization, never a requirement). The final phase is uncapped:
      // its keys are hash-distributed, the same bound the single-phase
      // operator always had.
      val capKeys = if (partial) 65536 else Int.MaxValue
      val passThrough = rows.flatMap { row =>
        val kv0 = keyExpr.eval(row)
        val kv = if (kv0 == null) NullKey else kv0
        val ov = orderExpr.eval(row)
        val tv = tieExpr.eval(row)
        var heap = heaps.get(kv)
        if (heap == null && heaps.size() >= capKeys) {
          Iterator.single(copier(row).copy(): InternalRow)
        } else {
          if (heap == null) {
            // PriorityQueue dequeues the MAX under its ordering; reverse so
            // dequeue removes the weakest entry
            heap = scala.collection.mutable.PriorityQueue.empty[(Any, Any, UnsafeRow)](entryOrd.reverse)
            heaps.put(copyKey(kv), heap)
          }
          if (heap.size < kk) {
            heap.enqueue((copyKey(ov), copyKey(tv), copier(row).copy()))
          } else if (entryOrd.compare((ov, tv, null), heap.head.copy(_3 = null)) > 0) {
            heap.dequeue()
            heap.enqueue((copyKey(ov), copyKey(tv), copier(row).copy()))
          }
          Iterator.empty
        }
      }
      import scala.jdk.CollectionConverters._
      // ++ evaluates its right side lazily, so the heap winners are read
      // only after the pass-through stream (and thus the heaps) is complete
      passThrough ++ heaps.values().iterator().asScala.flatMap(_.iterator.map(_._3))
    }, preservesPartitioning = true)
  }

  /** eval() results may point into the current row's buffers; detach.
    * InternalRow.copyValue deep-copies every buffer-backed type
    * (UTF8String, arrays, maps, structs, binary), not just strings.
    */
  private def copyKey(v: Any): Any = InternalRow.copyValue(v)
  private object NullKey

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(key, order, tie, k, child) =>
      TopKPerKeyExec(key, order, tie, k,
        TopKPerKeyExec(key, order, tie, k, planLater(child), partial = true)) :: Nil
    case _ => Nil
  }
}
