package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-side incremental view maintenance under signed deltas — the face
  * of the reference's IVM that Structured Streaming cannot express:
  * REMOVALS (ivm/collections/IncrementalResult.scala maintains query
  * results under both insertion and removal events; IVMTest1 exercises
  * `-=`). Structured Streaming's state is append/update-only, so the
  * removal path is a batch delta merge: a maintained aggregate view plus
  * a signed delta batch produces the new view without touching history.
  *
  * Algebra: per-key counted multiset aggregation. Every aggregate
  * maintained here (count, sum) is a commutative group, so applying a
  * delta is a keyed union + re-aggregate of |keys touched| rows — O(delta)
  * work, never O(history). Keys whose multiplicity reaches zero leave the
  * view (the reference drops emptied groups the same way).
  *
  * At 100 TB the maintained view is a keyed table; the merge is one
  * shuffle of the DELTA (a sliver) against the view's partitioning —
  * with the view bucketed by key, the merge co-locates and the delta is
  * the only thing that moves.
  */
object DeltaViews {

  /** Delta-ize a batch of events-shaped rows into signed per-key aggregate
    * deltas: `sign` = +1 for insertions, -1 for removals.
    */
  def aggDelta(events: DataFrame, keyCol: String, valueCol: String,
      sign: Int): DataFrame = {
    require(sign == 1 || sign == -1, "sign must be +1 or -1")
    events.groupBy(col(keyCol).as("key"))
      .agg((count(lit(1)) * sign).as("n"),
        (sum(col(valueCol).cast("decimal(12,2)")) * sign).as("sum_value"))
  }

  /** Apply a signed delta to a maintained (key, n, sum_value) view. */
  def applyDelta(view: DataFrame, delta: DataFrame): DataFrame =
    view.unionByName(delta)
      .groupBy(col("key"))
      .agg(sum(col("n")).as("n"),
        sum(col("sum_value")).cast("decimal(12,2)").as("sum_value"))
      .filter(col("n") > 0)

  /** Build the view from scratch (the recompute the maintenance avoids —
    * specs assert maintained ≡ recomputed).
    */
  def recompute(events: DataFrame, keyCol: String, valueCol: String): DataFrame =
    aggDelta(events, keyCol, valueCol, 1)
}
