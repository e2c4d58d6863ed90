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

  /** The reference's derivation module made explicit
    * (ivm/derivation/Prototype.scala, PrototypeTest.scala: `derive(q, l)`
    * returns x => q(l) ∪ q'(x)): for LINEAR operators — map, flatMap,
    * filter, union, i.e. any per-row pipeline — the derivative of q with
    * respect to a base-collection insert IS q itself applied to the
    * arriving rows: q(B ∪ X) = q(B) ∪ q(X). On Spark that means a
    * maintained linear view never recomputes the base: each micro-batch
    * runs the same plan over the delta alone (exactly how Structured
    * Streaming executes stateless transforms). Named here so callers can
    * state the intent; PropertySpec proves the law on a representative
    * filter∘select∘explode chain, and the streaming flatMap/union view
    * specs are its incremental execution.
    *
    * Non-linear operators (aggregates, joins, distinct) need the signed
    * machinery below ([[aggDelta]]/[[applyDelta]]/[[joinDelta]]) — the
    * reference splits along the same line.
    */
  def linearDelta(q: DataFrame => DataFrame)(delta: DataFrame): DataFrame =
    q(delta)

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

  // -------------------------------------------------------------------
  // Maintained JOIN views under signed deltas (reference
  // IncrementalResult join maintenance, insertions AND removals).
  // All frames are counted multisets: value columns + an `n`
  // multiplicity column (states carry n > 0; deltas carry signed n).
  // -------------------------------------------------------------------

  /** Merge a signed counted-multiset delta into a counted view keyed by
    * `keys`; rows whose multiplicity reaches zero leave the view.
    */
  def mergeCounted(view: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"))
      .filter(col("n") =!= 0)

  /** Delta of the join view A⋈B for side deltas dA/dB — the bilinear
    * rule ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB with multiplicity products
    * (signs ride the products, so removals fall out of the same
    * algebra). Cost is O(|delta| ⋈ state) keyed joins — never a rescan
    * of the join's history, which is the whole point of IVM at 100 TB:
    * the states are big keyed tables, the deltas are slivers that join
    * against them in place.
    *
    * All three frames must share `key` and `n`; value columns must be
    * disjoint between the A side and B side.
    */
  def joinDelta(aOld: DataFrame, bOld: DataFrame,
      dA: DataFrame, dB: DataFrame, key: String): DataFrame = {
    def part(l: DataFrame, r: DataFrame): DataFrame = {
      val ln = l.withColumnRenamed("n", "_ln")
      val rn = r.withColumnRenamed("n", "_rn").withColumnRenamed(key, "_rk")
      ln.join(rn, col(key) === col("_rk"))
        .withColumn("n", col("_ln") * col("_rn"))
        .drop("_ln", "_rn", "_rk")
    }
    part(dA, bOld)
      .unionByName(part(aOld, dB))
      .unionByName(part(dA, dB))
  }

  /** Recompute the counted join view from counted states (spec baseline). */
  def recomputeJoin(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val joined = joinDelta(a.limit(0), b, a, b.limit(0), key) // dA⋈B_old only
    val keys = joined.columns.filterNot(_ == "n").toSeq
    mergeCounted(joined.limit(0), joined, keys)
  }
}
