package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers — SURVEY §4. AQE's skew-join handling covers
  * sort-merge joins at runtime; these cover the cases it can't: salted
  * replication when a broadcast isn't possible, and two-phase aggregation
  * when a handful of group keys dominate (the 100 TB hot-key reality).
  * Both are semantics-preserving (spec-verified against the direct plan).
  */
object Skew {

  /** Inner equi-join with a salted probe side and an S-fold replicated
    * build side: hot probe keys spread across S reducers instead of one.
    * Result set is identical to `probe.join(build, probeKey === buildKey)`.
    * Use when the build side is too big to broadcast but small enough to
    * replicate S times.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Two-phase (salted) aggregation for associative aggregates: partial
    * aggregate on (key, salt), then final aggregate on key. Spark's
    * hash-partial aggregation already combines map-side, but a single hot
    * key still lands on one reducer for the final merge of its partials —
    * with salting the heavy partial work spreads over S reducers and the
    * final pass merges only S rows per key.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      salts: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }
}
