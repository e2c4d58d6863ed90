package graft.operators

import graft.{Op, Tables}
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
    *
    * Retry safety: the salt is derived from ROW CONTENT (hash of every
    * probe column), never from `monotonically_increasing_id`/`rand` —
    * nondeterministic salts re-deal rows across partitions when a lost
    * shuffle-map output is recomputed while sibling outputs survive,
    * double-counting or dropping rows (the classic repartition-
    * nondeterminism hazard). A content hash replays identically on any
    * stage re-attempt, and spreads hot keys just as well as long as their
    * non-key columns vary (if ALL columns are identical the rows are
    * interchangeable and their placement can't matter for skew).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salts: Int): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col).toSeq: _*), lit(salts)))
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
    *
    * Salt = hash(key, value) — deterministic under stage re-attempt (see
    * saltedJoin's retry-safety note); value entropy spreads a hot key's
    * rows across reducers.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      salts: Int): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(hash(col(key), valueCol), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
    partial.groupBy(col(key))
      .agg(sum(col("_psum")).as("sum_value"), sum(col("_pcnt")).as("n"))
  }

  /** The salted two-phase aggregation as a driver-gated operator: events
    * has only 5 event_type values, i.e. EVERY key is a hot key — the
    * worst case for a single-phase final merge. The salt spreads each
    * key's partials over 8 reducers; decimal partial sums keep the result
    * independent of merge order, so the oracle is the plain GROUP BY.
    */
  val saltedAgg: Op = Op(
    "q_skew_salted_agg",
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
      |  COUNT(*) AS n
      |FROM events GROUP BY event_type""".stripMargin,
  ) { (spark, dir) =>
    saltedSumCount(Tables.events(spark, dir), "event_type",
        col("value").cast("decimal(12,2)"), salts = 8)
      .select(col("event_type"), col("sum_value").cast("double").as("sum_value"),
        col("n"))
  }

  /** The salted replicated-build join as a driver-gated operator: events'
    * 150 distinct user_ids against 1500 customers means every probe key
    * is hot (~670 rows each at sf0.1). The build side replicates 8×, the
    * probe side salts, and the result is provably identical to the
    * direct join — the oracle is the plain SQL join aggregate.
    */
  val saltedJoinOp: Op = Op(
    "q_skew_salted_join",
    """SELECT c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment""".stripMargin,
  ) { (spark, dir) =>
    val probe = Tables.events(spark, dir).select(
      col("user_id"), col("value").cast("decimal(12,2)").as("v"))
    val build = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    saltedJoin(probe, build, "user_id", "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("double").as("sum_value"))
  }

  val ops: Seq[Op] = Seq(saltedAgg, saltedJoinOp)
}
