package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  * Each SURVEY §2 operator is an [[Op]] (Spark query + DuckDB oracle SQL,
  * defined adjacently in graft.operators.*); this object just assembles
  * the registry the driver consumes.
  */
object SparkEntry {

  def allOps: Seq[Op] =
    Relational.ops ++ Extended.ops ++ WindowOps.ops ++ Temporal.ops ++
      TextAnalysis.ops ++ Dedup.ops ++ Similarity.ops ++ Multimodal.ops ++
      Graph.ops ++ Sources.ops ++ Pipeline.ops ++ Sampling.ops ++ Skew.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allOps.map(op => op.name -> op.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allOps.flatMap(op => op.oracle.map(op.name -> _)).toMap
}
