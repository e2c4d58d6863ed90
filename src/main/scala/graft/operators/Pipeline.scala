package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.functions._

/** The capstone composition: a training-data curation pass that chains
  * the pipeline operators end to end — near-dup clustering (keep one
  * representative per cluster), quality gating, and language filtering —
  * producing the kept set with its quality features. This is the workload
  * the individual §2.2 operators exist for; at 100 TB it runs as one plan:
  * scan → sketch → bucket join → verify → fixpoint → broadcast-join the
  * (small) cluster map back onto documents → per-row quality gate.
  */
object Pipeline {

  val curate: Op = Op(
    "pipeline_curate",
    s"""WITH RECURSIVE ${Graph.clustersCteBody},
      |quality AS (
      |  SELECT doc_id,
      |    CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS tokens,
      |    CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE)
      |      / length(text) AS punct_ratio
      |  FROM documents WHERE length(text) > 0)
      |SELECT d.doc_id, d.lang, q.tokens, q.punct_ratio
      |FROM documents d
      |  JOIN clusters c ON c.doc_id = d.doc_id
      |  JOIN quality q ON q.doc_id = d.doc_id
      |WHERE c.cluster = d.doc_id      -- cluster representative (canonical doc)
      |  AND q.tokens >= 10            -- quality gates
      |  AND q.punct_ratio < 0.2""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val clusters = Graph.dedupClusters.fn(spark, dir)
      .withColumnRenamed("doc_id", "c_doc_id")
    val quality = docs.filter(length(col("text")) > 0).select(
      col("doc_id").as("q_doc_id"),
      size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tokens"),
      (size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).cast("double") /
        length(col("text"))).as("punct_ratio"))
    docs
      .join(broadcast(clusters), col("c_doc_id") === col("doc_id"))
      .join(quality, col("q_doc_id") === col("doc_id"))
      .filter(col("cluster") === col("doc_id") &&
        col("tokens") >= 10 && col("punct_ratio") < 0.2)
      .select("doc_id", "lang", "tokens", "punct_ratio")
  }

  val ops: Seq[Op] = Seq(curate)
}
