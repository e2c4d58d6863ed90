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
    // A doc is dropped iff it sits in the near-dup graph AND lost its
    // cluster's min-id election. That drop list is a sliver of the corpus
    // (only near-duplicates), so the representative filter is a broadcast
    // ANTI join against it — the full doc_id→cluster map (corpus-sized!)
    // is never materialized, never broadcast. Quality features are
    // computed in the same scan's project, no self-join.
    val pairs = Dedup.minhashLsh.fn(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val dropped = Graph.componentLabels(pairs)
      .filter(col("cluster") =!= col("id"))
      .select(col("id").as("dropped_id"))
    docs
      .join(broadcast(dropped), col("doc_id") === col("dropped_id"), "left_anti")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("lang"),
        size(expr("regexp_extract_all(text, '\\\\S+', 0)")).cast("long").as("tokens"),
        (size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).cast("double") /
          length(col("text"))).as("punct_ratio"))
      .filter(col("tokens") >= 10 && col("punct_ratio") < 0.2)
  }

  val ops: Seq[Op] = Seq(curate)
}
