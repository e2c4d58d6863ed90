package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixpoint computation (reference: ivm/expressiontree/Fix.scala,
  * tests/FixpointTest.scala) realized as the operation a dedup pipeline
  * actually needs at scale: connected components over the near-duplicate
  * pair graph, assigning every document a canonical cluster id (the
  * minimum reachable doc_id).
  *
  * Execution model: iterative label propagation — join labels to edges,
  * take the min neighbor label, repeat until no label changes. Each
  * iteration is a keyed shuffle join (Pregel-style); iteration count is
  * the graph diameter, which for near-dup clusters is tiny. Results are
  * persisted per round and old lineage is dropped so plans stay flat at
  * 1000-executor scale.
  */
object Graph {

  /** Connected components over an (a,b) pair DataFrame; vertices not in
    * any pair keep their own id. Returns (id, cluster).
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // iterate only over vertices that appear in some pair: the near-dup
    // graph is a sliver of the corpus (dozens of docs out of millions at
    // production scale), so the fixpoint loop never touches the full
    // vertex set; isolated vertices get identity labels in one final
    // left join.
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .persist()
    val connected = edges.select(col("a").as("id")).distinct()
    var labels = connected.select(col("id"), col("id").as("cluster")).persist()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val viaNeighbor = edges
        .join(labels, edges("b") === labels("id"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster")).as("nbr_min"))
      val next = labels.as("l")
        .join(viaNeighbor.as("n"), col("l.id") === col("n.id"), "left")
        .select(col("l.id").as("id"),
          least(col("l.cluster"), coalesce(col("n.nbr_min"), col("l.cluster"))).as("cluster"))
        .persist()
      changed = next.as("x").join(labels.as("y"), col("x.id") === col("y.id"))
        .filter(col("x.cluster") =!= col("y.cluster")).count()
      labels.unpersist()
      labels = next
      it += 1
    }
    edges.unpersist()
    // the final labels stay persisted for the caller's consumption; the
    // registry releases them once the caller has materialized its result
    graft.CacheRegistry.register(labels)
    vertices.as("v")
      .join(labels.as("l"), col("v.id") === col("l.id"), "left")
      .select(col("v.id").as("id"),
        coalesce(col("l.cluster"), col("v.id")).as("cluster"))
  }

  /** Dedup clustering: MinHash+LSH verified near-dup pairs → connected
    * components → every doc labeled with its canonical (min) doc id.
    */
  /** Shared CTE body (everything after WITH RECURSIVE, through the
    * `clusters` relation) so composite oracles (pipeline_curate) can
    * reuse the exact same fixpoint definition.
    */
  private[operators] val clustersCteBody: String =
    s"""sh AS (${Dedup.shinglesSql}),
      |sk AS (SELECT doc_id, shingles,
      |         list_sort(list_transform(shingles, s -> md5(s)))[1:8] AS sketch
      |       FROM sh),
      |buckets AS (SELECT doc_id, unnest(sketch) AS h FROM sk),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM buckets a JOIN buckets b ON a.h = b.h AND a.doc_id < b.doc_id),
      |pairs AS (
      |  SELECT doc_a AS a, doc_b AS b
      |  FROM cand JOIN sk sa ON sa.doc_id = doc_a
      |            JOIN sk sb ON sb.doc_id = doc_b
      |  WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |      (len(sa.shingles) + len(sb.shingles)
      |       - len(list_intersect(sa.shingles, sb.shingles))) >= 0.2),
      |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      |reach(n, r) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.n),
      |clusters AS (SELECT n AS doc_id, MIN(r) AS cluster FROM reach GROUP BY n)""".stripMargin

  val dedupClusters: Op = Op(
    "dedup_clusters",
    // The recursive CTE mirrors the fixpoint: reach(n, r) = n reaches r
    // through the (symmetric) near-dup edge set; cluster = min reachable.
    s"""WITH RECURSIVE $clustersCteBody
      |SELECT doc_id, cluster FROM clusters""".stripMargin,
  ) { (spark, dir) =>
    val pairs = Dedup.minhashLsh.fn(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val vertices = Tables.documents(spark, dir).select(col("doc_id").as("id"))
    connectedComponents(vertices, pairs)
      .select(col("id").as("doc_id"), col("cluster"))
  }

  val ops: Seq[Op] = Seq(dedupClusters)
}
