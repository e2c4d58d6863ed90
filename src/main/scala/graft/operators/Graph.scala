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

  /** Component labels over ONLY the vertices that appear in some pair:
    * the near-dup graph is a sliver of the corpus (dozens of docs out of
    * millions at production scale), so the fixpoint loop never touches
    * the full vertex set. Returns (id, cluster) for pair-graph vertices;
    * every other vertex is implicitly its own cluster. The convergence
    * flag is computed inside the propagation step itself (old vs new
    * label in one row) — no extra join per iteration.
    */
  /** Adaptive entry point: the near-dup pair graph is tiny BY DESIGN
    * (pairs exist only after LSH candidate generation + exact-Jaccard
    * verification), so when it fits comfortably on the driver the
    * fixpoint runs as local union-find — the same small-side reasoning
    * that makes a broadcast join correct. Past the threshold (long-id
    * graphs only; ~64 MB of edges at the default) it falls back to the
    * distributed propagation loop, whose per-iteration cost is what a
    * billion-edge graph actually needs. The pair DataFrame is counted
    * once and cached for whichever path runs.
    */
  def componentLabels(pairs0: DataFrame, maxIter: Int = 20,
      localEdgeLimit: Long = 4000000L): DataFrame = {
    // An edge with a null endpoint carries no connectivity information,
    // and downstream both paths are null-hostile (the local path's
    // primitive Long encoder NPEs; the distributed path's === self-loop
    // filter and join keys drop null ids, starving the convergence
    // check into a spurious non-convergence failure). Drop such rows
    // here, once: a null-id vertex — if the caller lists one in
    // `vertices` — still gets its identity label via the isolated-vertex
    // path in [[connectedComponents]].
    val pairs = graft.CacheRegistry.track(
      pairs0.filter(col("a").isNotNull && col("b").isNotNull))
    val isLongIds = pairs.schema.fields.take(2)
      .forall(_.dataType == org.apache.spark.sql.types.LongType)
    if (isLongIds && pairs.count() <= localEdgeLimit) localUnionFind(pairs)
    else distributedLabels(pairs, maxIter)
  }

  /** Union-find with path compression; representative = component min.
    * Runs on the collected edge list (guarded by localEdgeLimit above).
    */
  private def localUnionFind(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    // primitive tuple encoder, not Row: 4M boxed Rows would cost the
    // driver ~1 GB of heap; Long pairs keep the guard's "small side"
    // promise at ~tens of MB
    val edges = pairs.select(col("a").cast("long"), col("b").cast("long"))
      .as[(Long, Long)].collect()
    // Vertex ids → dense indices via one primitive sort+dedupe. All the
    // working state is primitive arrays (a boxed SortedSet/LongMap here
    // would cost ~64 B per entry — hundreds of MB at the edge guard,
    // breaking the very budget the collect guard promises). Ascending id
    // order means index order ≡ id order, so min-INDEX roots are exactly
    // the min-ID canonical clusters.
    val verts = new Array[Long](edges.length * 2)
    var i = 0
    while (i < edges.length) {
      verts(2 * i) = edges(i)._1; verts(2 * i + 1) = edges(i)._2; i += 1
    }
    java.util.Arrays.sort(verts)
    var n = 0
    i = 0
    while (i < verts.length) {
      if (n == 0 || verts(i) != verts(n - 1)) { verts(n) = verts(i); n += 1 }
      i += 1
    }
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    def idx(v: Long): Int = java.util.Arrays.binarySearch(verts, 0, n, v)
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(idx(a)), find(idx(b)))
      // min id becomes the root, so roots ARE the canonical cluster ids
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    val labels: IndexedSeq[(Long, Long)] =
      (0 until n).map(v => (verts(v), verts(find(v))))
    spark.createDataset(labels).toDF("id", "cluster")
  }

  private def distributedLabels(pairs: DataFrame, maxIter: Int): DataFrame = {
    // Symmetric closure PLUS a self-loop per vertex: one propagation step
    // is then a single join+groupBy — min over in-neighbors' labels
    // (self included) — instead of a neighbor join followed by a
    // least(own, neighbors) left join. The self-loop row also carries each
    // vertex's PREVIOUS label through the same join, so convergence is a
    // changed-label count over the step's own materialization — typed for
    // ANY id type. (An id-sum check would fail analysis on the string-id
    // graphs this path is the designated fallback for, or — cast to null,
    // coalesced to 0 — report false convergence silently.)
    val sym = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
    val edges = sym
      .union(sym.select(col("a"), col("a").as("b")).distinct())
      .persist()
    var cached = edges.filter(col("a") === col("b"))
      .select(col("a").as("id"), col("a").as("cluster")).persist()
    var labels = cached
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val stepped = edges.join(labels, edges("b") === labels("id"))
        .groupBy(edges("a").as("id"))
        .agg(min(col("cluster")).as("cluster"),
          // exactly one self-loop row per vertex ⇒ this min IS the
          // previous label, riding the same shuffle for free
          min(when(edges("b") === edges("a"), col("cluster"))).as("prev"))
        .persist()
      val changed = stepped.filter(!(col("cluster") <=> col("prev")))
        .count() // materializes the persist
      converged = changed == 0L
      cached.unpersist()
      cached = stepped
      labels = stepped.select(col("id"), col("cluster"))
      it += 1
    }
    edges.unpersist()
    if (!converged) {
      // Min-label propagation moves one hop per iteration; a component
      // whose diameter exceeds maxIter exits this loop with labels that
      // are NOT the component minimum. Returning them would silently
      // mis-cluster (wrong canonical ids → wrong keep/drop decisions
      // downstream), so fail loudly like every other guard in the repo.
      cached.unpersist()
      throw new IllegalStateException(
        s"componentLabels: propagation did not converge within maxIter=$maxIter " +
          "iterations (component diameter exceeds the budget); raise maxIter")
    }
    // the final labels stay persisted for the caller's consumption; the
    // registry releases them once the caller has materialized its result
    graft.CacheRegistry.register(cached)
    labels
  }

  /** Connected components over an (a,b) pair DataFrame; vertices not in
    * any pair keep their own id. Returns (id, cluster).
    */
  def connectedComponents(vertices: DataFrame, pairs: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val labels = componentLabels(pairs, maxIter)
    // isolated vertices get identity labels in one final left join
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
    s"""${Dedup.minhashCandCte},
      |pairs AS (
      |${Dedup.minhashVerifiedSql("doc_a AS a, doc_b AS b")}),
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
