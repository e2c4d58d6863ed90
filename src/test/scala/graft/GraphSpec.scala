package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** The adaptive connected-components operator: the local union-find path
  * and the distributed label-propagation path must produce identical
  * labels (min reachable id) on graphs with chains (diameter > 1),
  * cliques, and isolated pairs.
  */
class GraphSpec extends SparkSpec {

  private def labelSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "cluster").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("local union-find and distributed propagation agree") {
    import spark.implicits._
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),     // chain, diameter 4
      (10L, 11L),                                 // isolated pair
      (20L, 21L), (21L, 22L), (20L, 22L),         // clique
      (31L, 30L),                                 // reversed order pair
    ).toDF("a", "b")
    val expected = Set(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L),
      (30L, 30L), (31L, 30L))
    val local = Graph.componentLabels(pairs)                      // small → local
    val dist = Graph.componentLabels(pairs, localEdgeLimit = 0L)  // forced distributed
    assert(labelSet(local) == expected)
    assert(labelSet(dist) == expected)
    CacheRegistry.drain()
  }

  test("null-endpoint edges are dropped, not a non-convergence crash") {
    import spark.implicits._
    // a NULL vertex id used to get no self-loop on the distributed path
    // (=== filter drops it), so `prev` stayed null forever and the
    // convergence guard threw; now the edge is ignored at entry
    val pairs = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(4L), null.asInstanceOf[java.lang.Long]),
    ).toDF("a", "b")
    val expected = Set((1L, 1L), (2L, 1L))
    assert(labelSet(Graph.componentLabels(pairs)) == expected)
    assert(labelSet(Graph.componentLabels(pairs, localEdgeLimit = 0L))
      == expected)
    CacheRegistry.drain()
  }

  test("empty pair graph yields empty labels on both paths") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Graph.componentLabels(none).count() == 0)
    assert(Graph.componentLabels(none, localEdgeLimit = 0L).count() == 0)
    CacheRegistry.drain()
  }

  test("distributed propagation handles string ids (the non-long fallback)") {
    import spark.implicits._
    // string ids route to the distributed path regardless of edge count;
    // the old sum-of-ids convergence check either failed analysis here or
    // cast to null → coalesce(0) → false convergence with wrong labels
    val pairs = Seq(
      ("doc_b", "doc_c"), ("doc_a", "doc_b"),   // chain a-b-c
      ("doc_x", "doc_y"),
    ).toDF("a", "b")
    val labels = Graph.componentLabels(pairs)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(labels == Set(
      ("doc_a", "doc_a"), ("doc_b", "doc_a"), ("doc_c", "doc_a"),
      ("doc_x", "doc_x"), ("doc_y", "doc_x")))
    CacheRegistry.drain()
  }

  test("propagation past maxIter fails loudly instead of mis-clustering") {
    import spark.implicits._
    // chain of diameter 6: min-label propagation moves one hop per
    // iteration, so maxIter=2 cannot converge — the op must throw, not
    // silently return labels that are not the component minimum
    val chain = (1L until 7L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Graph.componentLabels(chain, maxIter = 2, localEdgeLimit = 0L).collect()
    }
    assert(e.getMessage.contains("maxIter"))
    // a sufficient budget converges to the right labels on the same graph
    val ok = Graph.componentLabels(chain, maxIter = 10, localEdgeLimit = 0L)
    assert(labelSet(ok) == (1L to 7L).map(i => (i, 1L)).toSet)
    CacheRegistry.drain()
  }
}
