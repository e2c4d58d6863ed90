package graft

import graft.functions.CollectSetBounded.collect_set_bounded
import org.apache.spark.sql.functions._

/** collect_set_bounded: exactly collect_set for groups within the cap,
  * deterministically NULL for groups over it, O(cap) buffer either way.
  */
class CollectSetBoundedSpec extends SparkSpec {

  test("equals collect_set + size filter on a randomized skewed frame") {
    import spark.implicits._
    // keys with wildly different cardinalities, values with duplicates
    val rng = new scala.util.Random(7)
    val rows = (0 until 20000).map { _ =>
      val k = rng.nextInt(40)
      // per-key distinct cardinality grows with the key: key k draws
      // values from a pool of size (k+1)*3 — some keys under any cap,
      // some over
      (k, rng.nextInt((k + 1) * 3).toLong)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val cap = 17
    val bounded = df.groupBy("k")
      .agg(collect_set_bounded(col("v"), cap).as("ids"))
      .filter(col("ids").isNotNull)
      .select(col("k"), array_sort(col("ids")).as("ids"))
    val plain = df.groupBy("k")
      .agg(collect_set(col("v")).as("ids"))
      .filter(size(col("ids")) <= cap)
      .select(col("k"), array_sort(col("ids")).as("ids"))
    val b = bounded.as[(Int, Seq[Long])].collect().toMap
    val p = plain.as[(Int, Seq[Long])].collect().toMap
    assert(b == p, s"bounded=${b.size} plain=${p.size}")
    assert(b.nonEmpty && b.size < 40, b.size) // both regimes exercised
  }

  test("overflow is deterministic across partitionings") {
    import spark.implicits._
    val rows = (0 until 1000).map(i => (i % 5, i.toLong))
    for (parts <- Seq(1, 3, 32)) {
      val got = rows.toDF("k", "v").repartition(parts)
        .groupBy("k").agg(collect_set_bounded(col("v"), 64).as("ids"))
        .select(col("k"), col("ids").isNull.as("over"))
        .as[(Int, Boolean)].collect().toMap
      // every key has 200 distinct values > 64 → all NULL, at any layout
      assert(got.values.forall(identity), s"parts=$parts $got")
    }
  }

  test("struct elements work (the simhash band buffer shape)") {
    import spark.implicits._
    val df = Seq((1, 10L, 100L), (1, 11L, 101L), (1, 10L, 100L), (2, 20L, 200L))
      .toDF("band", "doc_id", "num")
    val got = df.groupBy("band")
      .agg(array_sort(collect_set_bounded(struct(col("doc_id"), col("num")), 64)).as("ms"))
      .select(col("band"), expr("transform(ms, m -> m.doc_id)").as("ids"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(10L, 11L) && got(2) == Seq(20L), got)
  }

  test("SQL-registered via extensions") {
    import spark.implicits._
    Seq((1, 5L), (1, 6L), (1, 5L)).toDF("k", "v").createOrReplaceTempView("csb_t")
    val r = spark.sql(
      "SELECT k, array_sort(collect_set_bounded(v, 10)) AS ids FROM csb_t GROUP BY k")
      .as[(Int, Seq[Long])].head()
    assert(r == ((1, Seq(5L, 6L))), r)
    val over = spark.sql(
      "SELECT collect_set_bounded(v, 1) AS ids FROM csb_t")
      .select(col("ids").isNull).as[Boolean].head()
    assert(over)
  }

  test("caps past the linear threshold escalate to the hash index exactly") {
    import spark.implicits._
    // 300 distinct longs under a cap of 400: crosses CompactBoundedSet's
    // 128-element linear→hash boundary; must still equal collect_set.
    // Long.MinValue rides along to pin the open-hash EMPTY sentinel.
    val rows = (0 until 900).map(i => (1, (i % 300).toLong)) :+ ((1, Long.MinValue))
    val got = rows.toDF("k", "v").repartition(16)
      .groupBy("k").agg(array_sort(collect_set_bounded(col("v"), 400)).as("ids"))
      .select("ids").as[Seq[Long]].head()
    assert(got == (Long.MinValue +: (0L until 300L)).sorted, got.length)
  }

  test("string elements past the linear threshold (generic hash path)") {
    import spark.implicits._
    val rows = (0 until 600).map(i => (1, s"s${i % 200}"))
    val got = rows.toDF("k", "v").repartition(8)
      .groupBy("k").agg(array_sort(collect_set_bounded(col("v"), 256)).as("ids"))
      .select("ids").as[Seq[String]].head()
    assert(got == (0 until 200).map(i => s"s$i").sorted, got.length)
  }

  test("CompactBoundedSet distinct-insert across representations") {
    val s = new graft.functions.CompactBoundedSet
    (0 until 200).foreach(i => s += Long.box(i % 50))
    assert(s.size == 50 && s.iterator.map(_.asInstanceOf[Long]).toSet == (0L until 50L).toSet)
    val g = new graft.functions.CompactBoundedSet
    (0 until 200).foreach(i => g += s"v${i % 150}") // crosses LinearMax in generic mode
    assert(g.size == 150)
    g += "v0"
    assert(g.size == 150)
  }

  test("nulls are ignored and an all-null group yields an empty set") {
    import spark.implicits._
    val df = Seq((1, Some(5L)), (1, None), (2, None))
      .toDF("k", "v")
    val got = df.groupBy("k")
      .agg(collect_set_bounded(col("v"), 4).as("ids"))
      .select(col("k"), col("ids")).as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(5L) && got(2) == Seq.empty, got)
  }
}
