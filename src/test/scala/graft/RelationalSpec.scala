package graft

import graft.operators._

/** Result-level invariants for SURVEY §2.1 operators at sf0.001.
  * (Exact value parity vs DuckDB is the driver's t2 gate / scripts/check.py;
  * these specs pin semantic invariants and run in plain `sbt test`.)
  */
class RelationalSpec extends SparkSpec {

  private def run(op: Op) = op.fn(spark, sfTiny)

  test("q1 groups by (returnflag, linestatus) with positive sums") {
    val rows = run(Relational.q1PricingSummary).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Long]("count_order") > 0)
    }
  }

  test("q3 top-k is sorted by revenue desc") {
    val revs = run(Relational.q3ShippingPriority)
      .collect().map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("semi and anti join partition the customer set") {
    val all = Tables.customer(spark, sfTiny).count()
    val semi = spark.sql("select 1").sparkSession.emptyDataFrame // placeholder shape
    val semiN = run(Relational.semiJoinExists).count()
    // anti uses a different predicate (>300k) so check against its own complement
    val ordersHit = Tables.customer(spark, sfTiny)
      .join(Tables.orders(spark, sfTiny)
        .filter(org.apache.spark.sql.functions.col("o_totalprice") > 300000),
        org.apache.spark.sql.functions.col("c_custkey") ===
          org.apache.spark.sql.functions.col("o_custkey"), "left_semi").count()
    val antiN = run(Relational.antiJoinNotExists).count()
    assert(ordersHit + antiN == all)
    assert(semiN <= ordersHit)
  }

  test("union distinct equals distinct of union all") {
    val u = run(Relational.unionDistinct).count()
    val ua = run(Relational.unionAll).select("c_custkey").distinct().count()
    assert(u == ua)
  }

  test("groupBy nested collections are sorted") {
    run(Extended.unzipPairs).collect().foreach { r =>
      val ids = r.getAs[String]("ids").split(',').map(_.toLong).toSeq
      assert(ids == ids.sorted)
    }
  }

  test("sessionization: session ids are dense per user and counts add up") {
    val df = run(WindowOps.sessionize)
    val total = df.agg(org.apache.spark.sql.functions.sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sfTiny).count())
    import org.apache.spark.sql.functions._
    val bad = df.groupBy("user_id")
      .agg(max("session_id").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(bad == 0, "session ids must be dense 1..n per user")
  }

  test("merge upsert: matched keys update, source-only keys insert, rest unchanged") {
    val out = run(Relational.mergeUpsert).collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        ((r.getAs[String]("merge_action"), r.getAs[String]("c_mktsegment"))))
      .toMap
    // every key appears exactly once (MERGE is a keyed upsert, not a union)
    assert(out.size == run(Relational.mergeUpsert).count())
    out.foreach { case (k, (action, seg)) =>
      if (k % 3 == 0 && k % 10 != 0)
        assert(action == "updated" && seg == "UPSERTED", s"$k: $action/$seg")
      else if (k % 3 == 0 && k % 10 == 0)
        assert(action == "inserted" && seg == "UPSERTED", s"$k: $action/$seg")
      else {
        assert(k % 10 != 0, s"target-only key $k must be % 10 != 0")
        assert(action == "unchanged" && seg != "UPSERTED", s"$k: $action/$seg")
      }
    }
    // all three actions actually exercised on the tiny corpus
    val actions = out.values.map(_._1).toSet
    assert(actions == Set("updated", "inserted", "unchanged"), actions)
  }

  test("entry returns non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every op with an oracle also appears in queries map") {
    val q = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(q.contains(k), k))
  }
}
