package graft

import graft.api.GraftApi
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k physical operator must agree exactly with the
  * window row_number formulation and plan through TopKPerKeyExec.
  */
class TopKPerKeySpec extends SparkSpec {

  test("topKPerKey equals the window-rank formulation on events") {
    val ev = Tables.events(spark, sfTiny)
    val custom = GraftApi.topKPerKey(ev.toDF(),
        "user_id", "value", "event_id", k = 3)
      .select("user_id", "event_id", "value")
    val windowed = ev
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "value")
    assert(custom.collect().toSet == windowed.collect().toSet)
  }

  test("plans through TopKPerKeyExec with a single hash exchange and no sort") {
    val ev = Tables.events(spark, sfTiny)
    val custom = GraftApi.topKPerKey(ev.toDF(),
      "user_id", "value", "event_id", k = 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Sort "), s"no per-group sort expected:\n$plan")
  }

  test("partial heaps run below the exchange — the shuffle carries winners only") {
    val ev = Tables.events(spark, sfTiny)
    val custom = GraftApi.topKPerKey(ev.toDF(),
      "user_id", "value", "event_id", k = 3)
    val plan = custom.queryExecution.executedPlan.toString
    // partial/final pair with the hash exchange BETWEEN them: per-key
    // top-k is decomposable, so each input partition shrinks to ≤ keys·k
    // rows before any data moves (the aggregation map-side-combine shape)
    val i1 = plan.indexOf("TopKPerKey")
    val i2 = plan.indexOf("TopKPerKey", i1 + 1)
    assert(i2 > i1, s"expected a partial+final TopKPerKey pair:\n$plan")
    val between = plan.substring(i1, i2)
    assert(between.contains("Exchange"), s"exchange must sit between final and partial:\n$plan")
  }

  test("k larger than any group returns everything") {
    val ev = Tables.events(spark, sfTiny)
    val custom = GraftApi.topKPerKey(ev.toDF(),
      "user_id", "value", "event_id", k = 1000000)
    assert(custom.count() == ev.count())
  }

  test("string keys and duplicate order values handled") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 1L), ("a", 1.0, 2L), ("a", 1.0, 3L),
      ("b", 5.0, 4L), (null, 2.0, 5L), (null, 3.0, 6L),
    ).toDF("k", "v", "id")
    val got = GraftApi.topKPerKey(df, "k", "v", "id", k = 2)
      .select("k", "id").collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getLong(1))).toSet
    // ties on v resolved by smallest id; null key is its own group
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 4L), ("NULL", 5L), ("NULL", 6L)))
  }

  test("null order/tiebreak values match the window-function null placement") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(1L)), ("a", None, Some(2L)), ("a", Some(3.0), None),
      ("b", None, None), ("b", None, Some(7L)), ("b", Some(0.0), Some(8L)),
    ).toDF("k", "v", "id")
    val custom = GraftApi.topKPerKey(df, "k", "v", "id", k = 2)
      .select("k", "v", "id")
    val windowed = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 2).select("k", "v", "id")
    assert(custom.collect().toSet == windowed.collect().toSet)
  }

  test("bounded heaps hold at 1M rows over 100k keys") {
    import spark.implicits._
    val df = spark.range(1000000L).select(
      (col("id") % 100000).as("k"),
      (col("id") % 997).cast("double").as("v"),
      col("id").as("tie"))
    val out = GraftApi.topKPerKey(df, "k", "v", "tie", k = 3)
    assert(out.count() == 300000L) // 3 per key, memory O(keys·k) not O(rows)
    val worst = out.filter(col("k") === 0L).select("v").collect().map(_.getDouble(0)).sorted
    // per key 0: ids 0, 100000, ..., values (id % 997) — top-3 must be the 3 largest
    val expect = (0L until 1000000L by 100000L).map(id => (id % 997).toDouble).sorted.takeRight(3)
    assert(worst.toSeq == expect)
  }

  test("partial cap: key cardinality beyond the heap-map cap passes through, result exact") {
    import spark.implicits._
    // 100k distinct keys in ONE partition exceeds the 65536-key partial
    // cap, so the overflow keys' rows pass through unreduced and the
    // final phase must still produce the exact per-key top-k
    val df = spark.range(400000L).select(
        (col("id") % 100000).as("k"),
        (col("id") % 991).cast("double").as("v"),
        col("id").as("tie"))
      .coalesce(1)
    val got = GraftApi.topKPerKey(df, "k", "v", "tie", k = 2)
    assert(got.count() == 200000L)
    // spot-check one key against the window formulation
    val w0 = df.filter(col("k") === 7L)
      .orderBy(col("v").desc, col("tie")).limit(2)
      .select("tie").collect().map(_.getLong(0)).toSet
    val g0 = got.filter(col("k") === 7L)
      .select("tie").collect().map(_.getLong(0)).toSet
    assert(g0 == w0, s"got $g0 want $w0")
  }

  test("array-typed keys are deep-copied, not aliased into the scan buffer") {
    import spark.implicits._
    val df = (1 to 100).map(i => (Seq(s"g${i % 5}", "x"), i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val custom = GraftApi.topKPerKey(df, "k", "v", "id", k = 3)
      .select(col("k")(0).as("g"), col("id"))
    val windowed = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
      .filter(col("rn") <= 3).select(col("k")(0).as("g"), col("id"))
    assert(custom.collect().toSet == windowed.collect().toSet)
  }
}
