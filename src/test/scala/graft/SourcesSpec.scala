package graft

import org.apache.spark.sql.functions._

/** SURVEY §2.4 sources/sinks: CSV and JSON file round-trips, partitioned
  * parquet writes (partition pruning observable in the scan), and a
  * streaming file sink.
  */
class SourcesSpec extends SparkSpec {

  test("csv round-trip preserves rows and schema-on-read works") {
    val dir = tmpDir()
    val nation = Tables.nation(spark, sfTiny)
    nation.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/nation_csv")
    assert(back.count() == nation.count())
    assert(back.columns.sameElements(nation.columns))
  }

  test("json corrupt-record quarantine counts exactly the mangled rows") {
    val events = Tables.events(spark, sfTiny)
    val total = events.count()
    val mangled = events.filter(col("event_id") % 7 === 0).count()
    val res = graft.operators.Sources.jsonCorrupt.fn(spark, sfTiny)
      .agg(sum("n").as("n"), sum("n_corrupt").as("c")).collect()(0)
    // nothing dropped, nothing thrown: row total preserved, and the
    // quarantine column flags EXACTLY the deterministically-corrupted set
    assert(res.getAs[Long]("n") == total)
    assert(res.getAs[Long]("c") == mangled && mangled > 0)
  }

  test("json lines round-trip preserves values") {
    val dir = tmpDir()
    val region = Tables.region(spark, sfTiny)
    region.write.mode("overwrite").json(s"$dir/region_json")
    val back = spark.read.json(s"$dir/region_json")
    assert(back.select("r_regionkey", "r_name").collect().toSet ==
      region.collect().toSet.map((r: org.apache.spark.sql.Row) => r))
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = tmpDir()
    Tables.lineitem(spark, sfTiny)
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(s"$dir/li_part")
    val pruned = spark.read.parquet(s"$dir/li_part")
      .where(col("l_returnflag") === "R")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(pruned.count() ==
      Tables.lineitem(spark, sfTiny).where(col("l_returnflag") === "R").count())
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    import spark.implicits._
    val dir = tmpDir()
    Seq((1L, "a")).toDF("id", "v1")
      .write.mode("append").parquet(s"$dir/evolving")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(s"$dir/evolving")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/evolving")
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = merged.collect().map(r =>
      r.getAs[Long]("id") -> Option(r.get(r.fieldIndex("v2")))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5))) // old files read nulls
  }

  test("orc round-trip preserves values and pushes filters into the scan") {
    val dir = tmpDir()
    val orders = Tables.orders(spark, sfTiny)
    orders.write.mode("overwrite").orc(s"$dir/orders_orc")
    val back = spark.read.orc(s"$dir/orders_orc")
      .where(col("o_totalprice") > 300000)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThan(o_totalprice"), plan)
    assert(back.count() ==
      orders.where(col("o_totalprice") > 300000).count())
  }

  test("streaming file sink appends windowed aggregates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      graft.streaming.EventStreams.Event]
    val out = tmpDir()
    val q = graft.streaming.EventStreams.windowedCounts(input.toDF())
      .writeStream.format("parquet")
      .option("path", s"$out/win")
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .start()
    try {
      val t0 = 86400000L
      input.addData(
        graft.streaming.EventStreams.Event(new java.sql.Timestamp(t0), 1L, "click", 1.0),
        graft.streaming.EventStreams.Event(new java.sql.Timestamp(t0 + 60000), 2L, "click", 2.0))
      q.processAllAvailable()
      // push the watermark past the first window so append emits it
      input.addData(graft.streaming.EventStreams.Event(
        new java.sql.Timestamp(t0 + 4 * 3600 * 1000), 1L, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$out/win").collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 2, rows.mkString(";"))
    } finally q.stop()
  }
}
