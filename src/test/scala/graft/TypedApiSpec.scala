package graft

import graft.api.Schema
import org.apache.spark.sql.functions._

/** Typed Dataset[T] path: the reference's statically-typed queries map to
  * case-class encoders; typed lambdas and column expressions interoperate
  * on the same Dataset and agree with the DataFrame formulation.
  */
class TypedApiSpec extends SparkSpec {

  test("typed Q6-shaped filter agrees with the column formulation") {
    import spark.implicits._
    val ds = Schema.lineitems(spark, sfTiny)
    val typed = ds.filter(l =>
        l.l_discount >= 0.03 && l.l_discount <= 0.05 && l.l_quantity < 24)
      .map(l => l.l_extendedprice * l.l_discount)
      .reduce(_ + _)
    val columnar = Tables.lineitem(spark, sfTiny)
      .filter(col("l_discount").between(0.03, 0.05) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).head.getDouble(0)
    assert(math.abs(typed - columnar) < 1e-6 * math.abs(columnar))
  }

  test("typed groupByKey + mapGroups computes per-flag stats") {
    import spark.implicits._
    val stats = Schema.lineitems(spark, sfTiny)
      .groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var q = 0.0
        rows.foreach { l => n += 1; q += l.l_quantity }
        (flag, n, q)
      }.collect().map(t => t._1 -> t._2).toMap
    val expected = Tables.lineitem(spark, sfTiny)
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == expected)
  }

  test("typed documents flow into the dedup shingle pipeline") {
    import spark.implicits._
    val long = Schema.documents(spark, sfTiny).filter(_.n_chars > 100)
    assert(long.count() > 0)
  }

  test("streaming dedup drops re-arrivals of identical content") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case class Doc(ts: java.sql.Timestamp, doc_id: Long, text: String)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (java.sql.Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
    val q = graft.streaming.EventStreams.streamingDedup(df, "text")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t0 = 86400000L
      def ts(m: Long) = new java.sql.Timestamp(t0 + m * 60000)
      input.addData((ts(0), 1L, "same text"), (ts(1), 2L, "same text"),
        (ts(2), 3L, "other text"))
      q.processAllAvailable()
      input.addData((ts(5), 4L, "same text")) // still within watermark → dropped
      q.processAllAvailable()
      val rows = spark.table("dedup_out").collect()
      assert(rows.length == 2, rows.mkString(";"))
      assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 3L))
    } finally q.stop()
  }
}
