package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("stratified sample is deterministic and respects rates approximately") {
    val s1 = Sampling.stratifiedSample.fn(spark, sfTiny).collect().map(_.getLong(0)).sorted
    val s2 = Sampling.stratifiedSample.fn(spark, sfTiny).collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2), "sampling must be reproducible")
    val docs = Tables.documents(spark, sfTiny)
    val en = docs.filter(col("lang") === "en").count().toDouble
    val enKept = Sampling.stratifiedSample.fn(spark, sfTiny)
      .filter(col("lang") === "en").count().toDouble
    assert(enKept / en > 0.6 && enKept / en < 0.95, s"en keep rate ${enKept / en}")
  }

  test("reservoir sample: exact min(k, stratum) rows per language, bottom-k by coin") {
    val res = Sampling.reservoirSample.fn(spark, sfTiny)
    val got = res.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("coin")))
    // expected: per-lang ROW_NUMBER over (coin, doc_id) <= 7 — the window
    // formulation the bounded-heap plan must match exactly
    val docs = Tables.documents(spark, sfTiny)
    val coin = expr("conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10)")
      .cast("long")
    import org.apache.spark.sql.expressions.Window
    val expected = docs.select(col("lang"), col("doc_id"), coin.as("coin"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("coin"), col("doc_id"))))
      .filter(col("rn") <= 7).drop("rn")
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("coin")))
    assert(got.toSet == expected.toSet && got.nonEmpty)
    // exact-size contract: every stratum yields min(7, its size)
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    val perLang = got.groupBy(_._1).view.mapValues(_.length)
    sizes.foreach { case (lang, n) =>
      assert(perLang.getOrElse(lang, 0) == math.min(7L, n).toInt,
        s"$lang: got ${perLang.getOrElse(lang, 0)} of $n")
    }
  }

  test("approx distinct is within 5% of exact") {
    val joined = Sampling.approxDistinct.fn(spark, sfTiny)
      .join(Tables.events(spark, sfTiny)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users")), "event_type")
      .collect()
    joined.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) / exact < 0.05, s"${r}")
    }
  }

  test("approx percentiles land within 5% of the exact interpolated values") {
    val exact = Tables.events(spark, sfTiny)
      .groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("p50_exact"),
        expr("percentile(value, 0.95)").as("p95_exact"))
    val joined = Sampling.approxPercentile.fn(spark, sfTiny)
      .join(exact, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      for ((a, e) <- Seq("p50_approx" -> "p50_exact", "p95_approx" -> "p95_exact")) {
        val (approx, ex) = (r.getAs[Double](a), r.getAs[Double](e))
        assert(math.abs(approx - ex) / math.max(math.abs(ex), 1e-9) < 0.05,
          s"$a=$approx vs $e=$ex in $r")
      }
    }
  }

  test("vocab top-k is sorted and within corpus bounds") {
    val rows = Sampling.vocabTopK.fn(spark, sfTiny).collect()
    assert(rows.length == 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sameElements(ns.sortBy(-_)))
  }
}
