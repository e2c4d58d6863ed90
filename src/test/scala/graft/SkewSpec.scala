package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salting must never change results — verified against the direct plans
  * on a synthetic 95%-hot-key distribution.
  */
class SkewSpec extends SparkSpec {

  private lazy val (facts, dim) = {
    import spark.implicits._
    // 20k rows, 95% on key 7
    val facts = spark.range(20000)
      .select((when(pmod(col("id"), lit(20)) < 19, 7).otherwise(pmod(col("id"), lit(20))))
        .cast("long").as("k"),
        (col("id") % 100).cast("double").as("v"))
    val dim = Seq((7L, "hot"), (3L, "cold"), (15L, "cool"), (99L, "unmatched"))
      .toDF("dk", "name")
    (facts, dim)
  }

  test("salted join equals direct join") {
    val direct = facts.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(12,2)")).as("s"))
    val salted = Skew.saltedJoin(facts, dim, "k", "dk", salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(12,2)")).as("s"))
    assert(salted.collect().toSet == direct.collect().toSet)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = facts.groupBy("k")
      .agg(sum(col("v").cast("decimal(12,2)")).as("sum_value"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(facts, "k", col("v").cast("decimal(12,2)"), salts = 8)
    assert(salted.collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).toSet ==
      direct.collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2))).toSet)
  }
}
