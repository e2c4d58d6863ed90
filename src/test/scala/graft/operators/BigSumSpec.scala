package graft.operators

import org.apache.spark.sql.functions._

/** The split accumulator behind q1's money sums and text_idf_rarity's
  * micro-unit rarity sum: terms near the long ceiling (a singleton token
  * contributes total·10⁶ — ~9e18 at the documented ~9e12-token corpus
  * bound) must SUM exactly where a plain long sum overflows (under ANSI:
  * throws) with as few as two such rows.
  */
class BigSumSpec extends graft.SparkSpec {

  test("bigSum is exact past the plain-long-sum ceiling") {
    import spark.implicits._
    // ten rows of ~Long.MaxValue/2: plain sum overflows at row 3
    val big = Long.MaxValue / 2 + 11L
    val terms = Seq.fill(10)(big) ++ Seq(1048575L, 7L, 0L)
    val df = terms.toDF("x")
    val got = df.agg(Relational.bigSum(col("x")).as("s"))
      .head().getDecimal(0)
    val expected = terms.map(BigInt(_)).sum
    assert(BigInt(got.toBigInteger) == expected)
    // and the plain long sum really does overflow here (ANSI throws) —
    // the guard this spec exists to keep honest
    val e = intercept[ArithmeticException] { // SparkArithmeticException
      df.agg(sum(col("x"))).head()
    }
    assert(e.getMessage.toLowerCase.contains("overflow"))
  }

  test("bigSum matches a plain sum in the no-overflow regime") {
    import spark.implicits._
    val terms = Seq(0L, 1L, 999999L, 123456789L, 1048576L)
    val df = terms.toDF("x")
    val got = df.agg(Relational.bigSum(col("x")).as("s")).head().getDecimal(0)
    assert(got.longValueExact() == terms.sum)
  }
}
