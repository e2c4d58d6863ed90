package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based checks of the custom Catalyst expressions against
  * straightforward reference implementations (raw ScalaCheck generators
  * sampled with fixed seeds — deterministic, no bridge dependency).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("vec_dot matches a sequential reference fold on random vectors") {
    import spark.implicits._
    import graft.functions.vec._
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = samples(Gen.zip(gen, gen), 20)
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(got.toSeq == expected) // bit-exact, same fold order
  }

  test("intersect_size matches distinct-set intersection on random arrays") {
    import spark.implicits._
    import graft.functions.vec._
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val pairs = samples(Gen.zip(gen, gen), 30)
    val df = pairs.toDF("a", "b")
    val got = df.select(intersect_size(col("a"), col("b"))).collect().map(_.getInt(0))
    val expected = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got.toSeq == expected)
  }

  test("simhash_bits matches a reference bit-vote implementation") {
    import spark.implicits._
    import graft.functions.simhash._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty)).map(_.map(md5hex))
    val inputs = samples(gen, 20)
    val df = inputs.map(Tuple1(_)).toDF("m")
    val got = df.select(simhash_bits(col("m"))).collect().map(_.getString(0))
    val expected = inputs.map { md5s =>
      (0 until 32).map { b =>
        val votes = md5s.map(m => if ("89abcdef".contains(m.charAt(b))) 1 else -1).sum
        if (votes > 0) '1' else '0'
      }.mkString
    }
    assert(got.toSeq == expected)
  }
}
