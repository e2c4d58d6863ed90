package graft

import graft.api.Prepared
import org.apache.spark.sql.functions._

/** Cross-stage persistence of compiled queries (Prepared): analyze once,
  * rebind constants per execution — semantics, error contract, and the
  * scale property that makes literal rebinding the right design (bound
  * parameters still push down to the scan).
  */
class PreparedSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sfTiny)

  test("bind executes the persisted skeleton with fresh constants") {
    val p = Prepared.compile(
      orders.filter(col("o_totalprice") > Prepared.param("cut", 0.0))
        .agg(count(lit(1)).as("n")))
    def direct(c: Double): Long =
      orders.filter(col("o_totalprice") > c).count()
    assert(p.bind("cut" -> 150000.0).head().getLong(0) === direct(150000.0))
    assert(p.bind("cut" -> 250000.0).head().getLong(0) === direct(250000.0))
    // and the two binds really saw different constants
    assert(direct(150000.0) !== direct(250000.0))
  }

  test("both binds share the one analyzed skeleton (compiled once)") {
    val p = Prepared.compile(
      orders.filter(col("o_totalprice") > Prepared.param("cut", 0.0))
        .select("o_orderkey"))
    val a = p.bind("cut" -> 1.0).queryExecution.logical
    val b = p.bind("cut" -> 2.0).queryExecution.logical
    // the bound plans are the SAME tree modulo the literal: replacing
    // each bound literal with the other's yields an equal canonical plan
    val a2 = a.transformAllExpressions {
      case l @ org.apache.spark.sql.catalyst.expressions.Literal(1.0, _) =>
        org.apache.spark.sql.catalyst.expressions.Literal(2.0, l.dataType)
    }
    assert(a2.canonicalized === b.canonicalized)
    // no marker survives binding
    val survivors = a.collect { case n =>
      n.expressions.flatMap(_.collect { case m: graft.api.ParamMarker => m })
    }.flatten
    assert(survivors.isEmpty, survivors)
  }

  test("bound parameter predicates push down to the parquet scan") {
    val p = Prepared.compile(
      orders.filter(col("o_totalprice") > Prepared.param("cut", 0.0))
        .select("o_orderkey"))
    val f = p.bind("cut" -> 150000.0).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(f.contains("GreaterThan(o_totalprice,150000.0)"), f)
  }

  test("unbound skeleton runs on its defaults; explicit binds are checked") {
    val p = Prepared.compile(
      orders.filter(col("o_totalprice") > Prepared.param("cut", 0.0))
        .agg(count(lit(1)).as("n")))
    assert(p.onDefaults.head().getLong(0) === orders.count())
    assert(p.params === Set("cut"))
    intercept[IllegalArgumentException](p.bind())
    intercept[IllegalArgumentException](p.bind("cut" -> 1.0, "oops" -> 2.0))
  }

  test("one name at two types is rejected at compile; one name at many sites binds once") {
    intercept[IllegalArgumentException] {
      Prepared.compile(orders.select(
        Prepared.param("x", 1.0).as("a"), Prepared.param("x", "s").as("b")))
    }
    val p = Prepared.compile(
      orders.filter(col("o_totalprice") > Prepared.param("cut", 0.0)
        && col("o_totalprice") < Prepared.param("cut", 0.0) * 2)
        .agg(count(lit(1)).as("n")))
    val n = p.bind("cut" -> 150000.0).head().getLong(0)
    val direct = orders
      .filter(col("o_totalprice") > 150000.0 && col("o_totalprice") < 300000.0)
      .count()
    assert(n === direct)
  }
}
