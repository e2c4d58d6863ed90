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

  test("q3-shaped multi-join skeleton keeps per-scan pushdown across 3 binds") {
    // the CrossStagePersistence analog exercised on a COMPOSITE plan, not
    // just a scan: two parameters feeding different tables of a 3-way
    // join. Every bind must (a) match the directly-built query and
    // (b) land its fresh literals in the right scans' PushedFilters —
    // re-binding must never strand a predicate above a join.
    val cust = Tables.customer(spark, sfTiny)
    val ords = Tables.orders(spark, sfTiny)
    val li = Tables.lineitem(spark, sfTiny)
    def shape(seg: org.apache.spark.sql.Column, cut: org.apache.spark.sql.Column) =
      cust.filter(col("c_mktsegment") === seg)
        .join(ords, col("c_custkey") === col("o_custkey"))
        .filter(col("o_totalprice") > cut)
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("long").as("qty"))
    val p = Prepared.compile(
      shape(Prepared.param("seg", "NONE"), Prepared.param("cut", 0.0)))
    val binds = Seq(("BUILDING", 100000.0), ("AUTOMOBILE", 150000.0),
      ("MACHINERY", 50000.0))
    binds.foreach { case (seg, cut) =>
      val bound = p.bind("seg" -> seg, "cut" -> cut)
      val f = bound.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(f.contains(s"EqualTo(c_mktsegment,$seg)"),
        s"customer scan lost the $seg pushdown:\n$f")
      assert(f.contains(s"GreaterThan(o_totalprice,$cut)"),
        s"orders scan lost the $cut pushdown:\n$f")
      val got = bound.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = shape(lit(seg), lit(cut)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got.nonEmpty, s"bind ($seg, $cut): got=${got.size}")
    }
  }
}
