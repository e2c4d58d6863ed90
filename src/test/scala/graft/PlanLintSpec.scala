package graft

/** Plan lint over the ENTIRE operator registry: no operator may plan a
  * CartesianProduct, and BroadcastNestedLoopJoin is allowed only where a
  * deliberately-tiny broadcast side scores against every row (the ANN
  * query sets, |Q| ≤ 8). This is the "would this survive a 100× scale-up"
  * review from SURVEY §4, run as a test instead of by eye.
  */
class PlanLintSpec extends SparkSpec {

  private val bnlAllowed = Set(
    // broadcast side is the ≤8-vector query set by construction
    "ann_bruteforce_topk",
    // one-row hyperplane matrix / centroid set cross the scan by design
    "ann_rh_lsh_topk", "ann_ivf_topk")

  test("no operator plans a cartesian product; BNL only on tiny-broadcast ops") {
    val offenders = SparkEntry.allOps.flatMap { op =>
      val plan =
        try op.fn(spark, sfTiny).queryExecution.executedPlan.toString
        catch { case e: Throwable => s"PLANNING FAILED: ${e.getMessage}" }
      val cart = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed(op.name)
      val failed = plan.startsWith("PLANNING FAILED")
      if (cart || bnl || failed)
        Some(s"${op.name}: cartesian=$cart bnl=$bnl failed=$failed")
      else None
    }
    CacheRegistry.drain()
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
