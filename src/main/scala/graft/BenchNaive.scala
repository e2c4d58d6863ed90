package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimized-vs-naive speedup measurement — the reference's
  * performancetests/QueryBenchmarking.scala claim ("how much does the
  * optimizer buy on the same query?") re-run against Catalyst + this
  * repo's custom plans. PlanSpec asserts the optimized SHAPES; this main
  * measures what those shapes are worth in wall time and records it as
  * `bench_naive.json` (NaiveBaselineSpec gates the cartprod ratio in CI).
  *
  * Pairs (each naive variant is the SAME query semantics, de-optimized
  * through documented session confs — never a different algorithm
  * hand-written to lose):
  *  - cartprod_to_join: customer×orders filtered on the key. Naive
  *    excludes PushPredicateThroughJoin so the filter stays ABOVE the
  *    cross join — a genuine CartesianProduct (asserted on the plan)
  *    scoring |C|·|O| pairs; optimized is the extracted equi-join
  *    (reference Optimization.scala cartProdToJoin). sf0.01: the naive
  *    side is 22.5M pairs — big enough to measure, small enough to run.
  *  - topk_per_key: per-key top-3 of events. Naive is the row_number
  *    window (full per-key sort behind one exchange); optimized is the
  *    TopKPerKeyExec whole-operator plan (PARTIAL/FINAL bounded heaps,
  *    same exchange, no sort).
  *  - q6_scan_pushdown: TPC-H Q6. Naive turns parquet filter pushdown
  *    off (the scan decodes every row group and every row reaches the
  *    filter operator); optimized is the default pushed scan
  *    (PushedFilters + row-group pruning).
  */
object BenchNaive {

  private def withConf[T](spark: SparkSession, kv: (String, String)*)(f: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private val excludeKey = "spark.sql.optimizer.excludedRules"
  // the cross+filter → equi-join extraction lives in the predicate
  // pushdown batch AND ReorderJoin's ExtractFiltersAndInnerJoins — both
  // must sit out for the filter to stay above a real CartesianProduct
  private val pushPredRule =
    "org.apache.spark.sql.catalyst.optimizer.PushDownPredicates," +
      "org.apache.spark.sql.catalyst.optimizer.ReorderJoin," +
      "org.apache.spark.sql.catalyst.optimizer.PushPredicateThroughJoin"

  def cartQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .crossJoin(Tables.orders(spark, dir))
      .filter(col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

  /** (naive seconds, optimized seconds) for the cartprod pair, each
    * best-of-`passes`, with the naive plan asserted to actually carry a
    * CartesianProduct (a silently re-optimized "naive" run would record
    * a fake 1× ratio).
    */
  def cartPair(spark: SparkSession, dir: String, passes: Int = 2): (Double, Double) = {
    val naive = withConf(spark, excludeKey -> pushPredRule,
      // without this the planner broadcasts the small side into a
      // nested-loop cross — still all-pairs, but pin the canonical shape
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = cartQuery(spark, dir).queryExecution.executedPlan.toString
      require(plan.contains("CartesianProduct"),
        s"naive cartprod variant was optimized anyway:\n$plan")
      time(cartQuery(spark, dir), passes)
    }
    val opt = {
      val plan = cartQuery(spark, dir).queryExecution.executedPlan.toString
      require(!plan.contains("CartesianProduct"),
        s"optimized cartprod variant still cartesian:\n$plan")
      time(cartQuery(spark, dir), passes)
    }
    (naive, opt)
  }

  def topkPair(spark: SparkSession, dir: String, passes: Int = 2): (Double, Double) = {
    import org.apache.spark.sql.expressions.Window
    def naiveDf = Tables.events(spark, dir)
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "value")
    def optDf = graft.api.GraftApi.topKPerKey(
        Tables.events(spark, dir), "user_id", "value", "event_id", k = 3)
      .select("user_id", "event_id", "value")
    (time(naiveDf, passes), time(optDf, passes))
  }

  def q6Pair(spark: SparkSession, dir: String, passes: Int = 2): (Double, Double) = {
    def df = graft.operators.Relational.q6ForecastRevenue.fn(spark, dir)
    val naive = withConf(spark,
      "spark.sql.parquet.filterPushdown" -> "false",
      "spark.sql.parquet.aggregatePushdown" -> "false") {
      time(df, passes)
    }
    (naive, time(df, passes))
  }

  private def time(df: => DataFrame, passes: Int): Double = {
    // one untimed warmup, then best-of-`passes` noop writes — the Bench
    // convention (min = de-noised cost on a shared machine)
    df.write.format("noop").mode("overwrite").save()
    (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.min
  }

  private def f3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val sf001 = "/root/testdata/sf0.01"
    val sf01 = "/root/testdata/sf0.1"
    val pairs = Seq(
      ("cartprod_to_join", sf001, () => cartPair(spark, sf001)),
      ("topk_per_key", sf01, () => topkPair(spark, sf01)),
      ("q6_scan_pushdown", sf01, () => q6Pair(spark, sf01)))
    val rows = pairs.map { case (name, sf, run) =>
      val (naive, opt) = run()
      val speedup = naive / math.max(opt, 1e-9)
      println(f"[naive-bench] $name%-20s naive ${naive}%7.3f s  opt ${opt}%7.3f s  ${speedup}%6.2fx")
      s"""  "$name": {"naive_sec": ${f3(naive)}, "opt_sec": ${f3(opt)}, "speedup": ${f3(speedup)}, "sf": "$sf"}"""
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_naive.json"),
      rows.mkString("{\n", ",\n", "\n}"))
    spark.stop()
  }
}
