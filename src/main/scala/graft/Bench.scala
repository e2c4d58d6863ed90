package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line to stdout with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology: results are materialized through the noop datasource
  * (full execution of the physical plan, no driver-side collect, and no
  * count()-style plan pruning that would skip projections), after one
  * untimed warmup pass that absorbs JIT, codegen compilation, and
  * parquet footer/file-listing caches. Caches registered by operators are
  * drained between queries so every timed run pays its own compute.
  *
  * The default query set is the SURVEY §6 headline list — a short JSON
  * line survives log-tail truncation on the consumer side, and the
  * headline queries span the plan shapes that matter (scan+agg, multi-way
  * join, LSH dedup, ANN, text scoring, end-to-end curation). Set
  * SPARK_GRAFT_BENCH_QUERIES=all (or a comma list) for wider runs.
  */
object Bench {

  private val headline = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "dedup_minhash_lsh", "ann_bruteforce_topk",
    "text_quality", "pipeline_curate")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.plans.GraftExtensions(_))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: String): Unit =
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally CacheRegistry.drain()

    val names = sys.env.get("SPARK_GRAFT_BENCH_QUERIES") match {
      case Some("all") => SparkEntry.queries.keys.toSeq.sorted
      case Some(list)  => list.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None        => headline
    }
    names.foreach { n =>                       // warmup (untimed)
      try materialize(n)
      catch { case e: Throwable => System.err.println(s"[bench] warmup $n: ${e.getMessage}") }
    }
    // best of two timed passes: single-pass numbers on a shared machine
    // carry transient-load noise (observed 2-4x swings between whole
    // runs); the min is the standard de-noised estimate of query cost
    val results = names.map { name =>
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { materialize(name); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] FAILED $name: ${e.getMessage}"); false
          }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1).min, runs.forall(_._2))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = f"${results.collect { case (_, v, true) => v }.sum}%.3f"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
