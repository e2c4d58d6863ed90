package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Repeated-measure probe for the dedup_minhash_lsh headline swing
  * (VERDICT r14 #7: best-of-two idle headline runs put minhash anywhere
  * in 1.04–1.46 s two rounds running — the dominant headline variance).
  * One session, one untimed warmup, then N timed noop materializations
  * of the registered op, each recording wall, executor cpu, task count,
  * GC delta, and a fresh mt-canary. The read: a TIGHT in-session band
  * (best/worst ≤ ~1.15) means the cross-run swing lives in per-SESSION
  * constants (JIT/codegen state, page cache, host era) that best-of-two
  * can't cancel — an attribution note, not a plan fix; a WIDE in-session
  * band names per-pass variance (GC pressure, shuffle-file churn) that a
  * plan change could actually address.
  *
  * Usage: runMain graft.MinhashSwing [sfDir] [passes] [outPath]
  */
object MinhashSwing {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(12)
    val outPath = args.lift(2).getOrElse("minhash_swing_r15.jsonl")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) { cpuNs.addAndGet(m.executorCpuTime); tasks.incrementAndGet() }
      }
    })
    def drained(): Unit = org.apache.spark.sql.graftshim.Shim
      .drainListenerBus(spark.sparkContext)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def pass(): Unit =
      try SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      finally CacheRegistry.drain()

    pass() // untimed warmup — same protocol as Bench
    val sb = new StringBuilder
    val walls = (1 to n).map { i =>
      drained(); cpuNs.set(0L); tasks.set(0L)
      val canaryMt = ScaleSmoke.cpuCanaryMt()
      val g0 = gcMs()
      val t0 = System.nanoTime()
      pass()
      val wall = (System.nanoTime() - t0) / 1e9
      drained()
      val line = s"""{"pass": $i, "wall_s": ${f3(wall)}, "cpu_s": ${f3(cpuNs.get / 1e9)}, "tasks": ${tasks.get}, "gc_ms": ${gcMs() - g0}, "cpu_canary_mt_s": ${f3(canaryMt)}}"""
      println(s"[minhash-swing] $line")
      sb.append(line).append('\n')
      wall
    }
    val band = walls.max / walls.min
    val summary = s"""{"passes": $n, "best_s": ${f3(walls.min)}, "worst_s": ${f3(walls.max)}, "band": ${f3(band)}, "median_s": ${f3(walls.sorted.apply(n / 2))}}"""
    println(s"[minhash-swing] $summary")
    sb.append(summary).append('\n')
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), sb.toString)
    spark.stop()
  }
}
