package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Warm-solo A/B harness for the dedup_substring plan forms (r11
  * adjudication — VERDICT r10 "Next round" #1). One FORM per JVM
  * invocation (so no form pays or inherits another's heap context), run
  * TWICE inside that JVM: the cold pass carries JIT/codegen/page-cache
  * constants, the warm pass is the adjudication number (the r5/r9
  * warm-solo protocol from SURVEY §7). Per-pass executorCpuTime and
  * disk spill ride along — wall seconds on this shared machine swing
  * with co-tenant load, cpu does not.
  *
  * Usage: runMain graft.SubstringAB <corpusDir> <form> [label]
  * where form ∈ graft.operators.Dedup.substringScoredForms ∪
  * substringStripForms. Appends one JSON line per pass to
  * the artifact file (arg 4, default substring_ab_r12.jsonl) in the CWD.
  */
object SubstringAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val form = args(1)
    val label = if (args.length > 2) args(2) else dir.split('/').last
    val outFile = if (args.length > 3) args(3) else "substring_ab_r12.jsonl"
    val fn = (graft.operators.Dedup.substringScoredForms ++
      graft.operators.Dedup.substringStripForms).toMap.apply(form)
    // host-speed canary BEFORE the session: cross-era reads of this
    // artifact normalize cpu_s by it (see BASELINE.md's machine block)
    val canaryS = ScaleSmoke.cpuCanary()
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // mirror ScaleSmoke's data-sized session shuffle partitions so the
    // aggregate stages see the same parallelism a sweep slot would
    val baseRows = Tables.load(spark, dir, "documents").count()
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.api.GraftApi.partitionsFor(spark, baseRows * 60).toString)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "33554432")
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })
    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    val out = new java.lang.StringBuilder
    Seq("cold", "warm").foreach { pass =>
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      cpuNs.set(0L); spillDisk.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, Tables.documents(spark, dir))
      val hash = df
        .select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
        // bit_xor over zero rows is NULL — coalesce so a 0-row form
        // records (0, 0) instead of crashing the harness on getLong
        .agg(count(lit(1)).as("n"), coalesce(expr("bit_xor(_h)"), lit(0L)))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      val line = f"""{"form": "$form", "corpus": "$label", "pass": "$pass", """ +
        f""""sec": ${sec}%.3f, "cpu_s": ${cpuNs.get() / 1e9}%.3f, """ +
        f""""spill_disk_mb": ${spillDisk.get() / 1048576}%d, """ +
        f""""rows": ${hash.getLong(0)}%d, "hash": ${hash.getLong(1)}%d, """ +
        f""""heap_gb": ${heapGb}%.1f, "cpu_canary_s": ${canaryS}%.3f}"""
      println(s"[substring-ab] $line")
      out.append(line).append('\n')
      CacheRegistry.drain(blocking = true)
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(300)
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), out.toString,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
