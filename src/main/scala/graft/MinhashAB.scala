package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Warm-solo A/B harness for the dedup_minhash_lsh SKETCH PATH (r13 —
  * the headline-gap investigation: a 1x stage profile showed the
  * sketch projection dominating at ~15 of 15.8 cpu-s, and the
  * projection was a full per-document md5-array sort for a bottom-8
  * selection, over shingle arrays that were THEMSELVES string-sorted
  * for no consumer). Forms (graft.operators.Dedup.minhashForms):
  * mh_r12 (sorted shingles + slice/array_sort sketch), mh_nosort_slice
  * (unsorted shingles, old sketch — isolates the builder sort),
  * mh_bottomk (unsorted shingles + Md5BottomK bounded selection — the
  * r13 registered form). All hash-identical by construction
  * (HashCoinsSpec pins it).
  *
  * Protocol = NgramAB's: single form → cold+warm solo passes;
  * comma-separated forms → interleaved rounds in one JVM (round2
  * adjudicates). Both host canaries ride every line.
  *
  * Usage: runMain graft.MinhashAB <corpusDir> <form[,form...]> [label] [outFile]
  */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val forms = args(1).split(',').toSeq
    val label = if (args.length > 2) args(2) else dir.split('/').last
    val outFile = if (args.length > 3) args(3) else "minhash_ab_r13.jsonl"
    val canaryS = ScaleSmoke.cpuCanary()
    val canaryMtS = ScaleSmoke.cpuCanaryMt()
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
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
    val passes =
      if (forms.size == 1) Seq("cold", "warm").map(p => (forms.head, p))
      else Seq("round1", "round2").flatMap(p => forms.map(f => (f, p)))
    passes.foreach { case (form, pass) =>
      val fn = (graft.operators.Dedup.minhashForms ++
        graft.operators.Dedup.incrementalForms).toMap.apply(form)
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      cpuNs.set(0L); spillDisk.set(0L)
      val t0 = System.nanoTime()
      val df = fn(spark, Tables.documents(spark, dir))
      val hash = df
        .select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
        .agg(count(lit(1)).as("n"), coalesce(expr("bit_xor(_h)"), lit(0L)))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      val line = f"""{"form": "$form", "corpus": "$label", "pass": "$pass", """ +
        f""""sec": ${sec}%.3f, "cpu_s": ${cpuNs.get() / 1e9}%.3f, """ +
        f""""spill_disk_mb": ${spillDisk.get() / 1048576}%d, """ +
        f""""rows": ${hash.getLong(0)}%d, "hash": ${hash.getLong(1)}%d, """ +
        f""""heap_gb": ${heapGb}%.1f, "cpu_canary_s": ${canaryS}%.3f, """ +
        f""""cpu_canary_mt_s": ${canaryMtS}%.3f}"""
      println(s"[minhash-ab] $line")
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
