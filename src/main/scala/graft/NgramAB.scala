package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._

/** Warm-solo A/B harness for the dedup_ngram_jaccard SAMPLING COIN
  * (r13 adjudication — VERDICT r12 "Next round" #1: bench_full wall
  * went 0.68 → 2.33 s while shuffle mass halved; the md5-per-gram
  * sample predicate is the only code-changed suspect). Protocol is the
  * house warm-solo one (SubstringAB / SURVEY §7): one FORM per JVM
  * invocation, cold + warm passes, the warm pass adjudicates; per-pass
  * executorCpuTime + disk spill + BOTH host canaries ride along (the
  * single-thread one separates "host slow", the 32-thread one "host
  * contended" — r12 lesson: absolute cpu_s across runs is unreadable
  * without them).
  *
  * Forms (graft.operators.Dedup.ngramForms): ngram_md5_hex (the r12
  * substring(md5,1,1)-isin predicate), ngram_md5_expr (raw-digest
  * [[graft.functions.Md5Nibble0]] coin — same semantics, no hex
  * string), ngram_unsampled (no coin — cost reference; its hash
  * legitimately differs since sampling changes candidate recall).
  *
  * Usage: runMain graft.NgramAB <corpusDir> <form> [label] [outFile]
  * `form` may be comma-separated: the forms then run INTERLEAVED twice
  * in this one JVM (round1 = warm-up, round2 = adjudication) — the
  * same-JVM back-to-back protocol, which is the only cost comparison
  * this shared box makes trustworthy without canary arithmetic.
  */
object NgramAB {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val forms = args(1).split(',').toSeq
    val label = if (args.length > 2) args(2) else dir.split('/').last
    val outFile = if (args.length > 3) args(3) else "ngram_ab_r13.jsonl"
    // host-speed canaries BEFORE the session (see SubstringAB)
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
    // single form: cold+warm solo passes; multiple forms: interleaved
    // rounds (round2 adjudicates) — see the usage note above
    val passes =
      if (forms.size == 1) Seq("cold", "warm").map(p => (forms.head, p))
      else Seq("round1", "round2").flatMap(p => forms.map(f => (f, p)))
    passes.foreach { case (form, pass) =>
      val fn = graft.operators.Dedup.ngramForms.toMap.apply(form)
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
      println(s"[ngram-ab] $line")
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
