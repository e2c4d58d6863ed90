package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE warm-solo / same-JVM-interleaved A/B measurement protocol
  * (SubstringAB / SURVEY §7), factored once (ADVICE r13: MinhashAB and
  * NgramAB carried two near-verbatim copies of a protocol whose whole
  * value is that every A/B ever recorded ran the IDENTICAL wiring —
  * two copies WILL drift). The mains stay as thin wrappers so existing
  * invocations and JSONL consumers are unchanged.
  *
  * Protocol: host canaries BEFORE the session (single-thread = "host
  * slow", 32-thread = "host contended"); data-sized shuffle
  * partitions; per-pass executorCpuTime + disk spill via listener with
  * bus drains around each pass; single form → cold+warm solo passes
  * (warm adjudicates); comma-separated forms → two INTERLEAVED rounds
  * in one JVM (round2 adjudicates — the only cost comparison this
  * shared box makes trustworthy without canary arithmetic, the r13
  * ngram lesson: solo-JVM A/Bs disagreed by ±35% across JVMs at equal
  * canaries). Every line carries rows + bit_xor hash so a cost win
  * that changed answers can never pass silently.
  */
object WarmSoloAB {
  def run(tag: String, defaultOut: String,
      formLookup: Map[String, (SparkSession, DataFrame) => DataFrame],
      args: Array[String]): Unit = {
    val dir = args(0)
    val forms = args(1).split(',').toSeq
    val label = if (args.length > 2) args(2) else dir.split('/').last
    val outFile = if (args.length > 3) args(3) else defaultOut
    // host-speed canaries BEFORE the session
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
    // rounds (round2 adjudicates)
    val passes =
      if (forms.size == 1) Seq("cold", "warm").map(p => (forms.head, p))
      else Seq("round1", "round2").flatMap(p => forms.map(f => (f, p)))
    passes.foreach { case (form, pass) =>
      val fn = formLookup(form)
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
      println(s"[$tag] $line")
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
