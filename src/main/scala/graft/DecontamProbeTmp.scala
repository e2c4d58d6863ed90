package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
object DecontamProbeTmp {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scale_100"
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics; if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    spark.conf.set("spark.sql.files.maxPartitionBytes", "33554432")
    val docs = Tables.documents(spark, dir)
    def shWith(builder: String) = docs
      .withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 5)
      .withColumn("shingles", array_sort(array_distinct(expr(builder))))
      .select(col("doc_id"), col("shingles"))
    val oldB = "transform(sequence(1, size(words)-4), i -> concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2), element_at(words,i+3), element_at(words,i+4)))"
    val newB = "transform(sequence(1, size(words)-4), i -> array_join(slice(words, i, 5), ' '))"
    // two rounds to expose warm-up asymmetry
    for (round <- 1 to 2; (name, b) <- Seq("old_builder" -> oldB, "new_builder" -> newB)) {
      val sh = shWith(b)
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      cpuNs.set(0L)
      val t0 = System.nanoTime()
      val df = operators.Pipeline.decontaminate(
        sh.filter(col("doc_id") % 97 =!= 0), sh.filter(col("doc_id") % 97 === 0), 0.5)
      val n = df.select(xxhash64(struct(df.columns.map(col): _*)).as("_h"))
        .agg(count(lit(1)), expr("coalesce(bit_xor(_h), 0L)")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.Shim.drainListenerBus(spark.sparkContext)
      println(f"[dprobe] r$round $name%-12s $sec%7.2f s  cpu ${cpuNs.get()/1e9}%8.1f s  rows ${n.getLong(0)}%9d hash ${n.getLong(1)}%d")
      CacheRegistry.drain(blocking = true); spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
    }
    spark.stop()
  }
}
