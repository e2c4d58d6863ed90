package graft

/** Build an amplified corpus without touching any sweep artifact:
  * `runMain graft.GenCorpus [skew|vary] <n>` — see ScaleSmoke.ensureCorpus.
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption match {
      case Some("skew") => "skew"
      case Some("vary") => "vary"
      case _            => ""
    }
    val rest = if (mode.nonEmpty) args.drop(1) else args
    val n = rest.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    // mirror ScaleSmoke's scan-split sizing so the corpus this tool
    // stamps has the SAME parquet file layout a sweep-built one gets —
    // a different input-split count changes output file sizes, and the
    // marker would freeze that layout difference into every later
    // sweep's scan parallelism (an invisible era break)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "33554432")
    val baseRows = Tables.load(spark, "/root/testdata/sf0.1", "lineitem").count()
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.api.GraftApi.partitionsFor(spark, baseRows * n).toString)
    val out = ScaleSmoke.ensureCorpus(spark, "/root/testdata/sf0.1", n, mode)
    println(s"[gencorpus] ready: $out")
    spark.stop()
  }
}
