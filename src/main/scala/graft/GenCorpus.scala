package graft

/** Build an amplified corpus without touching any sweep artifact:
  * `runMain graft.GenCorpus [skew] <n>` — see ScaleSmoke.ensureCorpus.
  */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val skew = args.headOption.contains("skew")
    val rest = if (skew) args.drop(1) else args
    val n = rest.headOption.map(_.toInt).getOrElse(10)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val out = ScaleSmoke.ensureCorpus(spark, "/root/testdata/sf0.1", n, skew)
    println(s"[gencorpus] ready: $out")
    spark.stop()
  }
}
