package graft

import org.apache.spark.sql.functions._

/** Micro-decomposition of ann_bruteforce_topk (r15 — the headline gap
  * read 0.32-0.45 s vs the 0.24 baseline and the stage profile priced
  * its scoring stage at ~200 µs/row, 100× over a codegen'd dot): time,
  * in one warm session, (a) the scored join alone, (b) scored + house
  * TopKPerKey, (c) scored + row_number window — each as a count()/noop
  * so sink cost is constant. Prints per-form warm times after an
  * untimed warmup; the delta names the expensive piece.
  *
  * Usage: runMain graft.AnnBruteProfile [sfDir] [passes]
  */
object AnnBruteProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.vec.vec_dot

    def scored() = {
      val v = Tables.embeddings(spark, dir)
        .withColumn("nrm", sqrt(vec_dot(col("embedding"), col("embedding"))))
        .filter(col("nrm") > 0)
      val q = v.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm")).filter(col("q_id") < 8)
      v.join(broadcast(q), col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id").as("cand_id"),
          (vec_dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm"))).as("cosine"))
    }
    val forms: Seq[(String, () => Unit)] = Seq(
      "scan_only" -> (() => {
        Tables.embeddings(spark, dir)
          .withColumn("nrm", sqrt(vec_dot(col("embedding"), col("embedding"))))
          .filter(col("nrm") > 0).write.format("noop").mode("overwrite").save()
      }),
      "scored_join" -> (() => scored().write.format("noop").mode("overwrite").save()),
      "scored_topk" -> (() => graft.api.GraftApi
        .topKPerKey(scored(), "q_id", "cosine", "cand_id", k = 10)
        .select("q_id", "cand_id", "cosine")
        .write.format("noop").mode("overwrite").save()),
      "scored_window" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("q_id").orderBy(desc("cosine"), asc("cand_id"))
        scored().withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
          .drop("rn").write.format("noop").mode("overwrite").save()
      }),
    )
    forms.foreach { case (n, f) => f(); f() } // warm all
    (1 to passes).foreach { p =>
      forms.foreach { case (n, f) =>
        val t0 = System.nanoTime()
        f()
        println(f"[ann-brute pass $p] $n%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
