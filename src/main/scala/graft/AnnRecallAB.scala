package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFADC recall/cost sweep — the adjudication harness behind the r15
  * serving-parameter re-tune (VERDICT r14 #4: ADC recall@5 0.275 and
  * refine 0.55 are not production numbers; FAISS deployments serve PQ at
  * 0.8–0.95 by tuning nprobe / shortlist / subquantizer geometry against
  * a measured recall audit).
  *
  * For each (nprobe, numSubs, codebookSize, trainIters) config the
  * inline IVFADC build+search runs at cells=16 (the frozen-seed
  * discipline — seeds are the `codebookSize` lowest ids, so geometry
  * changes never touch seeding), and each shortlist multiplier refines
  * the same config's shortlist. Recall@5 is measured against the exact
  * brute-force cosine top-5 on the same 8 queries the registered ops
  * serve. Output: one JSON line per config to the artifact path +
  * stdout. The optional third arg filters the grid to configs with
  * trainIters ≥ the given value — round 3 (the Lloyd-depth sweep,
  * ann_recall_ab_r15b.jsonl) ran with `2` so the ten already-
  * adjudicated iters=1 rows were not re-executed.
  *
  * Usage: runMain graft.AnnRecallAB [sfDir] [outPath] [minTrainIters]
  */
object AnnRecallAB {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = args.lift(1).getOrElse("ann_recall_ab_r15.jsonl")
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, dir)
    val queries = emb.filter(col("vec_id") < 8)

    // exact ground truth: THE ann_recall_audit exact arm (shared helper
    // — the tuner must measure against the same truth the audit gates)
    val exact = graft.operators.Similarity.exactCosineTopK(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQ = exact.map(_._1).size
    println(s"[ann-recall-ab] exact top-5 over $nQ queries, dir=$dir")

    def recallOf(df: DataFrame): Double = {
      val hits = df.select("q_id", "cand_id").collect()
        .count(r => exact.contains((r.getLong(0), r.getLong(1))))
      hits.toDouble / (nQ * 5)
    }

    // (nprobe, numSubs, codebookSize, trainIters) grid — round 1 swept
    // cb=16 over nprobe × m (ann_recall_ab_r15.jsonl rows 1-6: refine
    // plateaus at 0.825 with x12, ADC stuck at 0.275, m=8 WORSE);
    // round 2 swept codebook size at ONE Lloyd pass (32/64 worse — the
    // extra codewords spread too thin); round 3 tests the untested
    // INTERACTION: more Lloyd iterations may be exactly what larger
    // codebooks need (round-2's "too thin" is a training-depth symptom,
    // not a capacity verdict).
    val grid: Seq[(Int, Int, Int, Int)] = Seq(
      (4, 4, 16, 1), (6, 4, 16, 1), (8, 4, 16, 1), (4, 8, 16, 1),
      (6, 8, 16, 1), (8, 8, 16, 1), (4, 4, 64, 1), (6, 4, 64, 1),
      (8, 4, 64, 1), (4, 4, 32, 1),
      (4, 4, 16, 3), (4, 4, 16, 6), (4, 4, 32, 3), (4, 4, 32, 6),
      (4, 4, 64, 3), (4, 4, 64, 6), (4, 8, 64, 6))
    val only = args.lift(2).map(_.toInt) // min trainIters filter (round 3: 2)
    val sb = new StringBuilder
    for ((nprobe, numSubs, cb, iters) <- grid
         if only.forall(iters >= _)) {
      val subDim = 64 / numSubs
      val t0 = System.nanoTime()
      val adc = graft.api.GraftApi.ivfPqSearchADC(emb, queries,
        "vec_id", "embedding", cells = 16, nprobe = nprobe,
        numSubs = numSubs, subDim = subDim, codebookSize = cb, k = 5,
        trainIters = iters)
      val adcRecall = recallOf(adc)
      val adcSec = (System.nanoTime() - t0) / 1e9
      val refines = Seq(4, 8, 12).map { mult =>
        val t1 = System.nanoTime()
        val short = graft.api.GraftApi.ivfPqSearchADC(emb, queries,
          "vec_id", "embedding", cells = 16, nprobe = nprobe,
          numSubs = numSubs, subDim = subDim, codebookSize = cb,
          k = mult * 5, trainIters = iters)
        val ref = graft.api.GraftApi.refineTopK(emb, short, queries,
          "vec_id", "embedding", k = 5)
        val r = recallOf(ref)
        (mult, r, (System.nanoTime() - t1) / 1e9)
      }
      CacheRegistry.drain()
      def f3(x: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
      val refJson = refines.map { case (m, r, s) =>
        s""""refine_x$m": {"recall": ${f3(r)}, "sec": ${f3(s)}}""" }.mkString(", ")
      val line = s"""{"nprobe": $nprobe, "num_subs": $numSubs, "sub_dim": $subDim, "codebook": $cb, "train_iters": $iters, "adc_recall": ${f3(adcRecall)}, "adc_sec": ${f3(adcSec)}, $refJson}"""
      println(s"[ann-recall-ab] $line")
      sb.append(line).append('\n')
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      sb.toString)
    spark.stop()
  }
}
