package graft

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
  * (HashCoinsSpec pins it). Also serves the incremental forms
  * (inc_r12 / inc_sliver — the r13 verify-sliver A/B).
  *
  * Usage: runMain graft.MinhashAB <corpusDir> <form[,form...]> [label] [outFile]
  * Protocol lives in ONE place — [[WarmSoloAB]] (ADVICE r13) — this is
  * a thin wrapper binding the form lookup and the default JSONL.
  */
object MinhashAB {
  def main(args: Array[String]): Unit =
    WarmSoloAB.run("minhash-ab", "minhash_ab_r14.jsonl",
      (graft.operators.Dedup.minhashForms ++
        graft.operators.Dedup.incrementalForms ++
        graft.operators.Dedup.paragraphForms).toMap, args)
}
