package graft

/** Warm-solo A/B harness for the dedup_ngram_jaccard SAMPLING COIN
  * (r13 adjudication — VERDICT r12 "Next round" #1: bench_full wall
  * went 0.68 → 2.33 s while shuffle mass halved; the md5-per-gram
  * sample predicate was the only code-changed suspect, and the r13
  * verdict exonerated it with ngram_ab_r13.jsonl).
  *
  * Forms (graft.operators.Dedup.ngramForms): ngram_md5_hex (the r12
  * substring(md5,1,1)-isin predicate), ngram_md5_expr (raw-digest
  * [[graft.functions.Md5Nibble0]] coin — same semantics, no hex
  * string), ngram_unsampled (no coin — cost reference; its hash
  * legitimately differs since sampling changes candidate recall).
  *
  * Usage: runMain graft.NgramAB <corpusDir> <form[,form...]> [label] [outFile]
  * Protocol lives in ONE place — [[WarmSoloAB]] (ADVICE r13) — this is
  * a thin wrapper binding the form lookup and the default JSONL.
  */
object NgramAB {
  def main(args: Array[String]): Unit =
    WarmSoloAB.run("ngram-ab", "ngram_ab_r13.jsonl",
      graft.operators.Dedup.ngramForms.toMap, args)
}
