package graft

/** Warm-solo / interleaved A/B harness for the pipeline_curate stage
  * decomposition (r14 — the headline's largest entry): forms are
  * [[graft.operators.Pipeline.curateForms]] (full plan / pair
  * generator / dropped sliver / quality scan). Thin wrapper over the
  * shared [[WarmSoloAB]] protocol, like MinhashAB / NgramAB.
  *
  * Usage: runMain graft.PipelineAB <corpusDir> <form[,form...]> [label] [outFile]
  */
object PipelineAB {
  def main(args: Array[String]): Unit =
    WarmSoloAB.run("pipeline-ab", "pipeline_ab_r14.jsonl",
      graft.operators.Pipeline.curateForms.toMap, args)
}
