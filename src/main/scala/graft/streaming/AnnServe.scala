package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** The streaming face of the ANN serving path — arriving queries against
  * a PERSISTED PQ index (the IVM analog of ann_pq_search, completing the
  * streaming story the dedup family has with nearDupCandidates/Verified).
  *
  * Shape per micro-batch, all stream-static and stateless until the rank:
  *   1. each arriving query row builds its full ADC lookup table in ONE
  *      projection against a single packed broadcast row of the static
  *      codebooks — no stream-side aggregation (that would need
  *      watermarked state for what is a per-row pure function);
  *   2. stream-static join against the persisted codes table scores every
  *      candidate with the same 4-pick ADC fold as the batch op;
  *   3. per-query top-k as a bounded heap inside flatMapGroupsWithState —
  *      the TopKPerKeyExec partial phase expressed in the streaming
  *      runtime. A query's candidates are generated from its own arrival
  *      row, so they land in the same trigger and the group emits its
  *      final top-k immediately; no state survives the batch.
  *
  * At scale the codes table is the bucketed/persisted index the batch
  * pipeline maintains; the stream side is micro-batch-sized, so the join
  * broadcasts the queries' LUTs — the corpus never shuffles, exactly as
  * in the batch plan. StreamingSpec proves stream ≡ batch pqSearchADC.
  */
object AnnServe {

  case class AdcScore(q_id: Long, cand_id: Long, adc_dist: Double)
  case class CosScore(q_id: Long, cand_id: Long, cosine: Double)

  /** ADC top-k for a STREAM of (id, embedding) queries against static
    * `codes` (from GraftApi.pqEncode) and `codebooks` (from
    * GraftApi.pqCodebooks). Returns a streaming Dataset of the same
    * (q_id, cand_id, adc_dist) rows batch pqSearchADC emits.
    */
  def pqServeStream(queries: DataFrame, codes: DataFrame, codebooks: DataFrame,
      idCol: String, embCol: String, numSubs: Int, subDim: Int,
      codebookSize: Int = 16, k: Int = 5): Dataset[AdcScore] = {
    import queries.sparkSession.implicits._
    // one static row: every (part, cent_id, centroid) — numSubs·codebookSize
    // entries, broadcastable by construction
    val packed = broadcast(codebooks.groupBy().agg(
      collect_list(struct(col("part"), col("cent_id"), col("c_emb"))).as("cbs")))
    // per-query LUT in one codegen'd projection (keys part·K + cent_id,
    // exact subvector→centroid distances — identical to the batch LUT)
    val lut = queries
      .select(col(idCol).cast("long").as("q_id"),
        expr(s"transform($embCol, x -> cast(x as double))").as("qd"))
      .join(packed)
      .select(col("q_id"), expr(
        s"map_from_entries(transform(cbs, c -> struct(" +
          s"int(c.part * $codebookSize + c.cent_id), " +
          s"vec_distsq(slice(qd, c.part * $subDim + 1, $subDim), c.c_emb))))")
        .as("lut"))
    val adc = (0 until numSubs).map(s =>
        expr(s"element_at(lut, int(${s * codebookSize} + element_at(codes, ${s + 1})))"))
      .reduce(_ + _)
    // stream-static join: the micro-batch of LUTs drives one codes scan.
    // The broadcast hint pins the STREAM side as the build side — a
    // micro-batch of queries is small by construction, while the codes
    // table is the corpus; without the hint a stats-blind planner could
    // pick the codes side at exactly the scale where that is fatal.
    val scored = broadcast(lut).join(codes, col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).cast("long").as("cand_id"),
        adc.as("adc_dist"))
    // bounded-heap rank, same (dist asc, cand_id asc) order as the batch
    // topKPerKey(neg_dist desc, cand_id asc)
    scored.as[AdcScore].groupByKey(_.q_id)
      .flatMapGroupsWithState[Long, AdcScore](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, state) =>
          val heap = scala.collection.mutable.PriorityQueue
            .empty[AdcScore](Ordering.by(s => (s.adc_dist, s.cand_id)))
          rows.foreach { r =>
            heap += r
            if (heap.size > k) heap.dequeue() // drop current worst
          }
          // deliberately no state.update: a query's candidates all land in
          // its own trigger, so nothing must survive the batch
          heap.toList.sortBy(s => (s.adc_dist, s.cand_id)).iterator
      }
  }

  /** IVF top-k for a STREAM of (id, embedding) queries against a
    * persisted index from Similarity.ivfIndex — `centroids`
    * (cent_id, c_emb, c_nrm; `cells` rows) and `lists`
    * (cent_id, vec_id, embedding, nrm; the inverted lists, bucketed by
    * cent_id at scale). Unlike the PQ face (one full codes scan per
    * batch), the probe join here is KEYED on cent_id: each micro-batch
    * touches only its queries' nprobe cells.
    *
    * The per-query top-nprobe cell pick runs as one array_sort over a
    * packed centroid broadcast (window functions don't exist on streams;
    * cells ≤ a few hundred makes the per-row sort trivial), ordered by
    * (−cosine, cent_id) — exactly the batch probe order. Emits the same
    * (q_id, cand_id, cosine) rows batch ivfSearch produces.
    */
  def ivfServeStream(queries: DataFrame, centroids: DataFrame, lists: DataFrame,
      idCol: String, embCol: String, nprobe: Int = 2, k: Int = 5): Dataset[CosScore] = {
    import queries.sparkSession.implicits._
    val packed = broadcast(centroids.groupBy().agg(
      collect_list(struct(col("cent_id"), col("c_emb"), col("c_nrm"))).as("cents")))
    val probes = queries
      .select(col(idCol).cast("long").as("q_id"),
        expr(s"transform($embCol, x -> cast(x as double))").as("qd"))
      .withColumn("q_nrm", expr("sqrt(vec_dot(qd, qd))"))
      .join(packed)
      .select(col("q_id"), col("qd"), col("q_nrm"), explode(expr(
        s"slice(array_sort(transform(cents, c -> struct(" +
          s"-(vec_dot(qd, c.c_emb) / (q_nrm * c.c_nrm)) as cost," +
          s" c.cent_id as cent_id))), 1, $nprobe)")).as("p"))
      .select(col("q_id"), col("qd"), col("q_nrm"), col("p.cent_id").as("p_cent"))
    // probe set = micro-batch × nprobe — broadcast-sized by construction;
    // the hint keeps the corpus lists as the streamed probe target (over
    // a bucketBy(cent_id) layout the un-hinted SMJ path is equally
    // exchange-free on the lists side — see BucketingSpec)
    val scored = broadcast(probes)
      .join(lists, col("cent_id") === col("p_cent") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("cand_id"),
        (expr("vec_dot(qd, embedding)") / (col("q_nrm") * col("nrm"))).as("cosine"))
    scored.as[CosScore].groupByKey(_.q_id)
      .flatMapGroupsWithState[Long, CosScore](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, _) =>
          // keep the k LARGEST cosines, ties to the smaller cand_id —
          // the batch topKPerKey(cosine desc, cand_id asc) order
          val heap = scala.collection.mutable.PriorityQueue
            .empty[CosScore](Ordering.by(s => (-s.cosine, s.cand_id)))
          rows.foreach { r =>
            heap += r
            if (heap.size > k) heap.dequeue()
          }
          heap.toList.sortBy(s => (-s.cosine, s.cand_id)).iterator
      }
  }

  /** IVFADC top-k for a STREAM of (id, embedding) queries against the
    * persisted IVF+PQ index (Similarity's persisted layout: `centroids`
    * (cent_id, c_emb, c_nrm), `codebooks` (part, cent_id, c_emb), and
    * `codes` (id, codes, cent_id) bucketed by cell) — the serving face
    * of the canonical production ANN index, composing the two existing
    * faces: the cell routing of [[ivfServeStream]] (per-row array_sort
    * over a packed centroid broadcast) and the ADC LUT of
    * [[pqServeStream]] (one projection against the packed codebooks).
    * The stream-static codes join is KEYED on cent_id, so each
    * micro-batch reads only its queries' probed cells — scan mass ≈
    * probed cells, never the corpus. Emits the same (q_id, cand_id,
    * adc_dist) rows the batch ivfPqSearchADCFromIndex produces.
    */
  def ivfPqServeStream(queries: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, codes: DataFrame, idCol: String, embCol: String,
      nprobe: Int = 4, numSubs: Int = 4, subDim: Int = 16,
      codebookSize: Int = 16, k: Int = 5): Dataset[AdcScore] = {
    import queries.sparkSession.implicits._
    val packedCents = broadcast(centroids.groupBy().agg(
      collect_list(struct(col("cent_id"), col("c_emb"), col("c_nrm"))).as("cents")))
    val packedCbs = broadcast(codebooks.groupBy().agg(
      collect_list(struct(col("part"), col("cent_id"), col("c_emb"))).as("cbs")))
    // per query, in one projection pass: the full ADC LUT (computed once,
    // BEFORE the probe explode duplicates the row nprobe×) and the
    // top-nprobe cells in the batch (−cosine, cent_id) order
    val lutProbes = queries
      .select(col(idCol).cast("long").as("q_id"),
        expr(s"transform($embCol, x -> cast(x as double))").as("qd"))
      .withColumn("q_nrm", expr("sqrt(vec_dot(qd, qd))"))
      .join(packedCents).join(packedCbs)
      .select(col("q_id"),
        expr(s"map_from_entries(transform(cbs, c -> struct(" +
          s"int(c.part * $codebookSize + c.cent_id), " +
          s"vec_distsq(slice(qd, c.part * $subDim + 1, $subDim), c.c_emb))))")
          .as("lut"),
        explode(expr(
          s"slice(array_sort(transform(cents, c -> struct(" +
            s"-(vec_dot(qd, c.c_emb) / (q_nrm * c.c_nrm)) as cost," +
            s" c.cent_id as cent_id))), 1, $nprobe)")).as("p"))
      .select(col("q_id"), col("lut"), col("p.cent_id").as("p_cent"))
    val adc = (0 until numSubs).map(s =>
        expr(s"element_at(lut, int(${s * codebookSize} + element_at(codes, ${s + 1})))"))
      .reduce(_ + _)
    val scored = broadcast(lutProbes)
      .join(codes, col("cent_id") === col("p_cent") && col(idCol) =!= col("q_id"))
      .select(col("q_id"), col(idCol).cast("long").as("cand_id"),
        adc.as("adc_dist"))
    scored.as[AdcScore].groupByKey(_.q_id)
      .flatMapGroupsWithState[Long, AdcScore](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, rows, _) =>
          val heap = scala.collection.mutable.PriorityQueue
            .empty[AdcScore](Ordering.by(s => (s.adc_dist, s.cand_id)))
          rows.foreach { r =>
            heap += r
            if (heap.size > k) heap.dequeue()
          }
          heap.toList.sortBy(s => (s.adc_dist, s.cand_id)).iterator
      }
  }

  /** [[ivfServeStream]] with nprobe derived from the persisted index's
    * own cell occupancy — the serving face of
    * graft.operators.Similarity.ivfSearchAuto, same bound: smallest
    * probe count expected to surface k·oversample candidates given the
    * size-biased mean occupancy, clamped to [1, cells]. The stats read
    * is one `cells`-row aggregate off the lists — index metadata, the
    * same class as loading the centroid table — computed ONCE at stream
    * definition, never per micro-batch. Re-derive on index refresh (a
    * stream restart), which is when occupancy can change.
    */
  def ivfServeStreamAuto(queries: DataFrame, centroids: DataFrame,
      lists: DataFrame, idCol: String, embCol: String, k: Int = 5,
      oversample: Int = 8): Dataset[CosScore] = {
    val occ = lists.groupBy("cent_id").count()
      .agg(sum("count").as("s"), sum(col("count") * col("count")).as("s2"))
      .head()
    // an empty index yields NULL sums — fail fast with the contract
    // instead of an opaque NPE (the bloomNewDocs empty-corpus treatment)
    require(!occ.isNullAt(0),
      "ivfServeStreamAuto: lists index is empty — build the IVF index " +
        "before defining the serving stream (occupancy-derived nprobe " +
        "needs at least one indexed vector)")
    val cells = centroids.count()
    val np = math.min(cells, math.max(1L, math.ceil(
      (k.toLong * oversample).toDouble * occ.getLong(0) / occ.getLong(1))
      .toLong)).toInt
    ivfServeStream(queries, centroids, lists, idCol, embCol, np, k)
  }
}
