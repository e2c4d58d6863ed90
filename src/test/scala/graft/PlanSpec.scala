package graft

import graft.operators._

/** Plan-shape assertions: the optimizer rewrites the reference implements
  * by hand (cartProdToJoin, filter hoisting/pushdown, index lookup as
  * broadcast join, partial aggregation) must actually appear in Catalyst's
  * physical plans — this is the §4 scale posture made testable.
  */
class PlanSpec extends SparkSpec {

  private def plan(op: Op): String =
    op.fn(spark, sfTiny).queryExecution.executedPlan.toString

  private def formatted(op: Op): String = {
    val df = op.fn(spark, sfTiny)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("cartProdToJoin: cross+filter is planned as an equi-join, not a cartesian product") {
    val p = plan(Relational.cartProdToJoin)
    assert(!p.contains("CartesianProduct"), p)
    // hash, not sort-merge: the probe (orders) side must not sort — the
    // skew sweep showed SMJ serializing a hot customer's sort while SHJ
    // streams it (AQE still skew-splits SHJ probes)
    assert(p.contains("ShuffledHashJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("filters are pushed into the parquet scan") {
    val f = formatted(Relational.filterWhere)
    assert(f.contains("PushedFilters: ["), f)
    assert(f.contains("IsNotNull(l_returnflag)") || f.contains("EqualTo(l_returnflag,R)"), f)
  }

  test("projection pruning: select_map reads only the referenced columns") {
    val f = formatted(Relational.selectMap)
    val readSchema = f.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.contains("l_orderkey"), readSchema)
    assert(!readSchema.contains("l_shipdate"), s"unpruned scan: $readSchema")
  }

  test("q5 uses broadcast joins for dimension tables") {
    val p = plan(Relational.q5LocalSupplier)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q5 shape: supplier cut broadcast pre-shuffle, five keyed exchanges") {
    // disable size-based broadcasts so only the EXPLICIT hints remain —
    // this is the 100 TB shape, where no fact side fits the threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Relational.q5LocalSupplier)
      // region→nation, nation⋈region→supplier, asiaSuppliers→lineitem
      assert("BroadcastHashJoin".r.findAllIn(p).size == 3, p)
      // orders + customer (custkey), both sides of the final orderkey
      // SMJ, and the 5-group aggregate — lineitem pays exactly one,
      // AFTER the broadcast cut
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 5, s"expected 5 keyed exchanges, got $exchanges:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q3 shape: customer cut broadcast into orders BEFORE the orderkey shuffle") {
    // disable size-based broadcasts so only the EXPLICIT hint remains —
    // the 100 TB shape, where no fact side fits the threshold
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Relational.q3ShippingPriority)
      // exactly one broadcast: customer(BUILDING) → orders, pre-shuffle
      assert("BroadcastHashJoin".r.findAllIn(p).size == 1, p)
      // exactly two keyed exchanges: lineitem and the REDUCED orders onto
      // orderkey; the aggregate reuses the orderkey partitioning (its group
      // keys contain the join key) and top-k is TakeOrderedAndProject
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 2, s"expected 2 keyed exchanges, got $exchanges:\n$p")
      assert(p.contains("TakeOrderedAndProject"), p)
      // the broadcast join must sit UNDER the orders-side exchange, i.e.
      // the customer cut happens before orders pays its shuffle
      val bhjIdx = p.indexOf("BroadcastHashJoin")
      val smjIdx = p.indexOf("SortMergeJoin")
      assert(smjIdx >= 0 && bhjIdx > smjIdx, s"broadcast not under the SMJ:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q18 aggregates lineitem before any join and takes top-k without a global sort") {
    val p = plan(Relational.q18LargeOrders)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
    // the HAVING aggregate (partial+final) exists independent of the joins
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q1 aggregates partially before the shuffle (map-side combine)") {
    val p = plan(Relational.q1PricingSummary)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("indexBy lookup is a broadcast hash lookup, no shuffle of the probe side") {
    val p = plan(Extended.indexByLookup)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti") {
    assert(plan(Relational.semiJoinExists).contains("LeftSemi"))
    assert(plan(Relational.antiJoinNotExists).contains("LeftAnti"))
  }

  test("bloom verify anti-join builds against a DEDUPED corpus side") {
    // existence-only build side: a hot template (90% of a skewed corpus)
    // must collapse in a map-side partial aggregate before the join
    // shuffle, not land as millions of identical rows in one partition
    val p = plan(Dedup.bloomNew)
    assert(p.contains("LeftAnti"), p)
    assert("HashAggregate\\(keys=\\[c_text".r.findFirstIn(p).isDefined, p)
  }

  test("view fusion: filter-map-filter chain stays in one codegen stage") {
    // codegen'd operators print as "*(stageId) Op"; one fused stage → only *(1)
    val p = plan(Extended.viewFusion)
    val stages = raw"\*\((\d+)\)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(stages == Set("1"), p)
  }

  test("top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(Relational.sortTopK)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("window rank carries WindowGroupLimit (rank pushdown bounds the per-key sort)") {
    // the rn <= 3 filter must reach the window as a group limit — partial
    // (pre-shuffle) pruning is what keeps a rank over a low-cardinality
    // key linear at 1000×: each map task ships ≤ k rows per key instead
    // of the whole partition (verified warm at 1000× in SURVEY §7)
    val p = plan(WindowOps.windowRank)
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("correlated subquery is decorrelated into an aggregate+join") {
    val p = plan(Extended.nestedUnnest)
    assert(!p.toLowerCase.contains("cartesian"), p)
    assert(p.contains("Join") || p.contains("HashJoin"), p)
  }

  test("as-of join plans as one window pass — no join operator at all") {
    val p = plan(Temporal.asofJoin)
    assert(!p.contains("Join"), p)
    assert(p.contains("Window"), p)
    // exactly one exchange: the user_id hash partitioning for the window
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$p")
  }

  test("range join is an equi-join on (bucket), never a nested loop") {
    val p = plan(Temporal.rangeJoin)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("chained filters merge into one predicate (MergeFilterTests)") {
    import org.apache.spark.sql.functions._
    val df = Tables.orders(spark, sfTiny)
      .filter(col("o_totalprice") > 1000)
      .filter(col("o_orderpriority") === "1-URGENT")
      .filter(col("o_custkey") > 10)
    val filters = "Filter".r.findAllIn(
      df.queryExecution.optimizedPlan.toString).size
    assert(filters == 1, df.queryExecution.optimizedPlan.toString)
  }

  test("union with a provably-empty side collapses (simplifications)") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfTiny)
    val df = orders.union(orders.filter(lit(false)))
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("Union"), p) // PropagateEmptyRelation removed it
  }

  test("commuted expressions normalize to the same plan (NormalizationTests)") {
    import org.apache.spark.sql.functions._
    val a = Tables.orders(spark, sfTiny)
      .filter(col("o_totalprice") * 2 > 100).select("o_orderkey")
    val b = Tables.orders(spark, sfTiny)
      .filter(lit(2) * col("o_totalprice") > 100).select("o_orderkey")
    assert(a.queryExecution.optimizedPlan.sameResult(b.queryExecution.optimizedPlan))
  }

  test("identity projections are removed (RemoveIdentityMapsTests)") {
    val base = Tables.orders(spark, sfTiny)
    val mapped = base.select(base.columns.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*).select("*")
    val p = mapped.queryExecution.optimizedPlan.toString
    assert(!p.contains("Project"), p)
  }

  test("let-bindings fuse into one codegen stage (inlining without duplication)") {
    // reference Inlining.scala/letTransformer: CollapseProject inlines
    // cheap intermediates and deliberately KEEPS a binding that is
    // referenced twice (disc_price feeds both the output and charge —
    // collapsing would duplicate the multiply, the same share-vs-inline
    // tradeoff the reference's letTransformer manages). Either way the
    // whole chain must stay one WholeStageCodegen span over the scan.
    val p = formatted(Extended.letBinding)
    val stages = "codegen id : (\\d+)".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(stages == Set("1"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("CNF conversion pushes the common conjunct of an OR through the join") {
    // reference BooleanOperators.scala/cnf: (p∧q)∨(p∧r) ⇒ p∧(q∨r) so p
    // reaches the orders-side scan — Catalyst's CNF predicate pushdown
    // does the same rewrite.
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfTiny)
    val customer = Tables.customer(spark, sfTiny)
    val joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .filter((col("o_totalprice") > 100000 && col("c_acctbal") > 5000) ||
              (col("o_totalprice") > 100000 && col("c_acctbal") < 0))
    val formatted = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("GreaterThan(o_totalprice,100000"), formatted)
  }

  test("every ANN top-k ranks through TopKPerKeyExec, not a window sort") {
    import graft.operators.Similarity._
    for (op <- Seq(annBruteForceTopK, annLshTopK, annRandomHyperplaneTopK, pqSearch)) {
      val p = plan(op)
      assert(p.contains("TopKPerKey"), s"${op.name} missing TopKPerKey:\n$p")
      assert(!p.contains("Window"), s"${op.name} still uses a Window sort:\n$p")
    }
  }

  test("IVF ANN: centroid assignment and probes broadcast the tiny sides") {
    val p = plan(graft.operators.Similarity.annIvfTopK)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TopKPerKey"), p)
  }

  test("q3: the BUILDING customer cut applies BELOW the lineitem⋈orders join") {
    // pre-shuffle reduction: the orders⋈customer broadcast join must be a
    // DESCENDANT of the lineitem⋈orders join, so the segment cut happens
    // before orders rides the orderkey exchange (r3 verdict's weak plan,
    // fixed in r4)
    val p = plan(graft.operators.Relational.q3ShippingPriority)
    val lines = p.linesIterator.toIndexedSeq
    val orderJoinIdx = lines.indexWhere(l =>
      l.contains("Join [l_orderkey") && l.contains("[o_orderkey"))
    val custJoinIdx = lines.indexWhere(l =>
      l.contains("Join [o_custkey") && l.contains("[c_custkey"))
    assert(orderJoinIdx >= 0 && custJoinIdx >= 0, p)
    // pre-order print: a descendant appears after its ancestor
    assert(custJoinIdx > orderJoinIdx, s"customer cut not below the orderkey join:\n$p")
    // and the customer edge never pays an exchange
    assert(!p.contains("hashpartitioning(o_custkey"), p)
  }

  test("keep-best election runs through TopKPerKeyExec with broadcast corpus edges") {
    val p = plan(graft.operators.Pipeline.keepBest)
    assert(p.contains("TopKPerKey"), p)
    assert(!p.contains("Window"), s"keep-best fell back to a window sort:\n$p")
    // the final corpus pass must only see broadcast joins — a sort-merge
    // join there would mean the corpus-sized side is being shuffled
    assert(!p.contains("SortMergeJoin"), s"corpus side shuffled:\n$p")
  }

  test("sequence packing is one partitioned window — no global sort, no single-partition window") {
    val df = graft.operators.Pipeline.packSequences.fn(spark, sfTiny)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Window"), p)
    // a missing PARTITION BY would plan a single-partition window whose
    // exchange is SinglePartition — the non-scalable shape
    assert(!p.contains("SinglePartition"), s"single-partition window:\n$p")
  }

  test("substring dedup: one posting exchange, pre-counted window, no join") {
    val p = plan(graft.operators.Dedup.substring)
    // r11-adjudicated shape (the r9 window form, warm-solo A/B winner at
    // uniform+skew 1000x under one heap — substring_ab_r11.jsonl): one
    // explicit repartition(g) feeds BOTH the (g, doc_id) pre-count and
    // the gram-partitioned window (no second posting exchange), the
    // window's sort input is the PRE-COUNTED pair stream (never raw
    // postings), and no join operator appears at all — the totals ride
    // the window, not a join-back.
    assert(p.contains("Window"), s"gram-partitioned window missing:\n$p")
    assert(!p.contains("Join"), s"the window form joins nothing:\n$p")
    assert(!p.contains("SinglePartition"), s"single-partition stage:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // exactly one g-keyed posting exchange: the explicit repartition
    // serves agg + window (doc rollup adds its own doc_id exchange)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected ≤2 hash exchanges (g, doc_id), got $exchanges:\n$p")
  }

  test("substring strip: broadcast dup probe, AQE-broadcast rebuild, no cache, no window") {
    // r14 fused shape: the dup-gram set is size-adaptively BROADCAST
    // into a map-side position probe, nothing is persisted (the copart
    // form's DISK_ONLY posting cache is retired —
    // substring_ab_r14.jsonl), and the rebuild's covered side is left
    // to AQE: dup-rate-proportional on an organic corpus → runtime
    // broadcast (pinned here on the FINAL plan), corpus-sized on the
    // pathological amplified corpus → sort-merge, measured cheaper
    // than forcing a cache+broadcast. Drive AQE to the final plan.
    // the covered-side broadcast is a RUNTIME size decision, so pin the
    // thresholds the decision reads (plan-time + AQE) to the documented
    // 10MB default — the assertion tests the PLAN SHAPE on a tiny organic
    // corpus, not whatever threshold the session happens to carry
    // getOption/unset: the AQE threshold is UNSET by default (it falls
    // back to the static one) — a get/set(null) restore pair throws
    val prevStatic = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    def restore(key: String, prev: Option[String]): Unit =
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760")
    val p =
      try {
        val df = graft.operators.Dedup.substringStrip.fn(spark, sfTiny)
        df.collect()
        df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      } finally {
        restore("spark.sql.autoBroadcastJoinThreshold", prevStatic)
        restore("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
      }
    CacheRegistry.drain()
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dup-gram probe and covered rebuild must both broadcast on an organic corpus:\n$p")
    assert(!p.contains("StorageLevel(disk, 1 replicas)"),
      s"corpus-sized DISK_ONLY posting cache is retired:\n$p")
    assert(!p.contains("Window"), s"no window may sort the posting stream:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("bloom new-doc dedup: might_contain gates both branches, verify join is anti") {
    val p = plan(graft.operators.Dedup.bloomNew)
    // proven-new filter + maybe-dup filter both carry the bloom probe
    assert("might_contain".r.findAllIn(p).size >= 2, p)
    assert(p.contains("LeftAnti"), s"exact verify must be an anti-join:\n$p")
  }

  test("bucketed bloom: probe stage joins filters by bucket, never broadcast; op unions once") {
    // r13 shape: the probe verdict is computed ONCE in a persisted
    // stage (explain hides it behind InMemoryRelation, so pin the probe
    // stage's own plan), then both branches filter on the `_maybe`
    // column and the probe-positive branch pays the one anti join
    val p = plan(graft.operators.Dedup.bloomNewBucketed)
    assert("LeftAnti".r.findAllIn(p).size == 1, p)
    assert("\\bUnion\\b".r.findAllIn(p).size == 1, p)
    assert(!p.contains("CartesianProduct"), p)
    // the probe stage: filters reach delta through a bucket-keyed
    // SHUFFLE join — a broadcast would re-ship every bucket's filter
    // bytes to every executor, the literal-map footprint this form
    // exists to avoid
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val probed = graft.operators.Dedup.bloomBucketedProbedPlan(
      graft.operators.Dedup.withTextBkt(
        docs.filter(col("doc_id") % 10 =!= 0), 8),
      graft.operators.Dedup.withTextBkt(
        docs.filter(col("doc_id") % 10 === 0), 8),
      20000L, 8)
    val pp = probed.queryExecution.executedPlan.toString
    assert(pp.contains("might_contain_keyed"), pp.take(4000))
    assert(pp.contains("ShuffledHashJoin"), pp.take(4000))
    assert(!pp.contains("BroadcastHashJoin"), pp.take(4000))
  }

  test("subquery sharing: naive self-join reuses the exchange; registered op joins nothing") {
    // the reference's SubquerySharing feature — one filtered subquery,
    // two consumers — demonstrated on the naive shape: under a shuffle
    // join (no broadcast short-circuit) Catalyst must plan the second
    // consumer as a ReusedExchange, not a second scan+shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val naive =
      try {
        val df = graft.operators.Extended.subquerySharingNaive(spark, sfTiny)
        df.collect() // AQE materializes stage reuse at runtime only
        df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(naive.contains("ReusedExchange"),
      s"shared subquery shuffled twice without reuse:\n$naive")
    // the registered (skew-safe) form: same counts, no pair-materializing
    // self-join (the r6 skew sweep caught the naive shape at ~1e11
    // intermediate pairs under a hot customer) and no per-customer
    // window either — every Window partitions on (cust, orderkey block)
    // or runs over block summaries, so a hot customer ranks in parallel
    val reg = plan(Extended.subquerySharing)
    assert(!reg.contains("SortMergeJoin") || !reg.contains("o_orderkey"),
      s"plan re-joined per-row data:\n$reg")
    // the per-ROW window must carry the block column in its partition
    // spec; the per-key summary window (partitionBy custkey alone) runs
    // on #(cust, block)-sized input, which plans AFTER the first agg
    assert(reg.contains("Window"), reg)
    assert("_b#\\d+L?\\]".r.findFirstIn(reg).isDefined ||
      reg.contains("_b#"), s"block column missing from window spec:\n$reg")
  }

  test("subquery sharing: window form counts exactly the naive self-join pairs") {
    // the registered count−row_number rewrite must stay pair-exact: sum
    // n_pairs per a-priority from the naive join ≡ the registered output
    import org.apache.spark.sql.functions._
    val naive = graft.operators.Extended.subquerySharingNaive(spark, sfTiny)
      .groupBy("o_orderpriority").agg(sum("n_pairs").as("n_pairs"))
    val reg = graft.operators.Extended.subquerySharing.fn(spark, sfTiny)
      .select(col("o_orderpriority"), col("n_pairs").cast("long"))
    assert(reg.except(naive).isEmpty && naive.except(reg).isEmpty)
    assert(reg.count() > 0)
  }

  test("text_idf_rarity: corpus total folds in plan-side — no driver scalar, no cache") {
    import org.apache.spark.sql.functions._
    CacheRegistry.drain()
    val df = graft.operators.TextAnalysis.idfRarity.fn(spark, sfTiny)
    // the only tracked cache is adaptiveBroadcast's vocab-sized guard —
    // the r5 exploded-token-stream cache (corpus × tokens rows, carries
    // doc_id) is gone, and the corpus total arrives as a broadcast
    assert(CacheRegistry.liveCount == 1, "expected only the vocab guard")
    val p = df.queryExecution.executedPlan.toString
    assert(!"InMemoryTableScan \\[[^\\]]*doc_id".r.findFirstIn(p).isDefined,
      s"exploded token stream is cached:\n$p")
    assert(p.contains("BroadcastExchange"), p)
    assert(df.filter(col("rarity") <= 0).count() == 0)
    CacheRegistry.drain()
  }

  test("multi-block simhash pairs keep the bounded posting-list shape") {
    val p = plan(graft.operators.Dedup.simhashBlocks)
    // same skeleton as dedup_simhash_pairs: band groupBy with the bounded
    // collect (partial+final), in-group expansion, a tiny distinct — and
    // NO self-join of the corpus, no window sort
    assert(p.contains("collect_set_bounded"), p)
    assert(!p.contains("Join"), s"banded candidates must not self-join:\n$p")
    assert(!p.contains("Window"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 2, s"expected band + distinct exchanges, got $exchanges:\n$p")
  }
}
