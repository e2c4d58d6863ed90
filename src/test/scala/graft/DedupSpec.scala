package graft

import graft.operators.{Dedup, Similarity, TextAnalysis, Multimodal}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Recall/behavior specs for the LLM-pipeline operators on synthetic
  * near-duplicates, driven through the ops' public (spark, dir) signature
  * by writing documents/embeddings parquet into a temp dir.
  */
class DedupSpec extends SparkSpec {

  // long enough that a one-token edit keeps 5-shingle Jaccard above the
  // 0.2 near-dup threshold (18 unaffected shingles of 23)
  private val base = "spark makes distributed query processing fast and scalable for large data " +
      "by pushing filters into columnar scans and broadcasting small dimension tables " +
      "so that shuffles stay proportional to the aggregated output"

  private lazy val docsDir: String = {
    import spark.implicits._
    val nearDup = base.replace("fast", "quick") // one token differs
    val other = "completely different content about cooking pasta with tomato sauce tonight " +
      "garnished with fresh basil leaves and parmesan shavings served beside garlic bread " +
      "and a light salad dressed in olive oil"
    val docs = Seq(
      (0L, base, "en", "s0", base.length.toLong),
      (1L, nearDup, "en", "s1", nearDup.length.toLong),
      (2L, other, "en", "s2", other.length.toLong),
      (3L, base, "en", "s3", base.length.toLong), // exact dup of 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir()
    writeTable(dir, "documents", docs)
    dir
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exact.fn(spark, docsDir).collect()
    assert(out.length == 3) // 4 docs, 2 identical
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keeper") == 0L)
  }

  test("ngram jaccard finds the near-dup pair and the exact-dup pair") {
    val pairs = Dedup.ngramJaccard.fn(spark, docsDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs.contains((0L, 3L)), "exact dup pair")
    assert(pairs.contains((0L, 1L)), "near dup pair")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unrelated doc must not pair")
  }

  test("minhash+lsh recovers the same near-dup pairs") {
    val got = Dedup.minhashLsh.fn(spark, docsDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(got.contains((0L, 3L)))
    assert(got.contains((0L, 1L)))
  }

  test("multiplicity contract: exact-first composition recovers near-dup structure past the caps") {
    import spark.implicits._
    // 80 copies of every doc — past the 64-cap, so capped pair-listing
    // over the raw corpus is out of contract (see PLANS.md, near-dup
    // family). The prescribed composition: dedupExact collapses the
    // multiplicity, near-dup runs on the keepers, and the content-level
    // pair structure is fully recovered.
    val raw = Tables.documents(spark, docsDir)
    val multiplied = (0 until 80).map(i =>
        raw.withColumn("doc_id", col("doc_id") + lit(i * 1000L)))
      .reduce(_.unionByName(_))
    val keepers = graft.api.GraftApi.dedupExact(multiplied, "doc_id", "text")
      .select(col("keeper"))
    val survivors = multiplied.join(keepers, col("doc_id") === col("keeper"))
      .select("doc_id", "text")
    val got = graft.api.GraftApi.nearDupPairs(survivors, "doc_id", "text")
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    CacheRegistry.drain()
    // keepers are the min-id per content: 0 (also covering 3's content), 1, 2
    assert(got == Set((0L, 1L)), got)
  }

  test("incremental dedup of a delta shard ≡ full recompute restricted to the delta") {
    // delta = docs {1, 3} arriving against corpus {0, 2}: both the
    // delta-vs-corpus pairs (0,1),(0,3) and nothing delta-vs-delta at the
    // 0.2 threshold — compare against the full recompute ground truth
    val docs = Tables.documents(spark, docsDir)
    val corpusSk = Dedup.sketchTable(docs.filter(col("doc_id") % 2 === 0))
    val deltaSk = Dedup.sketchTable(docs.filter(col("doc_id") % 2 === 1))
    val incr = Dedup.incrementalPairs(corpusSk, deltaSk, 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val full = Dedup.minhashPairs(docs, 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard")))
      .filter(p => p._1 % 2 == 1 || p._2 % 2 == 1).toSet
    assert(incr == full, s"incremental $incr != full-restricted $full")
    assert(incr.exists(p => p._1 == 0L && p._2 == 1L), "must find delta-vs-corpus near dup")
    CacheRegistry.drain()
  }

  test("incremental r12/sliver plan forms are result-identical at sf0.001") {
    // the r13 verify-sliver A/B forms (minhash_ab_r13.jsonl adjudicated
    // cost; this pins the equality durably on real near-dup structure)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val forms = Dedup.incrementalForms.toMap
    def pairs(name: String) = {
      val got = forms(name)(spark, docs)
        .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          math.round(r.getAs[Double]("jaccard") * 1e9))).toSet
      CacheRegistry.drain()
      got
    }
    val a = pairs("inc_r12")
    val b = pairs("inc_sliver")
    assert(a == b, s"missing=${a -- b} extra=${b -- a}")
    assert(a.nonEmpty)
  }

  test("substring dedup counts duplicated 8-word spans, incl. within-doc repeats") {
    import spark.implicits._
    // A and B share exactly their first 8-word span; C repeats one
    // 8-word phrase twice internally (9 spans, the repeated phrase at
    // positions 1 and 9); D is too short to have any span
    val docs = Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 b9 b10"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c1 c2 c3 c4 c5 c6 c7 c8"),
      (3L, "d1 d2 d3 d4 d5 d6 d7"),
    ).map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir(); writeTable(dir, "documents", docs)
    val got = Dedup.substring.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got.keySet == Set(0L, 1L, 2L), got) // D has no 8-word span
    assert(got(0L) == ((3L, 1L, 1.0 / 3)), got(0L))
    assert(got(1L) == ((3L, 1L, 1.0 / 3)), got(1L))
    assert(got(2L) == ((9L, 2L, 2.0 / 9)), got(2L))
  }

  test("the substring plan forms (A/B candidates incl. fused) are result-identical") {
    // r11 adjudication support: the registered op is the warm-solo A/B
    // winner; this pins that the candidates never diverged on RESULTS, so
    // the A/B measured plans, not semantics.
    val docs = Tables.documents(spark, sfTiny)
    val all = Dedup.substringScoredForms.map { case (name, fn) =>
      name -> fn(spark, docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          math.rint(r.getDouble(3) * 1e12)))
        .sortBy(_._1).toSeq
    }
    all.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      assert(a == b, s"$na vs $nb diverged")
    }
    assert(all.head._2.nonEmpty)
    CacheRegistry.drain()
  }

  test("the substring STRIP plan forms (A/B candidates) are result-identical") {
    val docs = Tables.documents(spark, sfTiny)
    val all = Dedup.substringStripForms.map { case (name, fn) =>
      name -> fn(spark, docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1).toSeq
    }
    all.sliding(2).foreach { case Seq((na, a), (nb, b)) =>
      assert(a == b, s"$na vs $nb diverged")
    }
    assert(all.head._2.nonEmpty)
    CacheRegistry.drain()
  }

  test("incremental substring score ≡ full recompute restricted to the delta") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // corpus doc 0 shares its leading 8-gram with delta doc 1
    // (corpus+delta dup); delta docs 1 and 3 share the q-gram the corpus
    // has never seen (delta-vs-delta dup); doc 3 also repeats it
    // WITHIN itself (n_local = 2); every doc carries unique spans too
    val corpus = mk(Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 x9 x10"),
      (2L, "u1 u2 u3 u4 u5 u6 u7 u8")))
    val delta = mk(Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 q1 q2 q3 q4 q5 q6 q7 q8"),
      (3L, "q1 q2 q3 q4 q5 q6 q7 q8 q1 q2 q3 q4 q5 q6 q7 q8")))
    def scores(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        math.rint(r.getDouble(3) * 1e12)))
      .sortBy(_._1).toSeq
    val full = scores(Dedup.substringWindow(spark, corpus.unionByName(delta))
      .filter(col("doc_id") % 2 === 1))
    val incr = scores(Dedup.substringIncrementalScore(
      Dedup.substringCountTable(corpus), delta, parts = 8))
    assert(incr == full, s"incremental $incr != full-restricted $full")
    // the deliberate cases really occur: doc 1 has dup spans from BOTH
    // sides (corpus w-gram + delta q-gram) yet not all spans dup; doc
    // 3's within-doc repeat makes every one of its spans duplicated
    val d1 = incr.find(_._1 == 1L).get
    assert(d1._3 >= 2 && d1._3 < d1._2, d1)
    // doc 3: ONLY the two positions of the repeated q-gram are dup —
    // its 7 bridging grams (q2..q1 etc.) occur once each in the corpus
    val d3 = incr.find(_._1 == 3L).get
    assert(d3._3 == 2L && d3._3 < d3._2, d3)
    // and the registered split on the real table agrees with the full
    // recompute restricted to its delta sliver
    val docs = Tables.documents(spark, sfTiny)
    val fullReal = scores(Dedup.substringWindow(spark, docs)
      .filter(col("doc_id") % 10 === 0))
    val incrReal = scores(Dedup.substringIncremental.fn(spark, sfTiny))
    assert(incrReal == fullReal)
    assert(incrReal.nonEmpty)
    CacheRegistry.drain()
  }

  test("substring strip excises every corpus-duplicated 8-word span") {
    import spark.implicits._
    val docs = Seq(
      (0L, "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"),
      (1L, "a1 a2 a3 a4 a5 a6 a7 a8 b9 b10"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c1 c2 c3 c4 c5 c6 c7 c8"),
      (3L, "d1 d2 d3 d4 d5 d6 d7"),
    ).map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmpDir(); writeTable(dir, "documents", docs)
    val got = Dedup.substringStrip.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_removed"),
          r.getAs[String]("text_stripped")))).toMap
    // every doc rides through (strip is a corpus transformation)
    assert(got.keySet == Set(0L, 1L, 2L, 3L), got.keySet)
    // A/B share their first 8-word span: positions 1-8 excised
    assert(got(0L) == ((10L, 8L, "a9 a10")), got(0L))
    assert(got(1L) == ((10L, 8L, "b9 b10")), got(1L))
    // C's repeated phrase covers the whole doc (spans at 1 and 9)
    assert(got(2L) == ((16L, 16L, "")), got(2L))
    // D is too short for any span — untouched
    assert(got(3L) == ((7L, 0L, "d1 d2 d3 d4 d5 d6 d7")), got(3L))
  }

  test("bloom-prefiltered new-doc detection ≡ plain anti-join on a random corpus") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // small vocabulary → guaranteed real overlaps between corpus and delta
    def text() = (0 until 12).map(_ => s"t${rng.nextInt(30)}").mkString(" ")
    val corpusTexts = (0 until 300).map(_ => text())
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // roughly half the delta re-ships an existing corpus text (dup), the
    // rest is genuinely new content
    val delta = (1000L until 1100L).map(i =>
      (i, if (rng.nextBoolean()) corpusTexts(rng.nextInt(300))
          else s"unique content for delta $i a b c d e f"))
      .toDF("doc_id", "text")
    val got = Dedup.bloomNewDocs(corpus, delta, expectedItems = 1000L)
      .select("doc_id").as[Long].collect().toSet
    val want = delta.join(corpus.select(col("text").as("c_text")),
      col("text") === col("c_text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(want.nonEmpty && want.size < 100, want.size) // both paths exercised
  }

  // ---- hot-bucket edge: every posting list in the near-dup family is
  // bounded (collect_set_bounded(·, 64) — NULL on overflow), so a
  // degenerate bucket of NEAR-identical templated content (which
  // exact-first dedup does NOT collapse) costs O(cap) aggregation-buffer
  // memory and is dropped, while pairs outside it are unaffected.

  private def hotDocs(pairDocs: Seq[(Long, String)], hotText: String, n: Int = 80) = {
    import spark.implicits._
    (pairDocs ++ (0 until n).map(i => (1000L + i, hotText)))
      .map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("the 64-cap boundary is exact: 64-member buckets pair, 65-member buckets drop") {
    import spark.implicits._
    def corpusOf(n: Int) = (0 until n).map(i => (i.toLong, base))
      .map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // 64 identical docs: every sketch bucket holds exactly 64 — AT the
    // cap, so the full C(64,2) pair set must be emitted
    val at = Dedup.minhashPairs(corpusOf(64), 0.2).count()
    CacheRegistry.drain()
    assert(at == 64L * 63 / 2, s"at-cap bucket lost pairs: $at")
    // 65: one past the cap — dropped wholesale, zero pairs
    val past = Dedup.minhashPairs(corpusOf(65), 0.2).count()
    CacheRegistry.drain()
    assert(past == 0L, s"past-cap bucket leaked pairs: $past")
  }

  test("minhash hot bucket: 80-member LSH bucket is dropped, outside pair kept") {
    val nearDup = base.replace("fast", "quick")
    val hot = "templated boilerplate page repeated across the whole mirror crawl " +
      "with navigation header footer copyright notice and sidebar links intact"
    val docs = hotDocs(Seq((0L, base), (1L, nearDup)), hot)
    val got = Dedup.minhashPairs(docs, 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    CacheRegistry.drain()
    // all 8 sketch buckets of the hot cluster hold 80 > 64 members → NULL
    // → dropped; the (0,1) near-dup pair rides its own size-2 buckets
    assert(got == Set((0L, 1L)), got)
  }

  test("cap audit: saturated buckets and affected doc mass are counted exactly") {
    val nearDup = base.replace("fast", "quick")
    val hot = "templated boilerplate page repeated across the whole mirror crawl " +
      "with navigation header footer copyright notice and sidebar links intact"
    val docs = hotDocs(Seq((0L, base), (1L, nearDup)), hot) // 80-member cluster
    val audit = Dedup.capAuditRow(Dedup.minhashBuckets(docs), 64, "minhash")
      .head()
    CacheRegistry.drain()
    // the hot cluster's 8 sketch buckets each hold 80 > 64 members —
    // saturated; its 80 docs are the affected mass. The near-dup pair's
    // own buckets stay small. This is the signal minhashPairs' "no pairs
    // among the cluster" output cannot carry on its own (r15 weak #1).
    assert(audit.getAs[Long]("sat_buckets") == 8L, audit)
    assert(audit.getAs[Long]("sat_docs") == 80L, audit)
    // no-saturation corpus: zeros, totals still counted
    val calm = Dedup.capAuditRow(
      Dedup.minhashBuckets(hotDocs(Seq((0L, base), (1L, nearDup)), hot, n = 0)),
      64, "minhash").head()
    CacheRegistry.drain()
    assert(calm.getAs[Long]("sat_buckets") == 0L &&
      calm.getAs[Long]("sat_docs") == 0L && calm.getAs[Long]("total_buckets") > 0L, calm)
  }

  test("composed recall: exact dedup + capped minhash recovers what saturation eats") {
    val nearDup = base.replace("fast", "quick")
    val other = "completely unrelated content about gardening soil compost " +
      "seeds watering schedules and seasonal pruning of fruit trees"
    val docs = hotDocs(Seq((0L, base), (1L, nearDup), (2L, other)), base, n = 0)
    // amplify doc 0 with 70 extra copies → a 71-member identical-text
    // cluster: every bucket it touches exceeds the 64 cap
    val out = Dedup.composedRecallFrom(docs, ampFilter = col("doc_id") === 0L,
        copies = 70)
      .collect().map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("truth_pairs"), r.getAs[Long]("hits"),
          r.getAs[Long]("found_pairs")))).toMap
    CacheRegistry.drain()
    // truth: C(71,2) = 2485 intra-cluster pairs + the (cluster, nearDup)
    // rep-level near-dup expanded by 71×1
    val truth = 2485L + 71L
    assert(out.keySet == Set("minhash_capped", "exact_only", "composed"), out)
    // saturated minhash alone: the cluster's buckets are dropped and the
    // near-dup's shared buckets are polluted past cap too → zero recall
    assert(out("minhash_capped") == ((truth, 0L, 0L)), out)
    // exact alone: every intra-cluster pair, no near-dups
    assert(out("exact_only") == ((truth, 2485L, 2485L)), out)
    // composed: collapse first, then the capped generator sees a 3-doc
    // corpus with healthy buckets — full recovery
    assert(out("composed") == ((truth, truth, truth)), out)
  }

  test("recall audit: exact counts on the crafted corpus, per-method invariants") {
    val out = Dedup.recallAuditFrom(spark.read.parquet(s"$docsDir/documents.parquet"))
      .collect().map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("truth_pairs"), r.getAs[Long]("hits"),
          r.getAs[Long]("found_pairs")))).toMap
    CacheRegistry.drain()
    assert(out.keySet == Set("minhash_lsh", "ngram_sampled", "simhash_pairs"))
    // truth on the 4-doc corpus: (0,1) one-token near-dup, (0,3) exact
    // dup, (1,3) — doc 2 shares nothing
    out.values.foreach { case (t, h, f) =>
      assert(t == 3L && h <= t && h <= f, out) }
    assert(out("minhash_lsh") == ((3L, 3L, 3L)), out)
    // sampled candidates ⊆ unsampled candidates (the coin samples GRAMS,
    // postings ride whole): the sampled arm may miss truth pairs but can
    // never report a pair outside the truth set — precision 1 by
    // construction, so hits == found on any corpus
    val (_, ngH, ngF) = out("ngram_sampled")
    assert(ngH == ngF, out)
  }

  test("incremental hot bucket: degenerate delta-delta bucket dropped, cross pair kept") {
    val nearDup = base.replace("fast", "quick")
    val hot = "templated boilerplate page repeated across the whole mirror crawl " +
      "with navigation header footer copyright notice and sidebar links intact"
    // corpus = {base}; delta = the near-dup + 80 identical templated docs
    val docs = hotDocs(Seq((0L, base), (1L, nearDup)), hot)
    val corpusSk = Dedup.sketchTable(docs.filter(col("doc_id") === 0L))
    val deltaSk = Dedup.sketchTable(docs.filter(col("doc_id") =!= 0L))
    val got = Dedup.incrementalPairs(corpusSk, deltaSk, 0.2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    CacheRegistry.drain()
    // delta×delta hot buckets (80 > 64) dropped; delta×corpus is a keyed
    // equi-join (no posting buffer) and still lands the (0,1) pair
    assert(got == Set((0L, 1L)), got)
  }

  test("phash hot bucket: 80 identical payloads dropped, 2-bit-flip pair kept") {
    import spark.implicits._
    // docA/docB: 28 bytes, stride 2 — index 26 is sampled; 'a'(0x61) vs
    // 'b'(0x62) differ in the low nibble by xor 3 → hamming 2, and 3 of 4
    // bands still agree → a size-2 candidate bucket
    val docA = "a" * 28
    val docB = "a" * 26 + "ba"
    val hot = "z" * 40
    val docs = hotDocs(Seq((0L, docA), (1L, docB)), hot)
    val dir = tmpDir(); writeTable(dir, "documents", docs)
    val got = Multimodal.dedupPhash.fn(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(got == Set((0L, 1L, 2L)), got)
  }

  test("multi-block and single-block simhash layouts agree on an unsaturated corpus") {
    // both layouts are COMPLETE for hamming ≤ 3 (pigeonhole) when no
    // bucket overflows, so on a normal corpus they find identical pairs
    val sigs = Dedup.simhashSignatures(Tables.documents(spark, sfTiny))
      .select("doc_id", "hi", "lo")
    def pairs(m: Int) = Dedup.simhashPairsFromSigs(sigs, m, 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    assert(pairs(4) == pairs(6), s"4-block ${pairs(4)} != 6-block ${pairs(6)}")
  }

  test("multi-block bands keep recall where saturated 16-bit bands drop the pair") {
    import spark.implicits._
    // 100 docs agree on bits 0..47 (the crowd — saturates the three
    // 16-bit bands covering those bits past the 64-cap) and carry random
    // bits 48..63. The planted pair also agrees with the crowd on
    // 0..47, and differs from each other in exactly ONE bit inside
    // 48..63: its only agreeing 16-bit band buckets are the saturated
    // ones → the 4×16 layout drops it. The 6-block layout's {·,·,4}
    // combos key on bits the pair shares (the pair agrees on block 4 =
    // bits 42..52) → a size-2 bucket finds it.
    val rng = new scala.util.Random(5)
    val hiF = 0x12345678L
    val loTop = 0xABCDL
    val crowd = (0 until 100).map(i =>
      (i.toLong, hiF, (loTop << 16) | rng.nextInt(65536).toLong))
    val rp = 0x7A51L
    val pair = Seq((1000L, hiF, (loTop << 16) | rp),
      (1001L, hiF, (loTop << 16) | (rp ^ 8L)))
    val sigs = (crowd ++ pair).toDF("doc_id", "hi", "lo")
    def pairsOf(m: Int) = Dedup.simhashPairsFromSigs(sigs, m, 3).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val single = pairsOf(4)
    val multi = pairsOf(6)
    assert(!single.contains((1000L, 1001L)),
      s"16-bit layout unexpectedly survived saturation: $single")
    assert(multi.contains((1000L, 1001L)),
      s"multi-block lost the planted pair: $multi")
    // recall is monotone on this corpus: everything the saturated layout
    // still finds, the finer layout finds too
    assert(single.subsetOf(multi), single -- multi)
  }

  test("simhash layout auto-chooser scales m with corpus size and refuses the impossible") {
    assert(Dedup.simhashLayoutFor(5000L) == 4)               // the 4×16 default
    assert(Dedup.simhashLayoutFor(50000000L) == 5)           // tens of millions
    assert(Dedup.simhashLayoutFor(1000000000L) == 6)         // billions
    assert(Dedup.simhashLayoutFor(1000000000000L) == 8)      // trillions
    intercept[IllegalArgumentException](Dedup.simhashLayoutFor(Long.MaxValue))
    // every pickable layout is a valid simhashBandKeys parameterization
    (4 to 12).foreach(m => Dedup.simhashBandKeys(lit(1L), lit(2L), m, 3))
  }

  test("bucketed bloom new-doc detection ≡ plain anti-join; empty buckets pass delta through") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    def text() = (0 until 12).map(_ => s"b${rng.nextInt(30)}").mkString(" ")
    val corpusTexts = (0 until 300).map(_ => text())
    val corpus = corpusTexts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val delta = (1000L until 1100L).map(i =>
      (i, if (rng.nextBoolean()) corpusTexts(rng.nextInt(300))
          else s"fresh delta content $i a b c d e f"))
      .toDF("doc_id", "text")
    val got = Dedup.bloomNewDocsBucketed(corpus, delta,
        expectedItemsPerBucket = 200L, buckets = 8)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    val want = delta.join(corpus.select(col("text").as("c_text")),
      col("text") === col("c_text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // tiny corpus + many buckets: an EMPTY corpus bucket has no filter —
    // its delta rows are new by definition, not dropped
    val tiny = Seq((0L, "only corpus doc here")).toDF("doc_id", "text")
    val d2 = Seq((1L, "only corpus doc here"), (2L, "something else entirely"))
      .toDF("doc_id", "text")
    val got2 = Dedup.bloomNewDocsBucketed(tiny, d2, 100L, 16)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    assert(got2 == Set(2L), got2)
  }

  test("bloom upsert: OR-merged filter bytes ≡ rebuilt filter bytes per bucket") {
    import spark.implicits._
    import graft.functions.bloom._
    // the absorb-back guarantee at its strongest: merging a shard's
    // filters into the base by bitwise OR produces the EXACT bytes a
    // full rebuild over base ∪ shard would — because the bit array is
    // an order-independent OR of fixed-seed hash positions
    val base = (0 until 200).map(i => (i.toLong, s"bloom upsert base doc $i"))
      .toDF("doc_id", "text")
    val shard = (1000 until 1100).map(i => (i.toLong, s"bloom upsert shard doc $i"))
      .toDF("doc_id", "text")
    val buckets = 8
    def filters(df: org.apache.spark.sql.DataFrame) =
      Dedup.bloomBucketFilters(Dedup.withTextBkt(df, buckets), 500L, buckets)
    // exercise the PRODUCTION merge (bloomMergedFilters), not a copy —
    // the byte-equality pin must fail if the shipped merge shape drifts
    val merged = Dedup.bloomMergedFilters(filters(base), filters(shard))
      .as[(Long, Array[Byte])].collect().toMap
    val rebuilt = filters(base.unionByName(shard))
      .as[(Long, Array[Byte])].collect().toMap
    assert(merged.keySet == rebuilt.keySet, merged.keySet)
    merged.foreach { case (bkt, bytes) =>
      assert(java.util.Arrays.equals(bytes, rebuilt(bkt)),
        s"bucket $bkt: merged filter bytes differ from rebuilt")
    }
  }

  test("bloom upsert serve ≡ rebuilt-state serve ≡ plain anti-join; geometry mismatch fail-fasts") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def text() = (0 until 12).map(_ => s"u${rng.nextInt(30)}").mkString(" ")
    val baseTexts = (0 until 240).map(_ => text())
    val shardTexts = (0 until 60).map(_ => text())
    val base = baseTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val shard = shardTexts.zipWithIndex.map { case (t, i) => (500L + i, t) }
      .toDF("doc_id", "text")
    // arrivals re-ship base texts, shard texts, and fresh content — the
    // shard hits prove the absorb branch participates in membership
    val delta = (1000L until 1100L).map { i =>
      val r = rng.nextInt(4)
      (i, if (r == 0) baseTexts(rng.nextInt(240))
          else if (r == 1) shardTexts(rng.nextInt(60))
          else s"fresh upsert arrival $i a b c d e f")
    }.toDF("doc_id", "text")
    val buckets = 8
    def filters(df: org.apache.spark.sql.DataFrame) =
      Dedup.bloomBucketFilters(Dedup.withTextBkt(df, buckets), 500L, buckets)
    val corpus = base.unionByName(shard)
    val got = Dedup.bloomUpsertServe(filters(base), filters(shard),
      verifyHashes = Seq(Dedup.contentHashes(corpus)), delta = delta,
      buckets = buckets)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    // serve from a REBUILT single state (shardFilters empty-side) must
    // answer identically — upsert ≡ rebuild at the frame level
    val gotRebuilt = Dedup.bloomNewDocsBucketed(corpus, delta, 500L, buckets)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    val want = delta.join(corpus.select(col("text").as("c_text")),
      col("text") === col("c_text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    assert(gotRebuilt == want, s"rebuilt-serve drifted: ${gotRebuilt -- want}")
    assert(want.nonEmpty && want.size < 100, want.size)
    // mismatched geometry must throw (IncompatibleMergeException inside
    // the task), never silently widen the false-positive rate
    val mis = Dedup.bloomUpsertServe(filters(base),
      Dedup.bloomBucketFilters(Dedup.withTextBkt(shard, buckets), 50000L, buckets),
      Seq(Dedup.contentHashes(corpus)), delta, buckets)
    val e = intercept[Exception](mis.count())
    CacheRegistry.drain()
    assert(e.toString.contains("IncompatibleMerge") ||
      Option(e.getCause).exists(_.toString.contains("IncompatibleMerge")) ||
      e.getMessage.contains("IncompatibleMerge"), e.toString.take(200))
  }

  test("bucketed bloom residency: each non-empty bucket deserialized once per holding task") {
    import spark.implicits._
    // the r13 contract the join form exists for: filter bytes reach
    // exactly the task holding that bucket's join partition, and the
    // keyed probe deserializes each bucket once PER TASK — never per
    // row, never all-buckets-per-task (the retired literal-map form
    // deserialized every bucket's filter in every task that probed).
    // Counter accounting: ≤ non-empty buckets × 1 (each bucket's rows
    // land in one shuffle partition ⇒ one task), plus nothing for the
    // 1000 probe rows beyond their bucket's single admit.
    val buckets = 8
    val corpus = (0 until 400)
      .map(i => (i.toLong, s"residency corpus document number $i"))
      .toDF("doc_id", "text")
    val delta = (0 until 1000).map(i =>
      (5000L + i, s"residency corpus document number ${i % 500}"))
      .toDF("doc_id", "text")
    val ctr = graft.functions.BloomMightContainKeyed.deserialized
    val before = ctr.sum()
    val got = Dedup.bloomNewDocsBucketed(corpus, delta, 1000L, buckets)
      .select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    val deserialized = ctr.sum() - before
    // correctness ride-along: delta texts cycle i % 500 over a corpus
    // of 0-399, so i % 500 ≥ 400 (ids 5400-5499, 5900-5999) are new
    assert(got == ((5400L until 5500L) ++ (5900L until 6000L)).toSet,
      s"got ${got.size} rows")
    assert(deserialized >= 1 && deserialized <= buckets,
      s"expected ≤ $buckets per-task deserializations, got $deserialized " +
        "(all-buckets-per-task shipping would be buckets × tasks)")
  }

  test("indexed incremental serve: corpus post/hcnt reach their joins with ZERO exchange") {
    // first touch builds the persisted three-table layout
    Dedup.incremental.fn(spark, sfTiny).collect()
    CacheRegistry.drain()
    val served = Dedup.incremental.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "corpus sketch state (post/hcnt)", 2) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_sk_")) &&
          (t.table == "post" || t.table == "hcnt"))
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
  }

  test("upsert serve: the persisted BASE post/hcnt stay zero-exchange beside the absorb branch") {
    // the absorb shard's fresh postings join in their own branch; the
    // persisted base tables must keep the bucketed zero-exchange plan —
    // unioning absorb into base before the join would strip it
    Dedup.incrementalUpsert.fn(spark, sfTiny).collect() // build 80% base
    CacheRegistry.drain()
    val served = Dedup.incrementalUpsert.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "upsert-base sketch state (post/hcnt)", 2) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_sk_")) &&
          (t.table == "post" || t.table == "hcnt"))
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
  }

  test("paragraph upsert: absorb-then-serve ≡ serve from the rebuilt 90% state") {
    import spark.implicits._
    // the upsert contract (dedup_incremental_upsert's, applied to the
    // paragraph family): absorbing the % 10 = 1 shard into the 80% base
    // must admit the % 10 = 0 arrivals EXACTLY like a rebuilt 90% state
    val docs = Tables.documents(spark, sfTiny)
    val delta = Dedup.pseudoParas(docs.filter(col("doc_id") % 10 === 0))
    val upserted = Dedup.paragraphUpsert.fn(spark, sfTiny)
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    val rebuilt = Dedup.paragraphAdmitServe(
        Dedup.paragraphHashCounts(
          Dedup.pseudoParas(docs.filter(col("doc_id") % 10 =!= 0))),
        None, delta, " ")
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    assert(upserted == rebuilt,
      s"upsert diverged from rebuild: ${upserted.diff(rebuilt).take(3)}")
    assert(upserted.nonEmpty)
  }

  test("paragraph admission: corpus hit drops, within-doc repeat drops, fresh keeps") {
    import spark.implicits._
    // paragraphs are 12-word pseudo-blocks; build texts from 12-word units
    def block(tag: String) = (1 to 12).map(i => s"$tag$i").mkString(" ")
    val corpusDoc = (100L, block("known") + " " + block("other"))
    val corpus = Seq(corpusDoc).toDF("doc_id", "text")
    // doc 1: [known, fresh] — known is in the corpus state → dropped
    // doc 2: [rep, rep]     — within-doc repeat → BOTH copies dropped
    // doc 3: [solo]         — fresh singleton → kept untouched
    val arrivals = Seq(
      (1L, block("known") + " " + block("fresh")),
      (2L, block("rep") + " " + block("rep")),
      (3L, block("solo"))).toDF("doc_id", "text")
    val got = Dedup.paragraphAdmitServe(
        Dedup.paragraphHashCounts(Dedup.pseudoParas(corpus)),
        None, Dedup.pseudoParas(arrivals), " ")
      .orderBy("doc_id")
      .select("doc_id", "n_paras", "n_removed", "text_depara")
      .as[(Long, Long, Long, String)].collect().toSeq
    CacheRegistry.drain()
    assert(got == Seq(
      (1L, 2L, 1L, block("fresh")),
      (2L, 2L, 2L, ""),
      (3L, 1L, 0L, block("solo"))), got)
  }

  test("paragraph upsert serve: the persisted hash state reaches its probe with ZERO exchange") {
    Dedup.paragraphUpsert.fn(spark, sfTiny).collect() // build 80% base
    CacheRegistry.drain()
    val served = Dedup.paragraphUpsert.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "paragraph hash state (hn)", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_ph_")) && t.table == "hn")
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
  }

  test("substring incremental serve: corpus gram counts reach their join with ZERO exchange") {
    Dedup.substringIncremental.fn(spark, sfTiny).collect() // build gc
    CacheRegistry.drain()
    val served = Dedup.substringIncremental.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "corpus gram-count table (gc)", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_gc_")) && t.table == "gc")
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
  }

  test("bloom serve: persisted content-hash verify reaches its anti-join with ZERO exchange") {
    // the r15 verify re-distincted raw corpus TEXT per serve — a
    // corpus-sized exchange in the one family whose state discipline is
    // otherwise "persist bucketed, probe exchange-free" (VERDICT r15
    // #2). The verify now probes the persisted bucketBy(k) md5 table,
    // pinned here exactly like the post/hcnt/gc/hn state tables.
    Dedup.bloomUpsert.fn(spark, sfTiny).collect() // build filters + ch
    CacheRegistry.drain()
    val served = Dedup.bloomUpsert.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "bloom content-hash state (ch)", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_ch_")) && t.table == "ch")
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
    // the bucketed serve path keeps its persisted ch ride too
    Dedup.bloomNewBucketed.fn(spark, sfTiny).collect()
    CacheRegistry.drain()
    val servedB = Dedup.bloomNewBucketed.fn(spark, sfTiny)
    assertZeroExchangeToJoin(servedB, "bloom content-hash state (ch)", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_ch_")) && t.table == "ch")
      case _ => false
    }
    servedB.collect(): Unit
    CacheRegistry.drain()
  }

  test("substring upsert: absorb-then-serve ≡ serve from the rebuilt 90% count table") {
    import spark.implicits._
    val upserted = Dedup.substringUpsert.fn(spark, sfTiny)
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    // rebuilt 90% counts served through the SAME single-frame path the
    // registered incremental uses — the upsert must match it exactly
    val docs = Tables.documents(spark, sfTiny)
    val rebuilt = Dedup.substringIncrementalScoreMulti(
        Seq((Dedup.substringCountTable(
          docs.filter(col("doc_id") % 10 =!= 0)), "SHUFFLE_HASH")),
        docs.filter(col("doc_id") % 10 === 0),
        parts = 4)
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    assert(upserted == rebuilt,
      s"upsert diverged from rebuild: ${upserted.diff(rebuilt).take(3)}")
    assert(upserted.nonEmpty)
  }

  test("count-state compaction ≡ rebuild, and single-branch serve over it ≡ the upsert serve (both families)") {
    val docs = Tables.documents(spark, sfTiny)
    val delta = docs.filter(col("doc_id") % 10 === 0)
    val db = "graft_compact_spec"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION " +
      s"'${graft.TempWarehouse.dir("graft_compact_spec")}'")
    // gram-count family: compact(base80, shard1) must be bit-identical
    // to a from-scratch 90% count table (counts are additive)...
    val compacted = Dedup.compactCountState(spark,
      Dedup.substringCountTable(docs.filter(col("doc_id") % 10 >= 2)),
      Dedup.substringCountTable(docs.filter(col("doc_id") % 10 === 1)),
      "g", s"$db.gc_compacted")
    val rebuilt = Dedup.substringCountTable(
      docs.filter(col("doc_id") % 10 =!= 0))
    assert(compacted.orderBy("g").collect().toSeq ==
      rebuilt.orderBy("g").collect().toSeq)
    // ...and the post-compaction SINGLE-branch serve must answer exactly
    // like the registered two-branch upsert serve (the lifecycle closes:
    // absorb in-plan → compact off the serve path → one branch again)
    val single = Dedup.substringIncrementalScoreMulti(
        Seq((compacted, "MERGE")), delta, parts = 4)
      .orderBy("doc_id").collect().toSeq
    val upsert = Dedup.substringUpsert.fn(spark, sfTiny)
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    assert(single == upsert, s"diff: ${single.diff(upsert).take(3)}")
    // paragraph family: same helper over the (h, n) shape
    val pCompacted = Dedup.compactCountState(spark,
      Dedup.paragraphHashCounts(
        Dedup.pseudoParas(docs.filter(col("doc_id") % 10 >= 2))),
      Dedup.paragraphHashCounts(
        Dedup.pseudoParas(docs.filter(col("doc_id") % 10 === 1))),
      "h", s"$db.hn_compacted")
    val pServe = Dedup.paragraphAdmitServe(pCompacted, None,
        Dedup.pseudoParas(delta), " ")
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    val pUpsert = Dedup.paragraphUpsert.fn(spark, sfTiny)
      .orderBy("doc_id").collect().toSeq
    CacheRegistry.drain()
    assert(pServe == pUpsert, s"diff: ${pServe.diff(pUpsert).take(3)}")
  }

  test("substring upsert serve: the persisted BASE gc stays zero-exchange beside the absorb branch") {
    Dedup.substringUpsert.fn(spark, sfTiny).collect() // build 80% base
    CacheRegistry.drain()
    val served = Dedup.substringUpsert.fn(spark, sfTiny)
    assertZeroExchangeToJoin(served, "upsert-base gram-count table (gc)", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_gc_")) && t.table == "gc")
      case _ => false
    }
    served.collect(): Unit
    CacheRegistry.drain()
  }

  test("IVF lists and PQ codes reach their probe joins with ZERO exchange") {
    // the persisted-index serve paths (not a hand-bucketed copy — the
    // REAL tables persistedIvfIndex/persistedIvfPqIndex read): warm the
    // get-or-build, then pin that the bucketed lists/codes scans never
    // cross an exchange before their probe join
    val ivf = graft.operators.Similarity.annIvfAutoprobe.fn(spark, sfTiny)
    assertZeroExchangeToJoin(ivf, "IVF inverted lists", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_ivf3_")) && t.table == "lists")
      case _ => false
    }
    ivf.collect(): Unit
    val pq = graft.operators.Similarity.ivfPqTopK.fn(spark, sfTiny)
    assertZeroExchangeToJoin(pq, "PQ codes", 1) {
      case f: FileSourceScanExec => f.tableIdentifier.exists(t =>
        t.database.exists(_.startsWith("graft_ivfpq3_")) && t.table == "codes")
      case _ => false
    }
    pq.collect(): Unit
    CacheRegistry.drain()
  }

  test("paragraph dedup: duplicated short paragraph excised from ALL docs, order kept") {
    import spark.implicits._
    // the boilerplate is 3 words — shorter than any 8-gram span, so
    // the substring family cannot see it; paragraph dedup must
    val boiler = "subscribe for updates"
    val docs = Seq(
      (1L, s"alpha beta gamma\n$boiler\ndelta epsilon"),
      (2L, s"$boiler\nzeta eta theta iota"),
      (3L, "kappa lambda mu\nnu xi omicron"),
      (4L, s"SUBSCRIBE FOR UPDATES\npi rho"), // normalization: case-folded dup
      (5L, null: String),
    ).toDF("doc_id", "text")
    val got = Dedup.paragraphDedupByNewline(spark, docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    CacheRegistry.drain()
    assert(got(1L) == ((3L, 1L, "alpha beta gamma\ndelta epsilon")), got(1L))
    assert(got(2L) == ((2L, 1L, "zeta eta theta iota")), got(2L))
    assert(got(3L) == ((2L, 0L, "kappa lambda mu\nnu xi omicron")), got(3L))
    assert(got(4L) == ((2L, 1L, "pi rho")), got(4L))
    // null text ≡ empty: split('') is one empty paragraph, corpus-unique
    // here so it survives, and the rejoin is the empty string either way
    assert(got(5L) == ((1L, 0L, "")), got(5L))
  }

  test("bucketed bloom: build/probe exchanges widen to the bucket count") {
    import spark.implicits._
    // buckets >> session shuffle partitions must NOT leave each task
    // holding ceil(buckets/partitions) filter bit-arrays: the build
    // repartition and the probe join both run at max(buckets, default)
    // partitions so per-task residency stays O(1) filters.
    val buckets = 128 // > the session's 32 shuffle partitions
    val corpus = (0 until 50)
      .map(i => (i.toLong, s"widen corpus doc $i")).toDF("doc_id", "text")
    val delta = (0 until 20)
      .map(i => (900L + i, s"widen corpus doc ${i * 5}")).toDF("doc_id", "text")
    val probed = Dedup.bloomBucketedProbedPlan(
      Dedup.withTextBkt(corpus, buckets),
      Dedup.withTextBkt(delta, buckets), 100L, buckets)
    val fmt = probed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val partCounts = "hashpartitioning\\(bkt[^)]*, (\\d+)\\)".r
      .findAllMatchIn(fmt).map(_.group(1).toInt).toList
    assert(partCounts.nonEmpty && partCounts.forall(_ == buckets),
      s"bkt exchanges at $partCounts, want all $buckets\n" + fmt.take(4000))
  }

  test("bucketed bloom over a partitionBy(bkt) layout: single-pass plan; per-bucket jobs prune") {
    import spark.implicits._
    val buckets = 8
    val docs = (0 until 200)
      .map(i => (i.toLong, s"partitioned corpus doc number $i"))
      .toDF("doc_id", "text")
      .withColumn("bkt", pmod(xxhash64(col("text")), lit(buckets.toLong)))
    val dir = tmpDir()
    docs.write.mode("overwrite").partitionBy("bkt")
      .parquet(s"$dir/corpus_bkt.parquet")
    val corpusP = spark.read.parquet(s"$dir/corpus_bkt.parquet")
    // delta must be file-backed: a LocalRelation delta would let
    // ConvertToLocalRelation fold the probe away before the plan prints
    Seq((9000L, "partitioned corpus doc number 7"),
      (9001L, "a brand new document")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/delta.parquet")
    val delta = spark.read.parquet(s"$dir/delta.parquet")
    val out = Dedup.bloomNewDocsBucketed(corpusP, delta, 100L, buckets)
    // r8 plan shape: ONE proven∪verified union — never the r7
    // branch-per-bucket fan-out (2·buckets delta scans of 5-20 ms tasks)
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.split("Union").length - 1 == 1, opt.take(4000))
    // the single-scan probe rides the persisted probe stage (r13: the
    // registered plan hides it behind InMemoryRelation; pin the probe
    // stage's own plan, with the trusted layout's bkt)
    val probedFmt = Dedup.bloomBucketedProbedPlan(
        Dedup.withTextBkt(corpusP, buckets),
        Dedup.withTextBkt(delta, buckets), 100L, buckets)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(probedFmt.contains("might_contain_keyed"), probedFmt.take(4000))
    val got = out.select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    assert(got == Set(9001L), got)
    // the past-plan-residency incremental shape (docstring contract):
    // each bucket as its OWN JOB over the partitioned layout — the
    // bucket's corpus scan then reads one bucket's files only
    // (partition pruning), and the per-job answer equals the full run
    // restricted to that bucket.
    val dupBkt = docs.filter(col("doc_id") === 7L)
      .select("bkt").as[Long].head()
    val deltaB = delta.withColumn("bkt",
      pmod(xxhash64(col("text")), lit(buckets.toLong)))
    val oneJob = Dedup.bloomNewDocsBucketed(
      corpusP.filter(col("bkt") === dupBkt),
      deltaB.filter(col("bkt") === dupBkt), 100L, buckets)
    val oneFmt = oneJob.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*bkt".r.findFirstIn(oneFmt).isDefined,
      oneFmt.take(4000))
    val oneGot = oneJob.select("doc_id").as[Long].collect().toSet
    CacheRegistry.drain()
    val wantB = deltaB.filter(col("bkt") === dupBkt)
      .select("doc_id").as[Long].collect().toSet - 9000L
    assert(oneGot == wantB, s"got=$oneGot want=$wantB")
  }

  test("simhash: identical docs identical signatures; near dups within small hamming") {
    val sh = Dedup.simhash.fn(spark, docsDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(sh(0L) == sh(3L))
    def hamming(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(hamming(sh(0L), sh(1L)) <= 12, s"near dup hamming ${hamming(sh(0L), sh(1L))}")
    assert(hamming(sh(0L), sh(2L)) > hamming(sh(0L), sh(1L)))
  }

  test("fingerprint: winnow_min survives a distant edit, content_md5 does not") {
    val fp = TextAnalysis.fingerprint.fn(spark, docsDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("content_md5"), r.getAs[String]("winnow_min"))).toMap
    assert(fp(0L)._1 != fp(1L)._1)
    assert(fp(0L)._1 == fp(3L)._1)
  }

  private lazy val vecsDir: String = {
    val dim = 16
    val a = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    val nearA = a.clone(); nearA(0) = (a(0) + 0.01f)
    val ortho = Array.tabulate(dim)(i => math.cos(3 * i + 2).toFloat)
    import spark.implicits._
    val df = Seq((0L, a.toSeq, 0), (1L, nearA.toSeq, 0), (2L, ortho.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dir = tmpDir()
    writeTable(dir, "embeddings", df)
    dir
  }

  test("recall audit: full scaffold, hits ≤ k, refine ≥ pq per query") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.operators.Similarity.annRecallAudit.fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    CacheRegistry.drain()
    val kinds = rows.keySet.map(_._1)
    val qs = rows.keySet.map(_._2)
    assert(kinds == Set("ivf", "ivfpq", "ivfpq_refine"), kinds)
    // scaffold: every (kind, query) cell present even at zero hits
    assert(rows.size == kinds.size * qs.size, rows.size)
    rows.foreach { case (key, (hits, k)) =>
      assert(k == 5L && hits >= 0L && hits <= k, s"$key → $hits/$k")
    }
    // theorem of the re-rank: an exact-top-5 member inside the ADC
    // shortlist survives exact re-ranking (at most 4 vectors anywhere
    // beat it), and refine's shortlist (ivfPqShortlistMult·5 — 60 at
    // the r15 tuning) contains pq's 5 — so refine recall can never
    // fall below pq recall on any query
    qs.foreach { q =>
      assert(rows(("ivfpq_refine", q))._1 >= rows(("ivfpq", q))._1,
        s"q=$q refine ${rows(("ivfpq_refine", q))._1} < pq ${rows(("ivfpq", q))._1}")
    }
  }

  test("brute-force ann ranks the perturbed copy first") {
    val top = Similarity.annBruteForceTopK.fn(spark, vecsDir)
      .filter(col("q_id") === 0L).orderBy(desc("cosine")).head()
    assert(top.getAs[Long]("cand_id") == 1L)
    assert(top.getAs[Double]("cosine") > 0.999)
  }

  test("paragraph cached/fused plan forms are result-identical (sf0.001)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val forms = Dedup.paragraphForms.toMap
    def rows(name: String) = {
      val got = forms(name)(spark, docs).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_paras"),
          r.getAs[Long]("n_removed"), r.getAs[String]("text_depara"))).toSet
      CacheRegistry.drain()
      got
    }
    val a = rows("para_cached")
    val b = rows("para_fused")
    assert(a == b, s"missing=${a -- b} extra=${b -- a}")
    assert(a.nonEmpty && a.exists(_._3 > 0L))
  }

  test("knn join: mutual top neighbors for the near pair, nothing for the singleton") {
    // vecsDir: 0 and 1 near-identical (same sign sketches on both
    // bands), 2 sign-disjoint from both on both bands → bucket {0,1}
    // pairs, {2} is a singleton (below the BETWEEN 2 AND 64 floor) and
    // emits no neighbors — the declared both-bands-degenerate contract
    val rows = Similarity.annKnnJoinTopK.fn(spark, vecsDir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Double]("cosine")))
    CacheRegistry.drain()
    assert(rows.map(t => (t._1, t._2)).toSet == Set((0L, 1L), (1L, 0L)),
      rows.mkString(", "))
    rows.foreach(t => assert(t._3 > 0.999, t))
  }

  test("knn join: 80-member degenerate bucket drops, disjoint near pair survives") {
    import spark.implicits._
    val dim = 16
    val base = Array.tabulate(dim)(i => math.sin(i + 1).toFloat)
    val neg = base.map(x => -x)
    val negNear = neg.clone(); negNear(0) = neg(0) + 0.01f
    val hot = (10L until 90L).map(id => (id, base.toSeq, 0))
    val df = (hot :+ ((0L, neg.toSeq, 1)) :+ ((1L, negNear.toSeq, 1)))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dir = tmpDir(); writeTable(dir, "embeddings", df)
    val rows = Similarity.annKnnJoinTopK.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    CacheRegistry.drain()
    // the 80 identical vectors share both band buckets → over the 64
    // cap → dropped; the sign-flipped near pair lives in its own kept
    // bucket and is all that survives
    assert(rows.toSet == Set((0L, 1L), (1L, 0L)), rows.mkString(", "))
  }

  test("knn join wide: 16-bit bands recover what the saturated 8-bit layout drops") {
    import spark.implicits._
    // 140 vectors (70 twin pairs) share signs on dims 1-16, so BOTH of
    // the 8-bit layout's bands are one 140-member bucket — past the 64
    // cap, dropped, zero recall with no error (the hazard the cap audit
    // flags). Dims 17-32 carry a distinct stable sign pattern per twin
    // pair, so the 16-bit layout's band 2 holds size-2 buckets and
    // finds every twin.
    val rnd = new scala.util.Random(7)
    val rows = (0 until 70).flatMap { i =>
      val head = Array.tabulate(16)(d => 0.5f + 0.01f * d)
      val tail = Array.fill(16) {
        val x = rnd.nextFloat() - 0.5f
        if (x >= 0) x + 0.1f else x - 0.1f // signs bounded away from 0
      }
      val v = head ++ tail
      val near = v.clone(); near(31) = near(31) + 0.001f
      Seq((i.toLong, v.toSeq), ((i + 1000).toLong, near.toSeq))
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val narrow = Similarity.knnJoinTopK(df, w = 8).count()
    CacheRegistry.drain()
    assert(narrow == 0L, s"saturated 8-bit layout leaked $narrow pairs")
    val wide = Similarity.knnJoinTopK(df, w = 16)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id")))
    CacheRegistry.drain()
    val wantTwins = (0 until 70).flatMap(i =>
      Seq((i.toLong, i + 1000L), (i + 1000L, i.toLong))).toSet
    assert(wantTwins.subsetOf(wide.toSet),
      s"wide layout missed twins: ${(wantTwins -- wide.toSet).take(5)}")
  }

  test("knn join: at most k=3 neighbors per vector, no self, cosine bounded (sf0.001)") {
    val rows = Similarity.annKnnJoinTopK.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("nbr_id"),
        r.getAs[Double]("cosine")))
    CacheRegistry.drain()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, ns) =>
      assert(ns.length <= 3, s"vec $id has ${ns.length} neighbors")
      assert(ns.map(_._2).distinct.length == ns.length, s"vec $id dup nbrs")
    }
    rows.foreach { case (id, nbr, cos) =>
      assert(nbr != id, s"self neighbor at $id")
      assert(cos >= -1.0001 && cos <= 1.0001, s"cosine $cos at ($id,$nbr)")
    }
  }

  test("embedding near-dup pairs include (0,1) with cosine ~1") {
    val pairs = Similarity.dedupEmbeddingCosine.fn(spark, vecsDir).collect()
      .map(r => ((r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")),
        r.getAs[Double]("cosine"))).toMap
    assert(pairs.keySet.contains((0L, 1L)))
    assert(pairs((0L, 1L)) > 0.999)
  }

  test("lloyd k-means: inertia is monotone non-increasing over iterations") {
    import org.apache.spark.sql.DataFrame
    val pts = Tables.embeddings(spark, vecsDir)
      .select(col("vec_id").as("pid"), lit(0).as("part"),
        expr("transform(embedding, x -> cast(x as double))").as("emb"))
    val c0 = pts.filter(col("pid") =!= 1L) // 2 centroids for 3 points
      .select(col("pid").as("cent_id"), col("part"), col("emb").as("c_emb"))
    def inertia(c: DataFrame): Double =
      Similarity.assignTo(pts, c, Similarity.L2)
        .agg(sum(col("a_cost"))).head.getDouble(0)
    val i0 = inertia(c0)
    val i1 = inertia(Similarity.lloyd(pts, c0, 1, Similarity.L2))
    val i2 = inertia(Similarity.lloyd(pts, c0, 2, Similarity.L2))
    val i3 = inertia(Similarity.lloyd(pts, c0, 3, Similarity.L2))
    // Lloyd with L2 cost + mean update is monotone; the 1e-6 fixed-point
    // snap of centroid means can wiggle within rounding, hence the epsilon
    val eps = 1e-9
    assert(i1 <= i0 + eps, s"i0=$i0 i1=$i1")
    assert(i2 <= i1 + eps, s"i1=$i1 i2=$i2")
    assert(i3 <= i2 + eps, s"i2=$i2 i3=$i3")
    // fixpoint on this tiny instance: assignments stable by iteration 2
    val a2 = Similarity.assignTo(pts, Similarity.lloyd(pts, c0, 2, Similarity.L2),
      Similarity.L2).select("pid", "a_cent").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a3 = Similarity.assignTo(pts, Similarity.lloyd(pts, c0, 3, Similarity.L2),
      Similarity.L2).select("pid", "a_cent").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a2 == a3, s"assignments not stable: $a2 vs $a3")
  }

  test("pq codes: near-identical vectors share codes, orthogonal vector does not") {
    val dim = 16
    import spark.implicits._
    // 64-dim vectors for the 4×16 PQ layout: 0 and 1 near-identical, 2 far
    val a = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val nearA = a.clone(); nearA(0) = a(0) + 0.001f
    val far = Array.tabulate(64)(i => (math.cos(3 * i + 2) * 2).toFloat)
    // ids 0 and 2 are codebook members (the bounded vec_id < 16 init
    // set); 20 is not — it must land on codeword 0 in every subspace,
    // giving it vector 0's exact codes
    val df = Seq((0L, a.toSeq, 0), (20L, nearA.toSeq, 0), (2L, far.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dir = tmpDir(); writeTable(dir, "embeddings", df)
    val out = Similarity.pqCodes.fn(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[String]("codes"), r.getAs[Double]("recon_err"))).toMap
    assert(out.size == 3)
    assert(out(0L)._1 == out(20L)._1, "near-dup must quantize to the same codes")
    assert(out(0L)._1 != out(2L)._1, "distant vector must take different codes")
    out.values.foreach(v => assert(v._2 >= 0.0 && !v._2.isNaN))
    // the far vector is alone in its cells: after the Lloyd refinement its
    // codewords are exactly its own subvector means → near-exact recon
    assert(out(2L)._2 < 0.01, s"codebook member recon err ${out(2L)._2}")
  }

  test("pq adc search ranks the near-identical vector closest") {
    import spark.implicits._
    // 64-dim for the 4×16 PQ layout: query 0 near-identical to 1, 2 far
    val a = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val nearA = a.clone(); nearA(0) = a(0) + 0.001f
    val far = Array.tabulate(64)(i => (math.cos(3 * i + 2) * 2).toFloat)
    val df = Seq((0L, a.toSeq, 0), (1L, nearA.toSeq, 0), (2L, far.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val dir = tmpDir(); writeTable(dir, "embeddings", df)
    val rows = Similarity.pqSearch.fn(spark, dir).collect()
    CacheRegistry.drain()
    val q0 = rows.filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Double]("adc_dist"))
    assert(q0.nonEmpty, rows.mkString(","))
    assert(q0.head.getAs[Long]("cand_id") == 1L, q0.mkString(","))
    // the orthogonal vector must be strictly farther in ADC space
    val d = q0.map(r => r.getAs[Long]("cand_id") -> r.getAs[Double]("adc_dist")).toMap
    assert(d(1L) < d(2L), d)
  }

  test("decontamination flags the benchmark's near-duplicates only") {
    val sh = Dedup.sketchTable(Tables.documents(spark, docsDir))
      .select("doc_id", "shingles")
    // benchmark = doc 0; near-dup 1 and exact-dup 3 are contaminated, 2 is not
    val out = graft.operators.Pipeline.decontaminate(
      sh.filter(col("doc_id") =!= 0L), sh.filter(col("doc_id") === 0L), tau = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("contaminated")).toMap
    assert(out == Map(1L -> 1L, 2L -> 0L, 3L -> 1L), out.toString)
  }

  test("multimodal meta extract emits one typed row per doc") {
    val out = Multimodal.metaExtract.fn(spark, docsDir).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(Set("jpeg", "png", "webp").contains(r.getAs[String]("format")))
      assert(r.getAs[Int]("width") % 16 == 0 && r.getAs[Int]("width") <= 640)
    }
  }

  test("frame sampling covers the payload with stride-64 frames") {
    val frames = Multimodal.frameSample.fn(spark, docsDir)
      .filter(col("doc_id") === 0L).collect()
    val expected = math.max(1, (docText0Len + 63) / 64)
    assert(frames.length == expected)
    assert(frames.map(_.getAs[Int]("frame_idx")).sorted.sameElements(0 until expected))
  }

  private def docText0Len: Int = base.length
}
