package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based checks of the custom Catalyst expressions against
  * straightforward reference implementations (raw ScalaCheck generators
  * sampled with fixed seeds — deterministic, no bridge dependency).
  */
class PropertySpec extends SparkSpec {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("vec_dot matches a sequential reference fold on random vectors") {
    import spark.implicits._
    import graft.functions.vec._
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = samples(Gen.zip(gen, gen), 20)
    val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
    val got = df.select(vec_dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    }
    assert(got.toSeq == expected) // bit-exact, same fold order
  }

  test("intersect_size matches distinct-set intersection on random arrays") {
    import spark.implicits._
    import graft.functions.vec._
    val gen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    val pairs = samples(Gen.zip(gen, gen), 30)
    val df = pairs.toDF("a", "b")
    val got = df.select(intersect_size(col("a"), col("b"))).collect().map(_.getInt(0))
    val expected = pairs.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got.toSeq == expected)
  }

  test("simhash_bits matches a reference bit-vote implementation") {
    import spark.implicits._
    import graft.functions.simhash._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val gen = Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty)).map(_.map(md5hex))
    val inputs = samples(gen, 20)
    val df = inputs.map(Tuple1(_)).toDF("m")
    val got = df.select(simhash_bits(col("m"))).collect().map(_.getString(0))
    val expected = inputs.map { md5s =>
      (0 until 64).map { b =>
        val mask = if (b % 2 == 0) "89abcdef" else "4567cdef"
        val votes = md5s.map(m => if (mask.contains(m.charAt(b / 2))) 1 else -1).sum
        if (votes > 0) '1' else '0'
      }.mkString
    }
    assert(got.toSeq == expected)
  }

  test("asofJoin matches the naive per-row scan on random timelines") {
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 50L))
    val leftRows = samples(Gen.zip(gen, Gen.chooseNum(0L, 4L)), 60)
      .zipWithIndex.map { case (((k, t), _), i) => (k, t, i.toLong) }
    val rightRows = samples(gen, 60)
      .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    val left = leftRows.toDF("k", "lt", "lid")
      .select(col("k"), expr("timestamp_millis(lt * 60000)").as("lts"), col("lid"))
    val right = rightRows.toDF("k", "rt", "payload")
      .select(col("k"), expr("timestamp_millis(rt * 60000)").as("rts"), col("payload"))
    val got = graft.api.GraftApi.asofJoin(left, right, "k", "lts", "rts", "payload")
      .select("lid", "asof_payload").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    val naive = leftRows.map { case (k, lt, lid) =>
      val cands = rightRows.filter { case (rk, rt, _) => rk == k && rt <= lt }
      // latest at-or-before; ties on time → larger payload
      lid -> cands.sortBy { case (_, rt, p) => (rt, p) }.lastOption.map(_._3)
    }.toMap
    assert(got == naive)
  }

  test("sessionizeBlocks matches sessionize exactly on random and skewed timelines") {
    import spark.implicits._
    // timelines dense enough that sessions straddle block boundaries, a
    // hot key holding ~90% of rows, and duplicate timestamps exercising
    // the tiebreak — blockMs chosen so most keys span several blocks
    val gen = Gen.zip(Gen.frequency(9 -> Gen.const(1L), 1 -> Gen.chooseNum(2L, 4L)),
      Gen.chooseNum(0L, 600L))
    val rows = samples(gen, 400).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val df = rows.toDF("k", "tmin", "id")
      .select(col("k"), expr("timestamp_millis(tmin * 60000)").as("ts"), col("id"))
    val gapMs = 40 * 60000L
    val blockMs = 90 * 60000L
    val plain = graft.api.GraftApi.sessionize(df, "k", "ts", "id", gapMs)
      .select("k", "id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val blocks = graft.api.GraftApi.sessionizeBlocks(df, "k", "ts", "id", gapMs, blockMs)
      .select("k", "id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(blocks == plain)
    assert(plain.values.max > 1, "degenerate timeline: only one session")
  }

  test("sessionize matches a naive sequential grouping on random timelines") {
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(1L, 3L), Gen.chooseNum(0L, 300L))
    val rows = samples(gen, 80).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val df = rows.toDF("k", "tmin", "id")
      .select(col("k"), expr("timestamp_millis(tmin * 60000)").as("ts"), col("id"))
    val gapMs = 40 * 60000L
    val got = graft.api.GraftApi.sessionize(df, "k", "ts", "id", gapMs)
      .select("k", "id", "session_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val naive = rows.groupBy(_._1).flatMap { case (k, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      var sid = 0L
      var prev = Long.MinValue
      sorted.map { case (_, t, id) =>
        if (prev == Long.MinValue || (t - prev) * 60000L > gapMs) sid += 1
        prev = t
        (k, id) -> sid
      }
    }.toMap
    assert(got == naive)
  }

  test("delta-maintained views equal recompute under random insert/remove sequences") {
    import spark.implicits._
    import graft.streaming.DeltaViews
    // random batches of (key, value in cents); removals always remove rows
    // that exist (multiset semantics: track live rows as we go)
    val gen = Gen.zip(Gen.oneOf("a", "b", "c", "d"), Gen.chooseNum(1, 999))
    var live = samples(gen, 30).toVector
    var view = DeltaViews.recompute(
      live.toDF("k", "cents").select($"k", ($"cents" / 100.0).as("v")), "k", "v")
    val rnd = new scala.util.Random(7)
    for (step <- 1 to 4) {
      val inserts = samples(gen, 10 + step).toVector
      val removes = rnd.shuffle(live).take(8)
      val insDf = inserts.toDF("k", "cents").select($"k", ($"cents" / 100.0).as("v"))
      val remDf = removes.toDF("k", "cents").select($"k", ($"cents" / 100.0).as("v"))
      view = DeltaViews.applyDelta(view, DeltaViews.aggDelta(insDf, "k", "v", 1))
      view = DeltaViews.applyDelta(view, DeltaViews.aggDelta(remDf, "k", "v", -1))
      live = (live ++ inserts).diff(removes)
    }
    val expected = DeltaViews.recompute(
      live.toDF("k", "cents").select($"k", ($"cents" / 100.0).as("v")), "k", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"key", $"n".cast("long"), $"sum_value".cast("double"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(canon(view) == canon(expected))
  }

  test("rangeJoin matches the naive inequality scan on random timelines") {
    import spark.implicits._
    val gen = Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 120L))
    val leftRows = samples(gen, 50).zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
    val rightRows = samples(gen, 50).zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
    val left = leftRows.toDF("lk", "lt", "lid")
      .select(col("lk"), expr("timestamp_millis(lt * 60000)").as("lts"), col("lid"))
    val right = rightRows.toDF("rk", "rt", "rid")
      .select(col("rk"), expr("timestamp_millis(rt * 60000)").as("rts"), col("rid"))
    val (lo, hi) = (3 * 60000L, 17 * 60000L)
    val got = graft.api.GraftApi.rangeJoin(left, right, "lk", "rk", "lts", "rts", lo, hi)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = (for {
      (lk, lt, lid) <- leftRows
      (rk, rt, rid) <- rightRows
      if rk == lk && rt * 60000 >= lt * 60000 + lo && rt * 60000 <= lt * 60000 + hi
    } yield (lid, rid)).toSet
    assert(got == naive && naive.nonEmpty)
  }

  test("packSequences matches a sequential packing reference on random token lists") {
    import spark.implicits._
    val gen = Gen.chooseNum(0L, 50L)
    val tokens = samples(gen, 80).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val budget = 64L
    val shards = 4
    val got = graft.api.GraftApi.packSequences(
        tokens.toDF("id", "tk"), "id", "tk", budget, shards)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // reference: per shard in id order, a running offset cut every `budget`
    val expected = tokens.groupBy(_._1 % shards).flatMap { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).map { case (id, tk) =>
        val out = (id, (shard, tk, cum / budget, cum % budget))
        cum += tk
        out
      }
    }.toMap
    assert(got == expected)
    // invariants: offsets inside the budget, tokens preserved
    assert(got.values.forall { case (_, _, _, off) => off >= 0 && off < budget })
    assert(got.values.map(_._2).sum == tokens.map(_._2).sum)
  }

  test("pipeline_chunk: chunks reassemble every document exactly") {
    // coverage + alignment: dropping the 64-char overlap from every chunk
    // after the first and concatenating must reproduce the document
    // byte-for-byte — no gap, no double-count, for lengths straddling
    // every boundary (under/at/over one window, multi-window, exact
    // stride multiples)
    val docs = graft.operators.Pipeline.chunk.fn(spark, sfTiny)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[String]("chunk")))
      .groupBy(_._1)
    CacheRegistry.drain()
    val texts = Tables.documents(spark, sfTiny).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .filter(_._2.nonEmpty).toMap
    CacheRegistry.drain()
    assert(docs.keySet == texts.keySet)
    docs.foreach { case (id, chunks) =>
      val ordered = chunks.sortBy(_._2).map(_._3)
      val rebuilt = ordered.head + ordered.tail.map(_.drop(64)).mkString
      assert(rebuilt == texts(id), s"doc $id reassembly mismatch")
      // every chunk but the last is exactly one window wide
      assert(ordered.init.forall(_.length == 512), s"doc $id short inner chunk")
    }
  }

  test("pipeline_split: disjoint, exhaustive, and stable across reruns") {
    val total = Tables.documents(spark, sfTiny).count()
    def manifest() = graft.operators.Pipeline.split.fn(spark, sfTiny)
      .collect().map(r => (r.getAs[String]("split"), r.getAs[Long]("n_docs")))
      .toMap
    val m1 = manifest(); CacheRegistry.drain()
    val m2 = manifest(); CacheRegistry.drain()
    assert(m1 == m2, "split manifest not deterministic across reruns")
    assert(m1.values.sum == total, s"splits not exhaustive: $m1 vs $total")
    // the md5 coin should land near 90/5/5 (loose bounds — small corpus)
    val train = m1.getOrElse("train", 0L).toDouble / total
    assert(train > 0.8 && train < 0.97, s"train fraction $train")
    assert(m1.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("pipeline_interleave: every vtime prefix holds the target mixture") {
    // stride scheduling's defining property: reading in ascending vtime,
    // a prefix of n docs contains ≈ n·w docs of each weight-w lang
    // (while no lang's supply is exhausted); shard quantization jitters
    // the boundary by at most the shard count
    val rows = graft.operators.Pipeline.interleave.fn(spark, sfTiny)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Double]("vtime")))
      .sortBy(_._2)
    CacheRegistry.drain()
    val n = 200
    val prefix = rows.take(n).groupBy(_._1).view.mapValues(_.length).toMap
    val en = prefix.getOrElse("en", 0)
    assert(math.abs(en - n * 0.4) <= 10, s"en in prefix: $en of $n")
    for (l <- Seq("zh", "es", "de", "fr")) {
      val c = prefix.getOrElse(l, 0)
      assert(math.abs(c - n * 0.15) <= 8, s"$l in prefix: $c of $n")
    }
    // vtimes are unique per lang (a strict schedule, no double-booking)
    assert(rows.length == rows.map(t => (t._1, t._2)).distinct.length)
  }

  test("multi-block band keys: pairs within hamming d ALWAYS share a key (pigeonhole)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(17)
    // random 64-bit signatures as (hi, lo) halves, each paired with a
    // copy carrying 0..d random bit flips; plus control pairs with d+1
    // flips spread so that every block is hit at least... (controls only
    // assert the SHARED case — extra flips may still share keys)
    val d = 3
    val pairs = (0 until 200).map { i =>
      val hi = rng.nextLong() & 0xffffffffL
      val lo = rng.nextLong() & 0xffffffffL
      val flips = rng.nextInt(d + 1) // 0..3 bit positions in 0..63
      var (h2, l2) = (hi, lo)
      (0 until flips).foreach { _ =>
        val b = rng.nextInt(64)
        if (b < 32) h2 ^= (1L << (31 - b)) else l2 ^= (1L << (63 - b))
      }
      (i.toLong, hi, lo, h2, l2)
    }
    val df = pairs.toDF("id", "hi", "lo", "hi2", "lo2")
    for (m <- Seq(4, 5, 6, 8)) {
      val shared = df.select(col("id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.array_intersect(
            graft.operators.Dedup.simhashBandKeys(col("hi"), col("lo"), m, d),
            graft.operators.Dedup.simhashBandKeys(col("hi2"), col("lo2"), m, d)))
          .as("n_shared"))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("n_shared")).toMap
      shared.foreach { case (id, n) =>
        assert(n >= 1, s"m=$m: pair $id within hamming $d shares no band key")
      }
    }
  }

  test("vec_distsq matches a sequential reference fold on random mixed-type vectors") {
    import spark.implicits._
    import graft.functions.vec._
    val gen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = samples(Gen.zip(gen, gen), 20)
    val df = pairs.map { case (a, b) => (a.toArray, b.map(_.toDouble).toArray) }
      .toDF("a", "b")
    val got = df.select(vec_distsq(col("a"), col("b"))).collect().map(_.getDouble(0))
    val expected = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        val d = x.toDouble - y.toDouble; acc + d * d
      }
    }
    assert(got.toSeq == expected) // bit-exact, same fold order
  }

  test("vec_argmin equals the min(struct(cost, cent_id)) collapse on random codebooks") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, min, struct}
    val vgen = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f))
    val points = samples(vgen, 40).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }
    val cents = samples(vgen, 7).zipWithIndex
      .map { case (v, i) => (i.toLong, v.map(_.toDouble).toArray) }
    val pts = points.toDF("pid", "emb")
    val cs = cents.toDF("cent_id", "c_emb")
      .withColumn("c_nrm", expr("sqrt(aggregate(transform(c_emb, x -> x * x)," +
        " cast(0.0 as double), (acc, p) -> acc + p))"))
    // reference: the old crossJoin + min(struct(cost, cent_id)) collapse
    val refCost = graft.functions.vec.vec_distsq(col("emb"), col("c_emb"))
    val expected = pts.crossJoin(broadcast(cs))
      .groupBy(col("pid"))
      .agg(min(struct(refCost.as("cost"), col("cent_id"))).as("b"))
      .select(col("pid"), col("b.cent_id"), col("b.cost")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val packed = cs.select(expr("0").as("part"), col("cent_id"), col("c_emb"), col("c_nrm"))
      .groupBy("part").agg(sort_array(collect_list(
        struct(col("cent_id"), col("c_emb"), col("c_nrm")))).as("cbook"))
    val got = pts.crossJoin(broadcast(packed))
      .select(col("pid"), graft.functions.vec.vec_argmin(
        col("emb"), lit(0.0), col("cbook"), l2 = true).as("b"))
      .select(col("pid"), col("b.cent_id"), col("b.cost")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected) // ids AND costs bit-exact, ties to lowest cent_id
  }

  test("incremental dedup ≡ restricted full recompute on random corpora and splits") {
    import spark.implicits._
    val wordGen = Gen.listOfN(40, Gen.oneOf("spark", "query", "scan", "table",
      "join", "merge", "batch", "row", "fast", "value"))
    val texts = samples(wordGen, 20).map(_.mkString(" "))
    // planted near-dups: one-word edits of the first five documents
    val edited = texts.take(5).map(t => t.replaceFirst("spark", "flink"))
    val all = (texts ++ edited).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val docs = all.toDF("doc_id", "text")
    val (corpusIds, deltaIds) = all.map(_._1).partition(_ % 3 != 0)
    val corpusSk = graft.operators.Dedup.sketchTable(
      docs.filter(col("doc_id").isin(corpusIds: _*)))
    val deltaSk = graft.operators.Dedup.sketchTable(
      docs.filter(col("doc_id").isin(deltaIds: _*)))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    val incr = canon(graft.operators.Dedup.incrementalPairs(corpusSk, deltaSk, 0.2))
    val full = canon(graft.operators.Dedup.minhashPairs(docs, 0.2))
      .filter(p => p._1 % 3 == 0 || p._2 % 3 == 0)
    assert(incr == full, s"incr ${incr.size} vs full-restricted ${full.size}")
    assert(incr.nonEmpty) // planted near-dups must cross the split somewhere
  }

  test("mm_dedup_phash pairs match a plain-Scala reference on random corpora") {
    import spark.implicits._
    val wordGen = Gen.listOfN(30, Gen.oneOf("alpha", "beta", "gamma", "delta",
      "epsilon", "zeta", "eta", "theta"))
    val texts = samples(wordGen, 25).map(_.mkString(" "))
    // exact duplicates guarantee hamming-0 pairs exist
    val all = (texts ++ texts.take(5)).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
    val dir = tmpDir()
    writeTable(dir, "documents",
      all.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = graft.operators.Multimodal.dedupPhash.fn(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // reference: stride-sampled 14-nibble 56-bit signature, 4×14-bit
    // numeric bands, buckets of 2..64, Hamming ≤ 3
    def phash(t: String): Long = {
      val p = t.getBytes("UTF-8")
      if (p.isEmpty) 0L
      else {
        val stride = math.max(1, p.length / 14)
        (0 until 14).foldLeft(0L)((s, k) =>
          (s << 4) | (p(math.min(k * stride, p.length - 1)) & 0x0fL))
      }
    }
    val sigs = all.map { case (id, t, _, _, _) => id -> phash(t) }
    val buckets = sigs.flatMap { case (id, s) =>
      (0 until 4).map(b => (b * 16384L + ((s >> (14 * b)) & 16383L), id, s))
    }.groupBy(_._1).values.filter(g => g.size >= 2 && g.size <= 64)
    val expected = buckets.flatMap { g =>
      for {
        (_, a, sa) <- g; (_, b, sb) <- g
        if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
      } yield (a, b)
    }.toSet
    assert(got == expected)
    assert(expected.nonEmpty) // the planted duplicates must pair
  }

  test("ADC distance is exact squared L2 when every vector is a codeword") {
    import spark.implicits._
    // N ≤ codebookSize: the seeds are ALL vectors and each singleton
    // Lloyd mean is the (fixed-point-rounded) vector itself, so a
    // candidate's codeword chain reconstructs it and the per-subvector
    // ADC sum must equal the true squared L2 distance (up to the 1e-6
    // fixed-point centroid rounding and subvector-grouped fold order).
    val gen = Gen.listOfN(64, Gen.chooseNum(-4.0f, 4.0f))
    val vecs = samples(gen, 12)
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toArray) }.toDF("vec_id", "embedding")
    val cbs = graft.api.GraftApi.pqCodebooks(df, "vec_id", "embedding",
      numSubs = 4, subDim = 16)
    val codes = graft.api.GraftApi.pqEncode(df, "vec_id", "embedding", cbs,
      numSubs = 4, subDim = 16)
    val got = graft.api.GraftApi.pqSearchADC(codes, cbs, df,
        "vec_id", "embedding", numSubs = 4, subDim = 16, k = 12)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id")) ->
        r.getAs[Double]("adc_dist")).toMap
    val exact = (for {
      (q, qi) <- vecs.zipWithIndex; (c, ci) <- vecs.zipWithIndex if qi != ci
    } yield (qi.toLong, ci.toLong) ->
      q.zip(c).map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum).toMap
    assert(got.size == 12 * 11, got.size)
    for ((k, d) <- got)
      assert(math.abs(d - exact(k)) < 1e-3, s"$k adc=$d exact=${exact(k)}")
  }

  test("linear-view derivation law: q(B ∪ X) = q(B) ∪ q(X) on random splits") {
    import spark.implicits._
    // a representative linear pipeline: filter ∘ select ∘ explode
    def q(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.filter(col("v") % 3 =!= 0)
        .select(col("k"), explode(sequence(lit(1), col("v") % 4 + 1)).as("e"),
          (col("v") * 2).as("w"))
    val gen = Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0L, 40L))
    val rows = samples(gen, 60)
    val (b, x) = rows.splitAt(37)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap // multiset equality
    val whole = canon(q(rows.toDF("k", "v")))
    val derived = canon(q(b.toDF("k", "v")).unionByName(
      graft.streaming.DeltaViews.linearDelta(q)(x.toDF("k", "v"))))
    assert(whole == derived)
  }

  test("BPE kernel matches a reference fold on RANDOM merges tables and words") {
    // random merges (not just the registered table): parts drawn from a
    // small alphabet so rules actually fire and CHAIN (products of
    // earlier rules feed later rules), including rules that never fire
    import graft.functions.BpeUtil
    def reference(word: String, merges: Seq[(String, String)]): Seq[String] = {
      var toks: List[String] =
        word.codePoints().toArray.toList.map(cp => new String(Character.toChars(cp)))
      merges.foreach { case (a, b) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        toks.foreach { t =>
          if (out.nonEmpty && out.last == a && t == b)
            out(out.length - 1) = a + b
          else out += t
        }
        toks = out.toList
      }
      toks
    }
    val alpha = Gen.oneOf("a", "b", "c")
    val ruleGen = for {
      l <- Gen.oneOf(Gen.listOfN(1, alpha), Gen.listOfN(2, alpha))
        .map(_.mkString)
      r <- alpha
    } yield (l, r)
    val tableGen = Gen.listOfN(12, ruleGen)
    val wordGen = Gen.listOfN(14, alpha).map(_.mkString)
    val cases = samples(Gen.zip(tableGen, Gen.listOfN(8, wordGen)), 25)
    cases.foreach { case (table, words) =>
      val compiled = BpeUtil.compile(table)
      words.foreach { w =>
        val got = BpeUtil.tokensOf(w, compiled).toSeq
        val want = reference(w, table)
        assert(got == want, s"table=$table word=$w got=$got want=$want")
      }
    }
  }
}
