package graft

import graft.functions.{BpeTokenCountFn, BpeUtil}
import org.apache.spark.sql.functions._

/** Merges-table BPE: the codegen'd kernel's semantics pinned against
  * hand-computed merges and against the pure array-HOF fold (the exact
  * shape the DuckDB oracle recomputes as a recursive CTE).
  */
class BpeSpec extends SparkSpec {

  private val merges = Seq("t" -> "h", "th" -> "e", "a" -> "n", "an" -> "d")

  test("kernel applies ranked merges greedily, non-overlapping") {
    val m = BpeUtil.compile(merges)
    assert(BpeUtil.tokensOf("the", m).toSeq == Seq("the"))
    assert(BpeUtil.tokensOf("then", m).toSeq == Seq("the", "n"))
    assert(BpeUtil.tokensOf("hand", m).toSeq == Seq("h", "and"))
    assert(BpeUtil.tokensOf("thth", m).toSeq == Seq("th", "th"))
    // rank order matters: (t,h) fires before (th,e) can see its output
    assert(BpeUtil.tokensOf("x", m).toSeq == Seq("x"))
    assert(BpeUtil.tokensOf("", m).toSeq == Seq.empty)
    // greedy left-to-right non-overlap: "aaa" under (a,a) would be
    // [aa, a] — our table has no such rule, check the an/and chain
    assert(BpeUtil.tokensOf("anand", m).toSeq == Seq("an", "and"))
  }

  test("expression ≡ the declarative HOF fold on the documents table") {
    // the HOF fold is the oracle's semantics verbatim (per-rule greedy
    // pass, list_reduce-style first-element init) — written in Spark
    // SQL so the equivalence check runs engine-side at full width
    val mergesArr = "array(" + TextAnalysis_bpeMerges.map { case (a, b) =>
      s"struct('$a' as a, '$b' as b)" }.mkString(",") + ")"
    val onePass = "aggregate(slice(toks, 2, greatest(size(toks) - 1, 0)), " +
      "array(element_at(toks, 1)), (acc, t) -> " +
      "case when try_element_at(acc, -1) = m.a and t = m.b " +
      "then concat(slice(acc, 1, size(acc) - 1), array(concat(m.a, m.b))) " +
      "else concat(acc, array(t)) end)"
    val hof = s"aggregate(filter(split(coalesce(text, ''), ' '), x -> x != ''), " +
      s"cast(0 as bigint), (n, w) -> n + size(aggregate($mergesArr, " +
      s"filter(split(w, ''), c -> c != ''), (toks, m) -> $onePass)))"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        graft.operators.TextAnalysis.bpeTokensCol.as("kernel"),
        expr(hof).as("fold"))
      .filter(col("kernel") =!= col("fold")).count()
    assert(diff == 0L)
  }

  private def TextAnalysis_bpeMerges: Seq[(String, String)] =
    graft.operators.TextAnalysis.bpeMerges

  test("encode: vocab layout, OOV, head cap, and count ≡ bpe_token_count") {
    import graft.functions.BpeTokenCountFn.{bpe_encode_head, bpe_token_count}
    import spark.implicits._
    val m = graft.operators.TextAnalysis.bpeMerges
    val df = Seq(
      (1L, "the"),        // merge product 'the' = rank 1 (0-based) → 95+1
      (2L, "x y"),        // base ASCII: 'x'=120-32=88, 'y'=121-32=89
      (3L, "éé"),         // non-ASCII single code points → OOV -1 each
      (4L, null: String), // null text → 0 tokens, empty head
      (5L, ("word " * 100).trim), // head capped at 64 ids
    ).toDF("doc_id", "text")
    val words = expr("filter(split(coalesce(text, ''), ' '), x -> x != '')")
    val out = df.select(col("doc_id"),
        bpe_encode_head(words, m, 64).as("e"),
        bpe_token_count(words, m).as("n"))
      .select(col("doc_id"), col("e.bpe_tokens"), col("e.ids_head"), col("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getLong(3))).toMap
    assert(out(1L)._2 == "96", out(1L))
    assert(out(2L)._2 == "88 89", out(2L))
    assert(out(3L)._2 == "-1 -1", out(3L))
    assert(out(4L) == ((0L, "", 0L)), out(4L))
    assert(out(5L)._2.split(" ").length == 64, out(5L))
    // count field always equals the counting expression, cap or not
    assert(out.values.forall(v => v._1 == v._3), out)
  }

  test("encode OOV on non-ASCII: code-point granularity, astral and combining pinned") {
    import graft.functions.BpeTokenCountFn.bpe_encode_head
    import spark.implicits._
    val m = graft.operators.TextAnalysis.bpeMerges
    val df = Seq(
      (1L, "👍"),           // astral plane: ONE code point (a surrogate
                            // pair in UTF-16) → ONE OOV token, never two
      (2L, "e\u0301"),      // e + combining acute: TWO code points (one
                            // grapheme) → 'e' = 101-32 = 69, mark OOV -1
      (3L, "中文"),          // two CJK code points → two OOVs
      (4L, "a👍b"),         // OOV splits ASCII neighbors; no merge rule
                            // can fire across it ('a','👍','b' distinct)
    ).toDF("doc_id", "text")
    val words = expr("filter(split(coalesce(text, ''), ' '), x -> x != '')")
    val out = df.select(col("doc_id"), bpe_encode_head(words, m, 64).as("e"))
      .select(col("doc_id"), col("e.bpe_tokens"), col("e.ids_head"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == ((1L, "-1")), out(1L))
    assert(out(2L) == ((2L, "69 -1")), out(2L))
    assert(out(3L) == ((2L, "-1 -1")), out(3L))
    assert(out(4L) == ((3L, "65 -1 66")), out(4L))
  }

  test("encode_ids: full stream prefix ≡ ids_head, length ≡ count, same vocab") {
    import graft.functions.BpeTokenCountFn.{bpe_encode_head, bpe_encode_ids, bpe_token_count}
    import spark.implicits._
    val m = graft.operators.TextAnalysis.bpeMerges
    val df = Seq(
      (1L, "the quick brown fox"),
      (2L, "éé mixed ascii"),
      (3L, null: String),
      (4L, ("word " * 100).trim), // longer than the 64-id head
    ).toDF("doc_id", "text")
    val words = expr("filter(split(coalesce(text, ''), ' '), x -> x != '')")
    val rows = df.select(col("doc_id"),
        bpe_encode_ids(words, m).as("ids"),
        bpe_encode_head(words, m, 64).as("e"),
        bpe_token_count(words, m).as("n"))
      .collect()
    rows.foreach { r =>
      val ids = r.getSeq[Int](1)
      val head = r.getStruct(2).getString(1)
      val n = r.getLong(3)
      assert(ids.length.toLong == n, s"doc ${r.getLong(0)}: ${ids.length} vs $n")
      val wantHead = ids.take(64).mkString(" ")
      assert(head == wantHead, s"doc ${r.getLong(0)}: '$head' vs '$wantHead'")
    }
    assert(rows.find(_.getLong(0) == 3L).get.getSeq[Int](1).isEmpty)
  }

  test("tokenize-shard export: read-back audit ≡ in-memory recompute, packs align") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    // the op writes the hive-partitioned shards and aggregates the
    // READ-BACK; recompute the same aggregates purely in memory (no
    // write) — a mismatch means the disk layout lost or reordered ids
    val got = graft.operators.Pipeline.tokenizeShards.fn(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val docs = Tables.documents(spark, dir)
    val enc = docs.select(col("doc_id"),
      pmod(col("doc_id"), lit(8L)).as("shard"),
      graft.functions.BpeTokenCountFn.bpe_encode_ids(
        expr("filter(split(coalesce(text, ''), ' '), x -> x != '')"),
        graft.operators.TextAnalysis.bpeMerges).as("ids"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = enc
      .withColumn("tokens", size(col("ids")).cast("long"))
      .withColumn("start_tok", sum(col("tokens")).over(w) - col("tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"),
        countDistinct(expr("start_tok div 512")).as("n_packs"),
        sum(expr("aggregate(ids, CAST(0 AS BIGINT), " +
          "(acc, x) -> (acc * 131 + (x + 2)) % 1000000007)")).as("cks"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want, s"got=$got\nwant=$want")
    assert(got.keySet == (0L until 8L).toSet, got.keySet)
  }

  test("token-shard layout: a shard-filtered read prunes to its directory") {
    val out = tmpDir()
    graft.operators.Pipeline.writeTokenShards(
      Tables.documents(spark, "/root/testdata/sf0.001"), out, 512L, 8)
    // hive layout on disk: one directory per shard
    val dirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("shard=")).map(_.getName).toSet
    assert(dirs == (0 until 8).map(s => s"shard=$s").toSet, dirs)
    // the property that makes a per-shard training reader touch 1/n of
    // the bytes: the filter must reach the scan as a PartitionFilter
    val one = spark.read.parquet(out).filter(col("shard") === 3)
    val fmt = one.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*shard".r.findFirstIn(fmt).isDefined,
      fmt.take(3000))
    // and the pruned read is complete: exactly the doc_id % 8 == 3 docs
    val got = one.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    val want = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(pmod(col("doc_id"), lit(8L)) === 3)
      .select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet
    assert(got == want, s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("registered op: totality on null/empty text, unicode chars count by code point") {
    import spark.implicits._
    val df = Seq((1L, null: String), (2L, ""), (3L, "  "), (4L, "déjà"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      BpeTokenCountFn.bpe_token_count(
        expr("filter(split(coalesce(text, ''), ' '), x -> x != '')"),
        merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L), out)
  }
}
