package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.functions._

/** Training-mix operators: deterministic downsampling and vocabulary
  * statistics — the remaining everyday verbs of a 100 TB data pipeline.
  */
object Sampling {

  /** Deterministic stratified sampling: per-language keep rates applied by
    * hashing the stable doc_id (md5 prefix mod 100) — reproducible across
    * engines, runs, and cluster sizes, unlike rand()-based sampling. This
    * is how a training mixture downsamples over-represented sources.
    */
  val stratifiedSample: Op = Op(
    "q_sample_stratified",
    """SELECT doc_id, lang
      |FROM (SELECT doc_id, lang,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 100 AS bucket
      |      FROM documents)
      |WHERE (lang = 'en' AND bucket < 80)
      |   OR (lang <> 'en' AND bucket < 30)""".stripMargin,
  ) { (spark, dir) =>
    val bucket = graft.api.GraftApi.md5Coin("doc_id", 4) % 100
    Tables.documents(spark, dir)
      .withColumn("bucket", bucket)
      .filter((col("lang") === "en" && col("bucket") < 80) ||
        (col("lang") =!= "en" && col("bucket") < 30))
      .select("doc_id", "lang")
  }

  /** Deterministic QUALITY-WEIGHTED sampling: each document keeps with
    * probability proportional to a quality signal (here token count,
    * saturating as tokens/(tokens+50)), decided by comparing a
    * content-stable md5-derived uniform against the weight — the
    * importance-downsampling verb between uniform stratification and
    * hard quality cuts. Reproducible across engines/runs/parallelism:
    * the "coin" is an 8-hex-digit integer (u32) and the threshold is
    * floor(p·2^32), so the comparison is integer-exact (the only
    * float step, p·2^32, is one IEEE multiply both engines perform
    * identically).
    */
  val weightedSample: Op = Op(
    "q_sample_weighted",
    """SELECT doc_id, tokens, p_keep
      |FROM (SELECT doc_id, tokens,
      |        CAST(tokens AS DOUBLE) / (tokens + 50.0) AS p_keep,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS coin
      |      FROM (SELECT doc_id,
      |              len(list_filter(string_split(text, ' '), x -> x <> '')) AS tokens
      |            FROM documents))
      |WHERE coin < CAST(floor(p_keep * 4294967296.0) AS BIGINT)""".stripMargin,
  ) { (spark, dir) =>
    val tokens = size(expr("filter(split(text, ' '), x -> x != '')"))
    val coin = graft.api.GraftApi.md5Coin("doc_id", 8)
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens.as("tokens"),
        (tokens.cast("double") / (tokens + lit(50.0))).as("p_keep"),
        coin.as("coin"))
      .filter(col("coin") < floor(col("p_keep") * lit(4294967296.0)).cast("long"))
      .select("doc_id", "tokens", "p_keep")
  }

  /** Deterministic EXACT-SIZE per-stratum sample — the distributed
    * replacement for reservoir sampling: keep each language's k=7
    * documents with the SMALLEST content-stable md5 coins (bottom-k by
    * hash ≡ a uniform sample without replacement, but mergeable across
    * partitions and reproducible on any engine/cluster, which a
    * stateful reservoir is not). Fraction-based stratification
    * (q_sample_stratified) can't promise exact per-stratum counts;
    * this op does — the eval-set/holdout-carving verb. Runs through
    * the bounded-heap TopKPerKeyExec (PARTIAL/FINAL: per-partition
    * heaps shrink the corpus to langs·k rows BEFORE the exchange), so
    * at 100 TB nothing but winner slivers ever shuffles and no group
    * is sorted.
    */
  val reservoirSample: Op = Op(
    "q_sample_reservoir",
    """SELECT lang, doc_id, coin FROM (
      |  SELECT lang, doc_id, coin,
      |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY coin, doc_id) AS rn
      |  FROM (SELECT lang, doc_id,
      |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS coin
      |        FROM documents))
      |WHERE rn <= 7""".stripMargin,
  ) { (spark, dir) =>
    val coin = graft.api.GraftApi.md5Coin("doc_id", 8)
    val scored = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"), coin.as("coin"))
      .withColumn("neg_coin", -col("coin"))
    // TopKPerKey keeps the k LARGEST by `order` (tiebreak asc) — negate
    // the coin so bottom-k-by-hash comes out, ties broken by doc_id
    graft.api.GraftApi.topKPerKey(scored, "lang", "neg_coin", "doc_id", k = 7)
      .select("lang", "doc_id", "coin")
  }

  /** Corpus vocabulary: global token frequencies with a deterministic
    * top-k — the vocab-building pass before tokenizer training.
    */
  val vocabTopK: Op = Op(
    "q_vocab_topk",
    """SELECT word, n FROM (
      |  SELECT word, COUNT(*) AS n FROM (
      |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE word <> '' GROUP BY word)
      |ORDER BY n DESC, word LIMIT 20""".stripMargin,
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  /** Approximate distinct users per event type (HyperLogLog++): the
    * sketch path for distinct counts that would shuffle too much exactly.
    * No cross-engine oracle (sketch estimates differ by implementation);
    * SamplingSpec bounds the estimate against the exact count.
    */
  val approxDistinct: Op = Op.noOracle("q_approx_distinct") { (spark, dir) =>
    // rsd 0.02: 4× smaller HLL registers than 0.01 for the same
    // SamplingSpec 5% bound — sketch size is the whole cost here
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count(lit(1)).as("n"))
  }

  /** Approximate per-group percentiles (Greenwald-Khanna / t-digest
    * family): the sketch path for quantiles over groups too large to sort
    * — bounded-memory mergeable summaries instead of a per-group global
    * sort. Like q_approx_distinct, sketch estimates are implementation-
    * specific, so there is no cross-engine oracle; SamplingSpec bounds
    * the estimates against the exact interpolated percentiles.
    */
  val approxPercentile: Op = Op.noOracle("q_approx_percentile") { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
        expr("approx_percentile(value, 0.95, 1000)").as("p95_approx"),
        count(lit(1)).as("n"))
  }

  /** Adaptive mixture balancing: downsample every language to the size of
    * the SMALLEST one — the rates come from the data (per-group counts →
    * a tiny broadcast), not from config, which is how a real training-mix
    * rebalance runs. Keep decisions use the weightedSample coin contract:
    * an 8-hex md5 u32 against a per-group threshold floor(p·2^32), whose
    * one float step (an IEEE divide and multiply) both engines perform
    * identically — so the kept document set is identical across
    * engines/clusters AND the keep probability is uniform to within
    * 2^-32. (A 4-hex bucket mod 10⁴ is NOT: 65536 % 10000 = 5536, which
    * over-keeps every downsampled group by up to ~7% — systematically
    * violating the to-the-smallest contract in a way a shared-bias
    * cross-engine gate can never see.) Two aggregates + one broadcast
    * join — no second scan of the corpus per group.
    */
  val mixBalance: Op = Op(
    "q_mix_balance",
    """WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
      |m AS (SELECT MIN(cnt) AS min_cnt FROM counts),
      |rates AS (SELECT lang, cnt,
      |            CAST(floor((CAST(m.min_cnt AS DOUBLE) / cnt) * 4294967296.0)
      |                 AS BIGINT) AS keep_thresh
      |          FROM counts, m)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN rates r ON r.lang = d.lang
      |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      < r.keep_thresh""".stripMargin,
  ) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("cnt")).as("min_cnt"))))
      .select(col("lang").as("r_lang"),
        floor((col("min_cnt").cast("double") / col("cnt")) * lit(4294967296.0))
          .cast("long").as("keep_thresh"))
    docs.join(broadcast(rates), col("lang") === col("r_lang"))
      .filter(graft.api.GraftApi.md5Coin("doc_id", 8) < col("keep_thresh"))
      .select("doc_id", "lang")
  }

  val ops: Seq[Op] =
    Seq(stratifiedSample, weightedSample, reservoirSample, vocabTopK,
      approxDistinct, approxPercentile, mixBalance)
}
