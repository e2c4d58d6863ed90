package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2.2 deduplication operators over the documents table.
  *
  * Scale posture (the part that matters at 100 TB): no operator here ever
  * forms the O(n²) cross product. Candidate pairs always come from an
  * equi-join on a derived key (content hash, LSH band, shared shingle),
  * so the shuffle is keyed and the pair space is bounded by bucket sizes.
  * Signatures (shingle sets, minhash arrays, simhash bits) are pure per-row
  * array expressions — computed in one codegen'd scan, no UDFs.
  */
object Dedup {

  /** Word-3-shingle set per document as a sorted distinct array —
    * per-row expression, shared by the Jaccard/MinHash operators.
    */
  private def withShingles(df: DataFrame): DataFrame =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", array_sort(array_distinct(expr(
        "transform(sequence(1, size(words)-2)," +
          " i -> concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2)))"))))

  /** Same shingle construction in DuckDB SQL (1-based lists). */
  private val shinglesSql =
    """SELECT doc_id,
      |  list_sort(list_distinct(list_transform(generate_series(1, len(w)-2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS shingles
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |WHERE len(w) >= 3""".stripMargin

  /** Exact dedup: group by full-content hash, keep the smallest doc_id.
    * At scale the shuffle key is the 128-bit digest — uniformly
    * distributed, no skew.
    */
  val exact: Op = Op(
    "dedup_exact",
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin,
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
  }

  /** n-gram Jaccard near-dup pairs: explode distinct shingles, equi-join on
    * the shingle (never a cross join), count intersections, compute
    * |A∩B| / (|A|+|B|-|A∩B|). Integer counts + one double division —
    * bit-deterministic.
    */
  val ngramJaccard: Op = Op(
    "dedup_ngram_jaccard",
    s"""WITH sh AS ($shinglesSql),
      |sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
      |grams AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b, n_common,
      |  CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) AS jaccard
      |FROM inter JOIN sizes sa ON sa.doc_id = doc_a
      |           JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE CAST(n_common AS DOUBLE) / (sa.sz + sb.sz - n_common) >= 0.2""".stripMargin,
  ) { (spark, dir) =>
    val sh = withShingles(Tables.documents(spark, dir)).select("doc_id", "shingles")
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("sz"))
    val grams = sh.select(col("doc_id"), explode(col("shingles")).as("g"))
    val inter = grams.alias("a")
      .join(grams.alias("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    val jac = col("n_common").cast("double") /
      (col("sa.sz") + col("sb.sz") - col("n_common"))
    inter
      .join(sizes.alias("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sizes.alias("sb"), col("sb.doc_id") === col("doc_b"))
      .filter(jac >= 0.2)
      .select(col("doc_a"), col("doc_b"), col("n_common"), jac.as("jaccard"))
  }

  /** MinHash signatures + LSH banding. 16 hash functions h_j(doc) =
    * min over shingles of md5(j || '|' || shingle) (lexicographic min of a
    * keyed digest — engine-portable, no custom hash needed); 8 bands of 2
    * (recall ≈ 1-(1-j²)^8: ≈0.94 at j=0.5, ≈1 at j≥0.8 — band-match
    * probability with rows of 4 would miss mid-similarity pairs).
    * Near-dup candidates share a band key; candidates are verified with
    * exact Jaccard on the shingle arrays, so banding affects only recall
    * and join cost, never precision. Output: verified pairs.
    */
  val minhashLsh: Op = Op(
    "dedup_minhash_lsh",
    s"""WITH sh AS ($shinglesSql),
      |sig AS (
      |  SELECT doc_id, shingles,
      |    list_transform(generate_series(0, 15),
      |      j -> list_aggregate(list_transform(shingles,
      |             s -> md5(CAST(j AS VARCHAR) || '|' || s)), 'min')) AS sig
      |  FROM sh),
      |bands AS (
      |  SELECT doc_id, shingles, CAST(b AS VARCHAR) || ':' ||
      |    sig[2*b+1] || sig[2*b+2] AS band_key
      |  FROM sig, UNNEST(generate_series(0, 7)) AS t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    a.shingles AS sha, b.shingles AS shb
      |  FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |  CAST(len(list_intersect(sha, shb)) AS DOUBLE) /
      |    (len(sha) + len(shb) - len(list_intersect(sha, shb))) AS jaccard
      |FROM cand
      |WHERE CAST(len(list_intersect(sha, shb)) AS DOUBLE) /
      |    (len(sha) + len(shb) - len(list_intersect(sha, shb))) >= 0.2""".stripMargin,
  ) { (spark, dir) =>
    val sig = withShingles(Tables.documents(spark, dir))
      .withColumn("md5sig", expr(
        "transform(sequence(0, 15)," +
          " j -> array_min(transform(shingles, s -> md5(concat(cast(j as string), '|', s)))))"))
      .select("doc_id", "shingles", "md5sig")
    val bands = sig.select(col("doc_id"), col("shingles"),
      explode(expr(
        "transform(sequence(0, 7), b -> concat(cast(b as string), ':'," +
          " element_at(md5sig, 2*b+1), element_at(md5sig, 2*b+2)))")).as("band_key"))
    val cand = bands.alias("a")
      .join(bands.alias("b"),
        col("a.band_key") === col("b.band_key") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shingles").as("sha"), col("b.shingles").as("shb"))
      .distinct()
    val interSz = size(array_intersect(col("sha"), col("shb")))
    val jac = interSz.cast("double") / (size(col("sha")) + size(col("shb")) - interSz)
    cand.filter(jac >= 0.2).select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
  }

  /** SimHash: 32-bit signature from per-token md5 bit votes (bit b set iff
    * the sum over distinct tokens of ±1 — by the high bit of hex digit b —
    * is positive). Emitted per-document; near-dup pairing on top of it is
    * a band join on 8-bit substrings (spec-tested; at sf the pair set is
    * empty, the signature itself is the strong oracle check).
    */
  val simhash: Op = Op(
    "dedup_simhash",
    """SELECT doc_id,
      |  array_to_string(list_transform(generate_series(1, 32),
      |    b -> CASE WHEN list_sum(list_transform(md5s,
      |           m -> CASE WHEN strpos('89abcdef', substr(m, b, 1)) > 0
      |                THEN 1 ELSE -1 END)) > 0
      |         THEN '1' ELSE '0' END), '') AS simhash
      |FROM (SELECT doc_id,
      |        list_transform(list_distinct(string_split(text, ' ')), t -> md5(t)) AS md5s
      |      FROM documents)""".stripMargin,
  ) { (spark, dir) =>
    Tables.documents(spark, dir)
      .withColumn("md5s", expr("transform(array_distinct(split(text, ' ')), t -> md5(t))"))
      .select(col("doc_id"), expr(
        "array_join(transform(sequence(1, 32)," +
          " b -> case when aggregate(md5s, 0," +
          "   (acc, m) -> acc + (case when instr('89abcdef', substring(m, b, 1)) > 0" +
          "     then 1 else -1 end)) > 0 then '1' else '0' end), '')").as("simhash"))
  }

  val ops: Seq[Op] = Seq(exact, ngramJaccard, minhashLsh, simhash)
}
