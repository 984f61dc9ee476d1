package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication query surface over `documents` — exact, MinHash+LSH,
  * n-gram Jaccard, SimHash (the training-data pipeline dedup family), each
  * with a full DuckDB oracle thanks to md5-based portable hashing
  * ([[graft.ops.Dedup.hash60]]).
  */
object DedupQ {

  private val NumHashes = 8
  private val RowsPerBand = 2

  /** Exact dedup by content hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(spark, dir).documents, "doc_id", "text")

  private val dedupExactSql =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text)""".stripMargin

  /** MinHash + LSH candidate pairs: word-3-gram shingles → 8 salted-md5
    * minhash signatures → 4 bands of 2 → pairs sharing a band bucket.
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val withWords = t.documents
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    val shingled = withWords
      .select(col("doc_id"), explode(Dedup.wordShingles("w", 3)).as("shingle"))
    val sigs = Dedup.minhashSignatures(shingled, "doc_id", "shingle", NumHashes)
    val bands = Dedup.lshBands(sigs, "doc_id", NumHashes, RowsPerBand)
    Dedup.candidatePairs(bands, "doc_id")
  }

  private val minhashPairsSql = {
    def h60(x: String, i: Int): String =
      s"('0x' || substr(md5('${i / 2}:' || $x), ${1 + 15 * (i % 2)}, 15))::BIGINT"
    val minhashes = (0 until NumHashes)
      .map(i => s"MIN(${h60("shingle", i)}) AS h$i").mkString(",\n    ")
    val bandRows = (0 until NumHashes / RowsPerBand).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"h${b * RowsPerBand + r}::VARCHAR")
      s"SELECT doc_id, $b AS band, md5(${cols.mkString(" || ',' || ")}) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
       |  FROM w WHERE len(toks) >= 3
       |), sigs AS (
       |  SELECT doc_id,
       |    $minhashes
       |  FROM sh GROUP BY doc_id
       |), bands AS (
       |  $bandRows
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM bands a JOIN bands b
       |  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id""".stripMargin
  }

  /** N-gram (word-3-gram shingle) Jaccard near-dup pairs within
    * (lang, length-bucket) candidate buckets — the bucketing bounds the pair
    * space (no full crossJoin; the property that survives scale-up). Uses
    * the SAME shingle construction as the MinHash pipeline, so LSH estimates
    * and exact Jaccard are directly comparable.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val d = t.documents
      .select(col("doc_id"), col("lang"),
        floor(col("n_chars") / 10).cast("long").as("len_bucket"),
        Dedup.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", Dedup.wordShingles("w", 3))
    val a = d.select(col("lang"), col("len_bucket"), col("doc_id").as("doc_a"), col("sh").as("sa"))
    val b = d.select(col("lang"), col("len_bucket"), col("doc_id").as("doc_b"), col("sh").as("sb"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private val ngramJaccardPairsSql =
    """WITH d AS (
      |  SELECT doc_id, lang, CAST(floor(n_chars / 10) AS BIGINT) AS len_bucket,
      |    list_distinct(list_transform(range(1, len(toks) - 1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
      |  FROM (SELECT doc_id, lang, n_chars,
      |          regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 3
      |), pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    (CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))) AS jaccard
      |  FROM d a JOIN d b
      |    ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b, jaccard FROM pairs WHERE jaccard >= 0.3""".stripMargin

  /** SimHash 60-bit signatures per document (near-dup clustering key). */
  def simhashSigs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tokens = t.documents.select(
      col("doc_id"), explode(array_distinct(Dedup.words(col("text")))).as("tok"))
    Dedup.simhash(tokens, "doc_id", "tok")
  }

  private val simhashSigsSql =
    """WITH toks AS (
      |  SELECT DISTINCT doc_id,
      |    unnest(list_distinct(regexp_split_to_array(lower(trim(text)), '\s+'))) AS tok
      |  FROM documents
      |), hashed AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks
      |), bits AS (
      |  SELECT doc_id, j, CAST((h >> j) & 1 AS INT) AS bitval
      |  FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS j)
      |), votes AS (
      |  SELECT doc_id, j, SUM(bitval) AS cnt, COUNT(*) AS n
      |  FROM bits GROUP BY doc_id, j
      |)
      |SELECT doc_id,
      |  CAST(SUM(CASE WHEN cnt * 2 >= n THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS simhash
      |FROM votes GROUP BY doc_id""".stripMargin

  /** Fuzzy matching — levenshtein edit distance over (p_type, p_size)
    * candidate buckets (the bucketing bounds the pair space; edit distance
    * only runs within buckets).
    */
  def fuzzyPartNames(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.part.select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
    val a = p.select(col("p_type"), col("p_size"), col("p_partkey").as("key_a"),
      col("p_name").as("name_a"))
    val b = p.select(col("p_type"), col("p_size"), col("p_partkey").as("key_b"),
      col("p_name").as("name_b"))
    a.join(b, Seq("p_type", "p_size"))
      .filter(col("key_a") < col("key_b") && col("name_a") =!= col("name_b"))
      .withColumn("edit_distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_distance") <= 3)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("edit_distance"))
  }

  private val fuzzyPartNamesSql =
    """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_distance
      |FROM part a JOIN part b
      |  ON a.p_type = b.p_type AND a.p_size = b.p_size
      | AND a.p_partkey < b.p_partkey AND a.p_name <> b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q52_fuzzy_part_names", fuzzyPartNames, Some(fuzzyPartNamesSql)),
    QueryDef("q36_dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("q37_minhash_pairs", minhashPairs, Some(minhashPairsSql)),
    QueryDef("q38_ngram_jaccard", ngramJaccardPairs, Some(ngramJaccardPairsSql)),
    QueryDef("q39_simhash", simhashSigs, Some(simhashSigsSql)),
  )
}
