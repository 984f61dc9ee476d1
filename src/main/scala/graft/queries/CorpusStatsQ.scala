package graft.queries

import graft.QueryDef
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Corpus-level statistics for training-data curation: TF-IDF keyword
  * extraction, BPE merge-candidate counting (the pair-frequency step vocab
  * induction iterates), and the duplicated-span fraction (the
  * substring-level dedup signal — how much of a document is verbatim
  * repeated elsewhere in the corpus).
  *
  * All three are pure hash-aggregate/join pipelines: no windows over raw
  * data (only over tiny per-doc top-k sets), no cartesian products, no
  * driver state — each shuffle key is stated in the query scaladoc.
  */
object CorpusStatsQ {

  /** q87 — top-5 TF-IDF keywords per document (whitespace tokens, q61's
    * convention). ONE tokenize pass: tf is a (doc,term) hash agg with
    * map-side combine, then df is a `count(*) over (partition by term)`
    * window on that ALREADY-AGGREGATED table — the tf⋈df self-join
    * formulation would rebuild the tf aggregate twice (plan-audited; two
    * full tokenize passes at 100 TB). Shuffles: (doc,term), term, doc —
    * each over distinct-pair rows, never raw tokens twice. N arrives as a
    * broadcast 1-row agg, not a driver collect (A6 pattern).
    *
    * Determinism: tf/df are exact counts; the ln-based score is a double →
    * rounded to 6 on BOTH sides BEFORE ranking (ranking by the unrounded
    * double would let a ULP of libm difference flip near-ties), with term
    * as the total-order tiebreak (QueryDef rules).
    */
  def tfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = t.documents
      .select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = t.documents.agg(count(lit(1)).as("n_docs"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
  }

  private val tfidfKeywordsSql =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |scored AS (
      |  SELECT doc_id, tf.term, tf, df,
      |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
      |SELECT doc_id, term, tf, df, score FROM scored
      |QUALIFY row_number() OVER (PARTITION BY doc_id
      |                           ORDER BY score DESC, term) <= 5""".stripMargin

  /** q88 — BPE merge candidates: global frequency of adjacent token pairs
    * under q55's GPT-style pre-tokenization, whitespace tokens breaking
    * adjacency (merges never cross words), top-50. This is one iteration of
    * the counting step BPE vocabulary induction repeats; at corpus scale it
    * is the dominant cost, and it's map-side pair expansion + one hash agg
    * on the pair — the TakeOrderedAndProject top-k never shuffles raw pairs
    * a second time.
    */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    t.documents
      .withColumn("tk", regexp_extract_all(col("text"), lit(pat), lit(0)))
      .filter(size(col("tk")) >= 2)
      .select(explode(expr(
        """filter(
          |  zip_with(slice(tk, 1, size(tk) - 1), slice(tk, 2, size(tk) - 1),
          |           (a, b) -> named_struct('lhs', a, 'rhs', b)),
          |  p -> NOT (p.lhs rlike '^\s+$' OR p.rhs rlike '^\s+$'))""".stripMargin))
        .as("p"))
      .select(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("lhs"), col("rhs"))
      .limit(50)
  }

  private val bpePairCountsSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_extract_all(text,
      |    '''s|''t|''re|''ve|''m|''ll|''d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+')
      |    AS tk
      |  FROM documents),
      |pairs AS (
      |  SELECT tk[i] AS lhs, tk[i + 1] AS rhs
      |  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM toks)
      |  WHERE NOT (regexp_matches(tk[i], '^\s+$')
      |          OR regexp_matches(tk[i + 1], '^\s+$')))
      |SELECT lhs, rhs, COUNT(*) AS n FROM pairs
      |GROUP BY lhs, rhs ORDER BY n DESC, lhs, rhs LIMIT 50""".stripMargin

  /** q89 — duplicated-span fraction: of each document's fixed-stride 20-char
    * spans (stride 16, so spans overlap by 4 — boundary-shift tolerant),
    * what share also occurs verbatim in ANOTHER document? The
    * substring-level dedup signal (docs can be near-dups without sharing
    * full shingle sets; this measures how MUCH is shared).
    *
    * ONE explode pass, NO self-join: spans collapse to (span, doc, occ)
    * with map-side combine, the per-span distinct-doc count is a
    * `count(*) over (partition by span)` window on that collapsed table
    * (each row there IS one distinct doc), and the doc rollup sums occ.
    * The spans⋈counts join formulation would explode the corpus twice and
    * stop being broadcastable once the span dictionary outgrows one
    * executor. Span keys are bounded (20 chars), so shuffle payload is
    * rows × 20B, not documents.
    */
  def dupSpanFraction(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val spans = t.documents
      .filter(length(col("text")) >= 20)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, length(text) - 19, 16), i -> substring(text, i, 20))"))
        .as("span"))
    spans
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("nd", count(lit(1)).over(Window.partitionBy(col("span"))))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("occ")).as("n_spans"),
        sum(when(col("nd") > 1, col("occ")).otherwise(lit(0L))).as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans"))
  }

  private val dupSpanFractionSql =
    """WITH spans AS (
      |  SELECT doc_id, substr(text, i, 20) AS span
      |  FROM (SELECT doc_id, text,
      |          unnest(range(1, length(text) - 18, 16)) AS i
      |        FROM documents WHERE length(text) >= 20)),
      |spanct AS (SELECT span, COUNT(DISTINCT doc_id) AS nd
      |           FROM spans GROUP BY 1)
      |SELECT s.doc_id, COUNT(*) AS n_spans,
      |  COUNT(*) FILTER (WHERE c.nd > 1) AS n_dup_spans,
      |  CAST(COUNT(*) FILTER (WHERE c.nd > 1) AS DOUBLE) / COUNT(*)
      |    AS dup_frac
      |FROM spans s JOIN spanct c USING (span)
      |GROUP BY s.doc_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q87_tfidf_keywords", tfidfKeywords, Some(tfidfKeywordsSql)),
    QueryDef("q88_bpe_pair_counts", bpePairCounts, Some(bpePairCountsSql)),
    QueryDef("q89_dupspan_fraction", dupSpanFraction, Some(dupSpanFractionSql)),
  )
}
