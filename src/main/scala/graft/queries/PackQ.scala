package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-batch assembly operators — the step AFTER curation/dedup in an
  * LLM data pipeline: turning a cleaned corpus into fixed-token-budget
  * training sequences and compact integer embeddings.
  *
  * Beyond-reference surface (the reference stops at analytics; these are the
  * operations its data would need to feed a trainer), same category as
  * [[graft.ops.Dedup]] / [[graft.ops.Similarity]].
  */
object PackQ {

  /** q79 — concat-and-chunk sequence packing: documents are laid head-to-tail
    * in a deterministic order and cut into `budget`-token packs (the GPT-style
    * packing used to build fixed-length training batches; a doc can straddle
    * two packs — `pack_offset` is where it starts inside its pack).
    *
    * Scale shape: packing is SHARD-LOCAL — the window partitions by
    * (source, doc_id % 8), never globally, so there is no global sort and a
    * 1000-executor run packs shards independently (shard count would scale
    * with the corpus; 8 keeps sf0.01 packs non-trivial). The cumulative sum
    * is one window over each shard, order made unique by doc_id.
    *
    * Token counting matches q31 (whitespace split). `budget` is a power of
    * two, so `cum/2048.0` is EXACT in doubles and floor-division cannot
    * straddle an ulp across engines (QueryDef determinism rules).
    */
  def sequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    graft.ops.Pack.concatAndChunk(t.documents, idCol = "doc_id",
      groupCol = "source", budget = 2048, shards = 8)
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
  }

  private val sequencePackingSql = Oracles("pack", "sequencePacking")

  /** q80 — per-vector affine int8 quantization of the embedding column
    * (min/max → 0..255), the storage/serving compaction step for a trained
    * retrieval index: 4 bytes/dim float32 → 1 byte/dim + two doubles.
    *
    * Entirely map-side (one scan, no shuffle). Determinism: min/max are
    * exact float reads; each element's affine transform is the same IEEE
    * double expression in both engines, and `floor`'s integer-valued result
    * makes DuckDB's round-on-cast and Spark's truncate-on-cast agree. The
    * quantized vector crosses the oracle boundary as a comma-joined string
    * (unambiguous, hash-stable).
    */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.embeddings
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("mx", array_max(col("embedding")).cast("double"))
      .select(
        col("vec_id"), col("label"),
        col("mn").as("zero_point"),
        ((col("mx") - col("mn")) / lit(255.0)).as("scale"),
        when(col("mx") === col("mn"),
          expr("array_join(transform(embedding, x -> '0'), ',')"))
          .otherwise(expr(
            """array_join(transform(embedding, x ->
              |  CAST(CAST(LEAST(255.0, FLOOR(
              |    (CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn))) AS INT) AS STRING)),
              |  ',')""".stripMargin))
          .as("quant"))
  }

  private val embeddingQuantizeSql = Oracles("pack", "embeddingQuantize")

  /** q134 — padding-waste analysis of batch assembly (the dynamic-batching
    * question every training loader answers): batches of 32 docs per
    * shard, padded to the batch max length — how many pad tokens does
    * ARRIVAL-order batching burn vs LENGTH-SORTED batching? Per
    * (strategy, shard): batch count, real tokens, padded tokens, waste%.
    * Length-sorting collapses the per-batch max spread, so its waste is
    * structurally lower — this query puts an exact number on it.
    *
    * Scale shape: q79's shard-local discipline — `row_number` windows
    * partitioned by the hash shard (shards scale out; nothing global),
    * one hash agg per strategy over (shard, batch), then a tiny rollup.
    * All counts exact BIGINT; waste is reported as exact integer
    * parts-per-million (`waste_ppm`, the q125 `rate_u` convention) so the
    * oracle compare is bit-exact across engine versions — no float
    * rounding in the output at all.
    */
  def paddingWaste(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val d = t.documents
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(8L)).cast("int"))
    def strategy(name: String, order: Seq[org.apache.spark.sql.Column]) = d
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("shard")).orderBy(order: _*)))
      .withColumn("batch", expr("(rn - 1) div 32"))
      .groupBy(col("shard"), col("batch"))
      .agg(max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("real_tok"),
        count(lit(1)).as("n_docs"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_batches"),
        sum(col("real_tok")).as("real_tokens"),
        sum(col("max_len") * col("n_docs")).as("padded_tokens"))
      .withColumn("strategy", lit(name))
    strategy("arrival", Seq(col("doc_id")))
      .unionByName(strategy("sorted", Seq(col("n_tokens"), col("doc_id"))))
      .select(col("strategy"), col("shard"), col("n_batches"),
        col("real_tokens"), col("padded_tokens"),
        expr("(padded_tokens - real_tokens) * 1000000L div padded_tokens")
          .as("waste_ppm"))
  }

  private val paddingWasteSql = {
    def strat(name: String, order: String) =
      s"""SELECT '$name' AS strategy, shard,
         |  COUNT(*) AS n_batches, CAST(SUM(real_tok) AS BIGINT) AS real_tokens,
         |  CAST(SUM(max_len * n_docs) AS BIGINT) AS padded_tokens
         |FROM (
         |  SELECT shard, (rn - 1) // 32 AS batch,
         |    MAX(n_tokens) AS max_len, SUM(n_tokens) AS real_tok,
         |    COUNT(*) AS n_docs
         |  FROM (
         |    SELECT shard, n_tokens, doc_id,
         |      row_number() OVER (PARTITION BY shard ORDER BY $order) AS rn
         |    FROM d)
         |  GROUP BY shard, (rn - 1) // 32)
         |GROUP BY shard""".stripMargin
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
       |      AS n_tokens,
       |    CAST(doc_id % 8 AS INT) AS shard
       |  FROM documents),
       |res AS (
       |  ${strat("arrival", "doc_id")}
       |  UNION ALL
       |  ${strat("sorted", "n_tokens, doc_id")})
       |SELECT strategy, shard, n_batches, real_tokens, padded_tokens,
       |  CAST((padded_tokens - real_tokens) * 1000000 // padded_tokens
       |    AS BIGINT) AS waste_ppm
       |FROM res""".stripMargin
  }

  /** q158 — context-length fit curve: for each candidate max-sequence
    * length, how many documents fit whole and what token share survives
    * truncation — the planning table behind "train at 512 or 2048?"
    * (q134 prices PADDING at a fixed batch shape; this prices
    * TRUNCATION across candidate context lengths — the other half of
    * the sequence-budget tradeoff).
    *
    * Scale shape: one map pass computes token counts, a 5-literal
    * `explode` fans each doc across the candidate lengths map-side
    * (never a join), and one 5-group hash agg finishes. All counts
    * exact BIGINT; the truncated share is integer ppm.
    */
  def contextFit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .select(col("n_tokens"), explode(array(
        lit(128L), lit(256L), lit(512L), lit(1024L), lit(2048L))).as("ctx_len"))
      .groupBy(col("ctx_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") <= col("ctx_len"), 1L).otherwise(0L)).as("n_fit"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(least(col("n_tokens"), col("ctx_len"))).as("kept_tokens"))
      .select(col("ctx_len"), col("n_docs"), col("n_fit"),
        col("total_tokens"), col("kept_tokens"),
        expr("(total_tokens - kept_tokens) * 1000000L div total_tokens")
          .as("trunc_ppm"))
  }

  private val contextFitSql = Oracles("pack", "contextFit")

  /** q164 — sliding-window CHUNKING: split each document's token stream
    * into 64-token context windows with stride 48 (16-token overlap) —
    * the chunk table that feeds embedding/retrieval indexing and
    * fixed-context pretraining (q79 packs whole docs INTO a budget; this
    * SPLITS docs that exceed one). Every document yields ≥1 chunk; the
    * last chunk is short rather than dropped (no token is lost — the
    * overlap guarantees continuity across boundaries).
    *
    * Chunk-count arithmetic is `1 + (greatest(0, n−64) + 47) div 48`,
    * keeping the dividend NON-NEGATIVE — Spark `div` truncates toward
    * zero while DuckDB `//` floors, so a negative dividend would
    * silently disagree (the q154 +OFFSET lesson, solved here by
    * clamping instead of shifting).
    *
    * Scale shape: one map pass (tokenize → count), a per-doc `sequence`
    * explode whose fan-out is the doc's own chunk count (data-
    * proportional, never a join), zero shuffles — chunking is
    * embarrassingly parallel and stays that way at any scale.
    */
  def docChunks(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .withColumn("n_chunks",
        expr("1L + (greatest(0L, n - 64) + 47) div 48"))
      .select(col("doc_id"), col("n"), col("n_chunks"),
        explode(expr("sequence(0L, n_chunks - 1)")).as("i"))
      .select(col("doc_id"),
        (col("i") + 1L).as("chunk_id"),
        (col("i") * 48L + 1L).as("start_tok"),
        least(lit(64L), col("n") - col("i") * 48L).as("chunk_len"),
        col("n_chunks"))
  }

  private val docChunksSql = Oracles("pack", "docChunks")

  /** q171 — QUANTIZATION ERROR audit: reconstruct q80's int8-quantized
    * embeddings (`x̂ = mn + q·scale`) and report per-label mean/max
    * absolute reconstruction error — the "is int8 storage safe for this
    * index" check that accompanies any quantized-embedding rollout
    * (q80 floor-quantizes, so |err| < one step = (mx−mn)/255 and the
    * mean sits near step/2; a label whose max error breaks the step
    * bound has outlier dimensions that need per-dim or asymmetric
    * quantization — CurationQueriesSpec pins the bound).
    *
    * Determinism: per-element |err| is integer NANO units via
    * `floor(|err|·10⁹ + 0.5)` (explicit half-up — engine `round()`
    * half-rule differences can't bite), so every sum is an order-free
    * BIGINT fold; nothing float survives past the element expression.
    * Degenerate flat vectors (mx = mn) reconstruct exactly (err 0),
    * guarded before the division on both engines.
    *
    * Scale shape: entirely map-side per vector (one scan, the q80
    * plan) into one label-keyed hash agg.
    */
  def quantError(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.embeddings
      .withColumn("dv", col("embedding").cast("array<double>"))
      .withColumn("mn", array_min(col("embedding")).cast("double"))
      .withColumn("mx", array_max(col("embedding")).cast("double"))
      .withColumn("earr", expr(
        """CASE WHEN mx = mn THEN array(0L)
          |ELSE transform(dv, x -> CAST(floor(abs(
          |  x - (mn + LEAST(255.0, FLOOR((x - mn) * 255.0 / (mx - mn)))
          |       * ((mx - mn) / 255.0))) * 1000000000.0 + 0.5) AS BIGINT))
          |END""".stripMargin))
      .select(col("label"),
        expr("aggregate(earr, 0L, (a, x) -> a + x)").as("s_abs"),
        array_max(col("earr")).as("m_abs"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("s_abs")).as("sum_abs"),
        max(col("m_abs")).as("max_abs_err_nano"))
      .select(col("label"), col("n_vecs"),
        expr("sum_abs div (n_vecs * 64)").as("mean_abs_err_nano"),
        col("max_abs_err_nano"))
  }

  private val quantErrorSql = Oracles("pack", "quantError")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q171_quant_error", quantError, Some(quantErrorSql)),
    QueryDef("q164_doc_chunks", docChunks, Some(docChunksSql)),
    QueryDef("q79_sequence_packing", sequencePacking, Some(sequencePackingSql)),
    QueryDef("q80_embedding_quantize", embeddingQuantize, Some(embeddingQuantizeSql)),
    QueryDef("q134_padding_waste", paddingWaste, Some(paddingWasteSql)),
    QueryDef("q158_context_fit", contextFit, Some(contextFitSql)),
  )
}
