package graft.queries

import graft.QueryDef
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

  private val sequencePackingSql =
    """WITH toks AS (
      |  SELECT doc_id, source,
      |    CAST(doc_id % 8 AS INT) AS shard,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS n_tokens
      |  FROM documents),
      |cum AS (
      |  SELECT *,
      |    CAST(COALESCE(SUM(n_tokens) OVER (
      |      PARTITION BY source, shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS cum_before
      |  FROM toks)
      |SELECT doc_id, source, shard, n_tokens,
      |  CAST(FLOOR(cum_before / 2048.0) AS BIGINT) AS pack_id,
      |  CAST(cum_before % 2048 AS BIGINT) AS pack_offset
      |FROM cum""".stripMargin

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

  private val embeddingQuantizeSql =
    """WITH mm AS (
      |  SELECT vec_id, label, embedding,
      |    CAST(list_min(embedding) AS DOUBLE) AS mn,
      |    CAST(list_max(embedding) AS DOUBLE) AS mx
      |  FROM embeddings)
      |SELECT vec_id, label,
      |  mn AS zero_point,
      |  (mx - mn) / 255.0 AS scale,
      |  CASE WHEN mx = mn
      |    THEN array_to_string(list_transform(embedding, x -> '0'), ',')
      |    ELSE array_to_string(list_transform(embedding, x ->
      |      CAST(CAST(LEAST(255.0, FLOOR(
      |        (CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn))) AS INT) AS VARCHAR)), ',')
      |  END AS quant
      |FROM mm""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q79_sequence_packing", sequencePacking, Some(sequencePackingSql)),
    QueryDef("q80_embedding_quantize", embeddingQuantize, Some(embeddingQuantizeSql)),
  )
}
