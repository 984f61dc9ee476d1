package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity-search query surface over `embeddings` (64-dim float
  * vectors): brute-force cosine top-k baseline + embedding-cosine near-dup
  * pairs, both DuckDB-oracle-checked; the LSH scale path lives in
  * [[graft.ops.Similarity.lshNearDupPairs]] (covered by ScalaTest against
  * the exact baseline rather than SQL).
  */
object SimilarityQ {

  /** Brute-force cosine top-10 for query vectors vec_id < 20. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val all = t.embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
    Similarity.bruteForceTopK(all.filter(col("id") < 20), all, k = 10)
  }

  private val annTopKSql =
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
      |), n AS (
      |  SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM v
      |), scored AS (
      |  SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id,
      |    round(list_dot_product(q.dv, c.dv) / (q.nrm * c.nrm), 4) AS sim
      |  FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id
      |)
      |SELECT q_id, neighbor_id, sim,
      |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, neighbor_id) AS INT) AS rank
      |FROM scored
      |QUALIFY rank <= 10""".stripMargin

  /** Exact embedding-cosine near-duplicate pairs (cosine ≥ 0.35 — chosen
    * above the corpus's p99.9 pairwise cosine so the output is the
    * interesting tail, not empty and not quadratic).
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Similarity.exactNearDupPairs(
      t.embeddings.select(col("vec_id").as("id"), col("embedding").as("vec")),
      minCosine = 0.35)
  }

  private val embeddingNearDupSql =
    """WITH v AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS dv FROM embeddings
      |), n AS (
      |  SELECT vec_id, dv, sqrt(list_dot_product(dv, dv)) AS nrm FROM v
      |)
      |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  round(list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm), 4) AS cosine
      |FROM n a JOIN n b ON a.vec_id < b.vec_id
      |WHERE round(list_dot_product(a.dv, b.dv) / (a.nrm * b.nrm), 4) >= 0.35""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q40_ann_topk", annTopK, Some(annTopKSql)),
    QueryDef("q41_embedding_neardup", embeddingNearDup, Some(embeddingNearDupSql)),
  )
}
