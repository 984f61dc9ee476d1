package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Interchange-format round trips beyond parquet/CSV/JDBC: JSON-lines and
  * ORC sink → source, each proven lossless against the ORIGINAL parquet
  * through the DuckDB oracle (the q74 layout-roundtrip proof shape). The
  * reference's stack moves data through CSV, JDBC and parquet; a user
  * swapping in this engine also gets the other two Spark-native
  * interchange formats with the same correctness guarantee.
  */
object FormatsQ {

  /** Session-scratch dir, deleted on JVM exit — repeated bench/CI sessions
    * must not accumulate orphaned round-trip data on disk.
    */
  private def scratchDir(prefix: String): String = graft.core.Scratch.dir(prefix)

  /** q93 — JSONL round trip: documents written as JSON lines (strings with
    * embedded newlines are escaped, not split — the property a naive text
    * sink gets wrong), read back through an EXPLICIT schema (inference
    * could widen types between runs), and hash-compared to the source
    * table. Long/string columns only — float-through-text is not part of
    * the determinism contract.
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tmp = graft.core.Memo.cached(spark, s"q93-jsonl:$dir") {
      val p = scratchDir("graft-jsonl") + "/docs"
      t.documents.select(col("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars"))
        .coalesce(4).write.mode("overwrite").json(p)
      p
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.read.schema(schema).json(tmp)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
  }

  private val jsonlRoundtripSql = Oracles("formats", "jsonlRoundtrip")

  /** q94 — ORC round trip with a pushed predicate: a lineitem projection
    * written as ORC, read back through a key-range filter (reaches the ORC
    * reader as a search argument — stripe-level skipping, ORC's analog of
    * q74's parquet row-group pruning), hash-compared to DuckDB filtering
    * the original parquet. Doubles survive exactly — ORC is binary, no
    * float-through-text.
    */
  def orcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val tmp = graft.core.Memo.cached(spark, s"q94-orc:$dir") {
      val p = scratchDir("graft-orc") + "/li"
      t.lineitem.select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
        .coalesce(4).write.mode("overwrite").orc(p)
      p
    }
    spark.read.orc(tmp)
      .filter(col("l_orderkey") >= 1000L && col("l_orderkey") < 4000L)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"))
  }

  private val orcRoundtripSql = Oracles("formats", "orcRoundtrip")

  /** q135 — parquet SCHEMA EVOLUTION round trip: generation 1 of a table
    * (even doc_ids) lands without a `quality` column, generation 2 (odd
    * doc_ids) adds it; a `mergeSchema` read unifies both generations and
    * gen-1 rows surface the added column as NULL — the
    * additive-evolution contract long-lived 100-TB tables depend on
    * (rewriting history to add a column is the thing you can NOT do).
    * The oracle reconstructs the merged view from the source table, so a
    * green row proves footer merging, column backfill-as-null, and type
    * agreement across generations.
    */
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val root = graft.core.Memo.cached(spark, s"q135-evo:$dir") {
      val p = scratchDir("graft-evo")
      val base = t.documents.select(col("doc_id"), col("lang"), col("n_chars"))
      base.filter(col("doc_id") % 2 === 0)
        .coalesce(2).write.mode("overwrite").parquet(s"$p/gen1")
      base.filter(col("doc_id") % 2 === 1)
        .withColumn("quality", (col("n_chars") % 100).cast("long"))
        .coalesce(2).write.mode("overwrite").parquet(s"$p/gen2")
      p
    }
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen1", s"$root/gen2")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("quality"))
  }

  private val schemaEvolutionSql = Oracles("formats", "schemaEvolution")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q93_jsonl_roundtrip", jsonlRoundtrip, Some(jsonlRoundtripSql)),
    QueryDef("q94_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
    QueryDef("q135_schema_evolution", schemaEvolution, Some(schemaEvolutionSql)),
  )
}
