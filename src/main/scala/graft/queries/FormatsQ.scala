package graft.queries

import graft.QueryDef
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

  private val jsonlRoundtripSql =
    "SELECT doc_id, text, lang, source, n_chars FROM documents"

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

  private val orcRoundtripSql =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_orderkey >= 1000 AND l_orderkey < 4000""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q93_jsonl_roundtrip", jsonlRoundtrip, Some(jsonlRoundtripSql)),
    QueryDef("q94_orc_roundtrip", orcRoundtrip, Some(orcRoundtripSql)),
  )
}
