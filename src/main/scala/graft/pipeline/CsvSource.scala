package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion with surrogate-key derivation (S3 + the loader leg).
  *
  * Re-expresses `rds/load_to_sqlserver.py:16-20,40-65,267-282`: read
  * all-string with header, normalize header names (lower/underscore), and
  * derive a deterministic SHA-256 surrogate `__pk` from the business keys —
  * or from the full concatenated row when keys are missing. Runs as a
  * distributed column expression, not the reference's pandas loop.
  */
object CsvSource {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "false")
      .csv(path)
    raw.toDF(raw.columns.toIndexedSeq.map(normalizeName): _*)
  }

  def normalizeName(c: String): String =
    c.trim.toLowerCase.replaceAll("[^a-z0-9]+", "_").replaceAll("^_|_$", "")

  /** Deterministic surrogate key: sha2 of business keys when all present,
    * else sha2 of the full row (null-safe, fixed column order).
    *
    * Each field is hashed individually before concatenation, so the combined
    * basis is a sequence of fixed-width hex blocks — field values containing
    * the separator cannot collide two distinct rows into one key (e.g.
    * ('a|b','c') vs ('a','b|c')), and nulls are distinguishable from any
    * real value.
    */
  def withSurrogatePk(df: DataFrame, businessKeys: Seq[String]): DataFrame = {
    def fieldHash(c: String): org.apache.spark.sql.Column =
      coalesce(md5(col(c).cast("string")), lit("null"))
    val keysPresent = businessKeys.forall(df.columns.contains)
    val allCols = df.columns.sorted.toIndexedSeq.map(fieldHash)
    val keyCols = businessKeys.map(fieldHash)
    val basis =
      if (keysPresent)
        when(businessKeys.map(col(_).isNotNull).reduce(_ && _),
          concat_ws("|", keyCols: _*))
          .otherwise(concat_ws("|", allCols: _*))
      else concat_ws("|", allCols: _*)
    df.withColumn("__pk", sha2(basis, 256))
  }
}
