package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst can push filters and prune
  * columns into the scan (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). Nothing is cached here — query plans decide.
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    * default ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos
    * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a micros
    * timestamp — exact, since the generator emits micro-aligned values
    * (verified ns%1000==0). Queries expose time as `unix_micros` bigints so
    * the DuckDB compare is integer-exact.
    */
  def events: DataFrame =
    eventsRaw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Raw events with `ts` as int64 epoch-nanos — predicates against this
    * column push into the parquet scan (row-group pruning via int64 stats),
    * which the converted-timestamp view can't do. Watermark filters should
    * use this (see [[graft.queries.WindowsQ.incrementalSlice]]).
    */
  def eventsRaw: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events")
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
