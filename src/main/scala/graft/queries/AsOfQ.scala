package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.AsOf
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** As-of join + sketch queries — operators beyond the reference surface.
  *
  * The as-of query's oracle uses DuckDB's NATIVE `ASOF LEFT JOIN`, so the
  * composed Spark formulation ([[graft.ops.AsOf]]) is checked against an
  * independent first-class implementation of the semantics — the strongest
  * cross-check in the suite.
  */
object AsOfQ {

  /** For each purchase event, the latest prior (or simultaneous) view by the
    * same user. Right side deduped to unique (user, ts) first — ties are
    * ambiguous in any engine.
    */
  def asofPurchaseView(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("view_ts_us"), col("event_id").as("view_id"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("view_ts_us"))
          .orderBy(col("view_id").desc)))
      .filter(col("rn") === 1).drop("rn")
    AsOf.join(purchases, views, key = "user_id",
      leftTime = "ts_us", rightTime = "view_ts_us",
      valueCols = Seq("view_id", "view_ts_us"))
  }

  private val asofPurchaseViewSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
      |), p AS (
      |  SELECT user_id, event_id AS purchase_id, ts_us FROM ev
      |  WHERE event_type = 'purchase'
      |), v AS (
      |  SELECT user_id, ts_us AS view_ts_us, event_id AS view_id FROM ev
      |  WHERE event_type = 'view'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts_us ORDER BY event_id DESC) = 1
      |)
      |SELECT p.user_id, p.purchase_id, p.ts_us,
      |  v.view_id AS asof_view_id, v.view_ts_us AS asof_view_ts_us
      |FROM p ASOF LEFT JOIN v
      |  ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us""".stripMargin

  /** Sketch aggregates — HLL distinct counts + approximate percentiles.
    * Approximation algorithms differ across engines by design, so this
    * carries no SQL oracle (driver records the weaker rows-only check); the
    * ScalaTest spec bounds the estimates against exact values instead.
    */
  def sketchAggregates(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey")).as("approx_orders"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        expr("percentile_approx(l_extendedprice, 0.5, 10000)").as("approx_median_price"),
        expr("percentile_approx(l_extendedprice, array(0.1, 0.9), 10000)")
          .getItem(1).as("approx_p90_price"))
  }

  /** Range join — click→purchase pairs by the same user within one hour,
    * via the bucketed composition ([[graft.ops.RangeJoin]]); the oracle uses
    * DuckDB's native range-predicate join, independently verifying bucket
    * exhaustiveness.
    */
  def rangeClickPurchase(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val ev = t.events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("click_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us").as("purchase_us"))
    graft.ops.RangeJoin.withinDelta(clicks, purchases, "user_id",
      "click_us", "purchase_us", delta = 3600000000L)
      // withinDelta is symmetric; the click→purchase attribution is
      // DIRECTED, so keep only purchases at-or-after the click
      .filter(col("purchase_us") >= col("click_us"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        (col("purchase_us") - col("click_us")).as("delta_us"))
  }

  private val rangeClickPurchaseSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
      |), c AS (
      |  SELECT user_id, event_id AS click_id, ts_us AS click_us FROM ev
      |  WHERE event_type = 'click'
      |), p AS (
      |  SELECT user_id, event_id AS purchase_id, ts_us AS purchase_us FROM ev
      |  WHERE event_type = 'purchase'
      |)
      |SELECT c.user_id, click_id, purchase_id,
      |  (purchase_us - click_us) AS delta_us
      |FROM c JOIN p ON c.user_id = p.user_id
      |WHERE purchase_us >= click_us
      |  AND purchase_us - click_us <= 3600000000""".stripMargin

  /** IVF approximate top-k (the ANN scale path): rows-only check here; the
    * ScalaTest spec measures recall against the exact brute-force baseline.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val all = t.embeddings.select(col("vec_id").as("id"), col("embedding").as("vec"))
    graft.ops.Similarity.ivfTopK(all.filter(col("id") < 20), all,
      k = 16, nProbe = 4, topK = 10)
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q47_asof_join", asofPurchaseView, Some(asofPurchaseViewSql)),
    QueryDef("q48_sketch_aggregates", sketchAggregates, None),
    QueryDef("q53_ann_ivf", annIvf, None),
    QueryDef("q54_range_join", rangeClickPurchase, Some(rangeClickPurchaseSql)),
  )
}
