package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Exact
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational core: scans, filters, joins, aggregations, set ops.
  *
  * Re-expresses the reference pipeline's relational surface (SURVEY.md §2.2
  * P1–P9, §2.3 J1–J3, §2.4 A1–A14, §2.7) over the TESTDATA star schema.
  * Reference citations point into /root/reference/.
  *
  * Scale posture: every aggregation here is a hash aggregate with map-side
  * partials; dimension joins are explicitly `broadcast()`; fact-fact joins
  * shuffle on their equi-keys and stay AQE-re-plannable. No driver-side
  * loops, no collect() in any plan.
  */
object Relational {

  /** A3/A10 analog — pricing summary (grouped exact aggregates over the fact
    * table). Mirrors `go-metric-elt.py:66-74`'s sum/count/avg/min/max shape.
    * Filter is pushed into the parquet scan.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the 128-bit decimal partial agg is the hot stage; on the
    // single-split testdata it serialized on one thread (measured 9 s →
    // 2.8 s spread). Filter + pruning still reach the scan below it.
    Tables.spread(t.lineitem)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Exact.dsum(col("l_quantity")).as("sum_qty"),
        Exact.dsum(col("l_extendedprice")).as("sum_base_price"),
        Exact.dsum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        Exact.davg(col("l_quantity")).as("avg_qty"),
        Exact.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  private val pricingSummarySql = Oracles("relational", "pricingSummary")

  /** J1 analog — fact⋈fact left equi-join then per-order rollup
    * (`go-quality-elt.py:262-267`). No manual repartition: Catalyst+AQE plan
    * the exchange (SURVEY.md §4 notes the reference's repartition(160) is
    * unnecessary).
    */
  def orderLineitemJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Aggregate BELOW the join (guide §2.3): the rollup keys on the join
    // key, so lineitem reduces to one narrow row per order BEFORE the
    // exchange — partial aggregation collapses the fact side map-side and
    // the join moves |orders|+|orders| rows instead of |orders|+|lineitem|
    // (Catalyst has no aggregate-through-join pushdown; done by hand).
    // Row-for-row identical: count(l_linenumber) counts the same non-null
    // linenumbers per order, unmatched orders coalesce to (0, 0.0) exactly
    // as the joined-then-grouped nulls did, and Exact.dsum groups over the
    // same row set either way.
    val perOrder = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(
        count(col("l_linenumber")).as("__n"),
        Exact.dsum(col("l_extendedprice")).as("__v"))
    t.orders.select(col("o_orderkey"))
      .join(perOrder, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("__n"), lit(0L)).as("n_items"),
        coalesce(col("__v"), lit(0.0)).as("items_value"))
  }

  private val orderLineitemJoinSql = Oracles("relational", "orderLineitemJoin")

  /** J2 analog — snowflake dimension enrichment via broadcast joins
    * (`go-quality-elt.py:288-291` joins a 365-row date_dim; here
    * customer⋈nation⋈region). Dims are broadcast: zero shuffle of the fact
    * side for the join itself.
    */
  def regionRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        Exact.dsum(col("c_acctbal")).as("total_acctbal"),
        Exact.davg(col("c_acctbal")).as("avg_acctbal"))
  }

  private val regionRollupSql = Oracles("relational", "regionRollup")

  /** P4/P7/U5 analog — data-quality rule flags + severity
    * (`go-quality-elt.py:108-123,144-168`): price/quantity range rules, 2
    * violations ⇒ high, 1 ⇒ low; only flagged rows emitted (the quarantine
    * side of the severity split).
    */
  def qualityRules(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val priceIssue = col("l_extendedprice").isNull ||
      col("l_extendedprice") <= 0.0 || col("l_extendedprice") > 100000.0
    val qtyIssue = col("l_quantity").isNull ||
      col("l_quantity") <= 0.0 || col("l_quantity") > 47.0
    t.lineitem
      .withColumn("price_issue", priceIssue)
      .withColumn("qty_issue", qtyIssue)
      .withColumn("severity",
        when(col("price_issue") && col("qty_issue"), "high")
          .when(col("price_issue") || col("qty_issue"), "low")
          .otherwise("none"))
      .filter(col("severity") =!= "none")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
        col("l_quantity"), col("price_issue"), col("qty_issue"), col("severity"))
  }

  private val qualityRulesSql = Oracles("relational", "qualityRules")

  /** A1 analog — EXCEPT DISTINCT set difference (`go-quality-elt.py:135-136`
    * uses `subtract` for quarantine removal; the surprise-dedupe semantics is
    * pinned here deliberately).
    */
  def exceptDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.filter(col("l_quantity") >= 49.0).select(col("l_partkey"))
      .except(t.lineitem.filter(col("l_quantity") <= 2.0).select(col("l_partkey")))
  }

  private val exceptDistinctSql = Oracles("relational", "exceptDistinct")

  /** A1-alternative — left_anti join (SURVEY.md §2.3 notes `left_anti` as the
    * scalable replacement for `subtract`): orders with no returned line.
    */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .join(t.lineitem.filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_totalprice"))
  }

  private val antiJoinSql = Oracles("relational", "antiJoin")

  /** Set-op coverage (§2.7): INTERSECT DISTINCT — event users that are known
    * customers.
    */
  def intersectUsers(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.select(col("user_id"))
      .intersect(t.customer.select(col("c_custkey").as("user_id")))
  }

  private val intersectUsersSql = Oracles("relational", "intersectUsers")

  /** Set-op coverage (§2.7): UNION ALL across heterogeneous sources (the
    * consumer's `pd.concat` read-side union, `go_streamlit.py:55`).
    */
  def unionSources(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(col("doc_id").as("id"), lit("doc").as("src"))
      .unionAll(t.embeddings.select(col("vec_id").as("id"), lit("vec").as("src")))
  }

  private val unionSourcesSql = Oracles("relational", "unionSources")

  /** A2 analog — derived per-row revenue (`go-metric-elt.py:57-61`'s
    * null-safe coalesce arithmetic). Pure projection: stays in whole-stage
    * codegen, zero shuffle.
    */
  def revenueDerived(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      ((col("l_extendedprice") * (lit(1.0) - coalesce(col("l_discount"), lit(0.0))))
        * (lit(1.0) + coalesce(col("l_tax"), lit(0.0)))).as("revenue"))
  }

  private val revenueDerivedSql = Oracles("relational", "revenueDerived")

  /** A3 analog — CLV per customer (`go-metric-elt.py:66-74`). */
  def clv(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_custkey"))
      .agg(
        min(col("o_orderdate").cast("date")).as("first_order"),
        max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("n_orders"),
        Exact.dsum(col("o_totalprice")).as("revenue"),
        Exact.davg(col("o_totalprice")).as("avg_order_value"))
  }

  private val clvSql = Oracles("relational", "clv")

  /** A4/A5/J3 analog — per-segment percentile thresholds joined back to tag
    * CLV buckets. Replaces the reference's driver-side per-restaurant
    * `approxQuantile` loop (`go-metric-elt.py:83-95`, N+1 Spark jobs — the
    * scalability cliff SURVEY.md §4 flags) with ONE distributed exact
    * `percentile` aggregation + a broadcast join of the tiny threshold table.
    */
  def clvBuckets(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // checkpoint: perCust feeds BOTH the threshold broadcast build and
    // the final probe — un-persisted, the orders join + agg executed
    // twice (broadcast builds don't share exchanges; q151/q139 pattern).
    // Customer-grain and reused — the guide-§5 persist case.
    val perCust = t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey"), col("c_mktsegment"))
      .agg(Exact.dsum(col("o_totalprice")).as("clv"))
      .localCheckpoint(true)
    // one array-percentile buffer per segment instead of two (round-19)
    val thresholds = perCust
      .groupBy(col("c_mktsegment"))
      .agg(expr("percentile(clv, array(0.2, 0.8))").as("th"))
      .select(col("c_mktsegment"),
        col("th").getItem(0).as("low_th"), col("th").getItem(1).as("high_th"))
    perCust.join(broadcast(thresholds), Seq("c_mktsegment"))
      .select(col("o_custkey"), col("c_mktsegment"), col("clv"),
        when(col("clv") >= col("high_th"), "High CLV")
          .when(col("clv") <= col("low_th"), "Low CLV")
          .otherwise("Medium CLV").as("clv_bucket"))
  }

  private val clvBucketsSql = Oracles("relational", "clvBuckets")

  /** A6/A7/A8 analog — RFM with deterministic snapshot date
    * (`go-metric-elt.py:104-120`; the reference's driver-side
    * `agg(max).collect()` snapshot is replaced by a pinned literal — at scale
    * you'd compute it as a 1-row broadcast, never a driver round-trip).
    */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_custkey"))
      .agg(
        datediff(lit("2001-08-02").cast("date"), max(col("o_orderdate").cast("date"))).as("recency_days"),
        count(lit(1)).as("frequency"),
        Exact.dsum(col("o_totalprice")).as("monetary"))
      .withColumn("segment",
        when(col("recency_days") <= 90 && col("frequency") >= 12, "VIP")
          .when(col("recency_days") <= 180, "Active")
          .when(col("frequency") <= 5, "Churn Risk")
          .otherwise("Other"))
  }

  private val rfmSql = Oracles("relational", "rfm")

  /** A11 analog — two-level rollup preserving the reference's avg-of-avgs
    * semantics (`go-metric-elt.py:214-232`; deliberately NOT weighted —
    * SURVEY.md §2.4 pins this). Second-level avg of doubles is rounded(6) on
    * both sides to absorb summation-order ulps.
    */
  def loyaltyRollup(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(Exact.davg(col("o_totalprice")).as("avg_order_value"),
        Exact.dsum(col("o_totalprice")).as("cust_total"))
      .groupBy(col("o_orderpriority"))
      .agg(
        round(avg(col("avg_order_value")), 6).as("avg_of_customer_avgs"),
        Exact.dsum(col("cust_total")).as("total_revenue"),
        count(lit(1)).as("n_customers"))
  }

  private val loyaltyRollupSql = Oracles("relational", "loyaltyRollup")

  /** A12/W4 analog — top locations with countDistinct + global ranking
    * (`go-metric-elt.py:237-249`). The rank window is over the 25-row
    * aggregate, not the fact table — at 100 TB the agg output is still tiny,
    * so the single-partition window is safe here (unlike the reference's
    * W4 over raw rows, flagged in SURVEY.md §2.5).
    */
  def topNations(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread A/B'd and REJECTED here too (round-19, the q15 lesson): the
    // Expand×4 partial agg single-task stage is 0.6 s, but round-robining
    // the orders scan first measured 1.85 → 2.40 s median-of-3 — the
    // pre-exchange of the full scan costs more than the single-task
    // partial saves; at production split counts the stage parallelizes by
    // itself
    val agg = t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        Exact.dsum(col("o_totalprice")).as("total_revenue"),
        countDistinct(col("o_custkey")).as("n_customers"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        countDistinct(col("o_orderdate").cast("date")).as("active_days"))
      .withColumn("orders_per_day", col("n_orders") / col("active_days"))
    agg.withColumn("rank",
      row_number().over(Window.orderBy(col("total_revenue").desc, col("n_name"))))
  }

  private val topNationsSql = Oracles("relational", "topNations")

  /** A13 analog — discount effectiveness (`go-metric-elt.py:254-263`).
    *
    * Two-level aggregate instead of `countDistinct` mixed with the decimal
    * sums: mixing distinct and plain aggregates makes Spark Expand every
    * row ×2 and run the distinct through its own shuffle (measured 5 s for
    * a 2-row result at sf0.1). Aggregating first on (flag, orderkey) gets
    * map-side combine on the natural key, the distinct count becomes a
    * plain `count(*)` over level-1 groups, and the decimal partials re-sum
    * exactly (decimal addition is associative) — bit-identical output,
    * one Expand-free pass. ~0.6 s same data.
    */
  def discountEffect(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val money4 = org.apache.spark.sql.types.DecimalType(18, 4)
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    // spread A/B'd and REJECTED here (round-19): the (is_discounted,
    // orderkey) partial agg reduces 600k rows to ~150k map-side, so a
    // round-robin pre-exchange costs more than the single-task partial
    // saves (2.44 s → 2.7–2.9 s measured). The scan-task partial is the
    // cheaper shape; at production split counts the stage parallelizes
    // by itself.
    t.lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .withColumn("is_discounted", col("l_discount") >= 0.05)
      .groupBy(col("is_discounted"), col("l_orderkey"))
      .agg(
        count(lit(1)).as("n_lines_p"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(money4))
          .as("rev_p"),
        sum(col("l_discount").cast(money)).as("disc_p"),
        count(col("l_discount")).as("n_disc_p"))
      .groupBy(col("is_discounted"))
      .agg(
        sum(col("n_lines_p")).as("n_lines"),
        sum(col("rev_p")).cast("double").as("net_revenue"),
        count(lit(1)).as("n_orders"),
        (sum(col("disc_p")).cast("double") / sum(col("n_disc_p"))).as("avg_discount"))
  }

  private val discountEffectSql = Oracles("relational", "discountEffect")

  /** §2.6 — top-k: `TakeOrderedAndProject` (orderBy+limit), the scalable form
    * of the consumer's `sort_values().head(10)` (`go_streamlit.py:163-177`).
    * Unique tiebreaker pins determinism.
    */
  def topkOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
  }

  private val topkOrdersSql = Oracles("relational", "topkOrders")

  /** P3 analog — canonical-schema projection: missing columns appear as typed
    * nulls, fixed order, casts applied (`go-quality-elt.py:206-225`
    * `rearrange_columns_typed`).
    */
  def schemaCanonicalize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    graft.ops.SchemaOps.rearrangeColumnsTyped(
      t.documents,
      Seq(
        "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint",
        "quality_score" -> "double", "ingest_note" -> "string"))
  }

  private val schemaCanonicalizeSql = Oracles("relational", "schemaCanonicalize")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q01_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    QueryDef("q02_order_lineitem_join", orderLineitemJoin, Some(orderLineitemJoinSql)),
    QueryDef("q03_region_rollup", regionRollup, Some(regionRollupSql)),
    QueryDef("q04_quality_rules", qualityRules, Some(qualityRulesSql)),
    QueryDef("q05_except_distinct", exceptDistinct, Some(exceptDistinctSql)),
    QueryDef("q06_anti_join", antiJoin, Some(antiJoinSql)),
    QueryDef("q07_intersect_users", intersectUsers, Some(intersectUsersSql)),
    QueryDef("q08_union_sources", unionSources, Some(unionSourcesSql)),
    QueryDef("q09_revenue_derived", revenueDerived, Some(revenueDerivedSql)),
    QueryDef("q10_clv", clv, Some(clvSql)),
    QueryDef("q11_clv_buckets", clvBuckets, Some(clvBucketsSql)),
    QueryDef("q12_rfm", rfm, Some(rfmSql)),
    QueryDef("q13_loyalty_rollup", loyaltyRollup, Some(loyaltyRollupSql)),
    QueryDef("q14_top_nations", topNations, Some(topNationsSql)),
    QueryDef("q15_discount_effect", discountEffect, Some(discountEffectSql)),
    QueryDef("q16_topk_orders", topkOrders, Some(topkOrdersSql)),
    QueryDef("q17_schema_canonicalize", schemaCanonicalize, Some(schemaCanonicalizeSql)),
  )
}
