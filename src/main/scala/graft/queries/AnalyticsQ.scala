package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Warehouse-analytics operators beyond the reference's fixed dashboards:
  * cohort retention (the canonical "did the customer come back"
  * matrix the reference's RFM/activity views approximate), first-order
  * Markov transitions over event streams (the sequence model the funnel
  * q96 is a special case of), and a Benford leading-digit audit (data-
  * quality forensics for financial columns — the statistical sibling of
  * the QA rule predicates P4).
  *
  * Scale posture: every query aggregates FIRST (hash aggs with map-side
  * combine over high-cardinality keys) and runs windows only over the
  * already-aggregated tables — the q87 lesson. No driver state, no
  * cartesian products, no unpartitioned windows over raw facts.
  */
object AnalyticsQ {

  /** q110 — cohort retention matrix: customers bucketed by first-order
    * month (integer year*12+month arithmetic — no interval semantics to
    * drift between engines), counted in each subsequent activity month,
    * with per-cohort size and retention rate.
    *
    * Plan shape: distinct (customer, month) pairs via hash agg (map-side
    * combine collapses a customer's orders inside a month before the
    * shuffle), cohort = min(month) as a WINDOW over that already-distinct
    * table (one shuffle on customer), then a tiny (cohort, offset) hash
    * agg; cohort_size joins back as a window over the ~400-row result.
    * At 100 TB the only full-data shuffle is the first distinct, keyed by
    * customer — the natural key.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val act = t.orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"))
      .distinct()
    val coh = act.withColumn("cohort_ym",
      min(col("ym")).over(Window.partitionBy(col("o_custkey"))))
    val ret = coh
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
      .agg(count(lit(1)).as("n_customers"))
    ret
      .withColumn("cohort_size",
        max(when(col("month_offset") === 0, col("n_customers")))
          .over(Window.partitionBy(col("cohort_ym"))))
      .select(
        expr("(cohort_ym - 1) div 12").cast("int").as("cohort_year"),
        (expr("(cohort_ym - 1) % 12") + 1).cast("int").as("cohort_mon"),
        col("month_offset"),
        col("n_customers"),
        col("cohort_size"),
        round(col("n_customers").cast("double") / col("cohort_size"), 6)
          .as("retention_rate"))
  }

  private val cohortRetentionSql = Oracles("analytics", "cohortRetention")

  /** q112 — first-order Markov transition matrix over per-user event
    * sequences: P(next event type | current event type). The lead() runs
    * per user (high-cardinality partition, `event_id` tiebreak per the
    * suite's window rule); the transition counts then collapse to a
    * |types|² table, and the row-normalizing denominator is a window over
    * THAT tiny table — raw events shuffle exactly once, on user_id.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cnt = t.events
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    cnt
      .withColumn("n_from",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("p", round(col("n").cast("double") / col("n_from"), 6))
  }

  private val markovTransitionsSql = Oracles("analytics", "markovTransitions")

  /** q115 — Benford leading-digit audit of `o_totalprice`: observed
    * first-digit distribution vs the Benford expectation log10(1 + 1/d).
    *
    * The leading digit comes from the DECIMAL(18,2) string rendering (both
    * engines print plain fixed-point, never scientific), NOT from
    * floor(log10) arithmetic — at exact powers of ten a one-ULP libm
    * difference would misclassify the digit. All prices exceed 1, so the
    * first character is always a digit. One scan, one 9-row hash agg; the
    * normalizing total is a window over the 9-row result.
    */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val obs = t.orders
      .select(substring(col("o_totalprice").cast("decimal(18,2)").cast("string"),
        1, 1).cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(Window.partitionBy()))
    obs
      .withColumn("observed_p", round(col("n").cast("double") / col("total"), 6))
      .withColumn("expected_p",
        round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("abs_dev",
        round(abs(col("observed_p") - col("expected_p")), 6))
      .select(col("digit"), col("n"), col("total"), col("observed_p"),
        col("expected_p"), col("abs_dev"))
  }

  private val benfordAuditSql = Oracles("analytics", "benfordAudit")

  /** q132 — ABC / Pareto classification of parts by revenue (the
    * inventory-analytics standard: A = parts covering the top 70% of
    * cumulative revenue, B = to 90%, C = the tail). All in exact cents:
    * per-part revenue as BIGINT, cumulative sum over ONE global window —
    * but over the AGGREGATED per-part table (dimension-sized, the only
    * place a global order is semantically required; raw lineitem never
    * sorts) — and class boundaries as cross-multiplied integer compares
    * (`cum·10 ≤ total·7`), so no float ever decides a class. Unique
    * (revenue desc, partkey) ordering makes the running sum and classes
    * engine-invariant.
    *
    * Scale note: the running sum funnels the aggregated table through
    * one window partition — correct while the part catalog is
    * dimension-sized (10⁶–10⁷). For a billion-key catalog the same
    * semantics run as two-phase prefix sums: range-partition by rev_u
    * desc, partial sums per partition, broadcast the per-partition
    * offsets (the `Skew.twoPhaseAgg` pattern applied to a prefix scan).
    */
  def abcClassification(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val money = org.apache.spark.sql.types.DecimalType(14, 2)
    val perPart = t.lineitem
      .groupBy(col("l_partkey"))
      .agg((sum(col("l_extendedprice").cast(money)) * 100).cast("long").as("rev_u"))
    val w = Window.orderBy(col("rev_u").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = perPart.agg(sum(col("rev_u")).as("total_u"))
    perPart
      .withColumn("cum_u", sum(col("rev_u")).over(w))
      .crossJoin(broadcast(total))
      .select(col("l_partkey"),
        (col("rev_u") / 100.0).as("revenue"),
        col("cum_u"),
        when(col("cum_u") * 10 <= col("total_u") * 7, "A")
          .when(col("cum_u") * 10 <= col("total_u") * 9, "B")
          .otherwise("C").as("abc_class"))
  }

  private val abcClassificationSql = Oracles("analytics", "abcClassification")

  /** q141 — deterministic A/B experiment readout: customers hash-assigned
    * to arms (md5 % 2 — the same engine-portable assignment q57's
    * sampling uses, so a rerun or a different engine produces the SAME
    * split), order revenue aggregated per (mktsegment, arm) in exact
    * decimal, and the readout = per-segment treatment-vs-control mean
    * delta and relative lift. Everything before the two final divisions
    * is exact integers/decimals; the divisions are deterministic IEEE.
    * One fact⋈dim broadcast join + one hash agg + a 5-row self-merge —
    * the analysis shape experiment platforms run at any scale.
    */
  def abReadout(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val assigned = t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .withColumn("arm",
        when(pmod(graft.ops.Dedup.hash60(col("o_custkey").cast("string")),
          lit(2L)) === 0, "control").otherwise("treatment"))
    // per feeds BOTH arm filters — un-persisted, the orders⋈customer agg
    // subtree executed twice (r19 plan audit: orders+customer scanned 2×
    // each). Checkpoint: (segment × arm)-grain, ≤ 2·|segments| rows.
    val per = assigned.groupBy(col("c_mktsegment"), col("arm"))
      .agg(graft.ops.Exact.dsum(col("o_totalprice")).as("rev"),
        count(lit(1)).as("n"))
      .withColumn("mean_rev", round(col("rev") / col("n"), 6))
      .localCheckpoint(true)
    val c = per.filter(col("arm") === "control")
      .select(col("c_mktsegment"), col("mean_rev").as("control_mean"),
        col("n").as("n_control"))
    val tr = per.filter(col("arm") === "treatment")
      .select(col("c_mktsegment"), col("mean_rev").as("treatment_mean"),
        col("n").as("n_treatment"))
    c.join(broadcast(tr), Seq("c_mktsegment")) // 5-row arm tables
      .select(col("c_mktsegment"), col("n_control"), col("n_treatment"),
        col("control_mean"), col("treatment_mean"),
        round(col("treatment_mean") - col("control_mean"), 6).as("delta"),
        round((col("treatment_mean") - col("control_mean"))
          / col("control_mean") * 100.0, 6).as("lift_pct"))
  }

  private val abReadoutSql = Oracles("analytics", "abReadout")

  /** q147 — autocorrelation function of the daily revenue series (lags
    * 1–7): the seasonality diagnostic that closes the time-series family
    * (trend → EWMA smooth → anomaly flag → ACF). Pearson r at lag k is
    * computed CLOSED-FORM from exact integer sums over the lag-paired
    * daily table — Σx, Σy, Σxy, Σx², Σy², n as BIGINT cent products, one
    * rounded division at the end — never a float `corr()` whose
    * accumulation order differs across engines/partitionings. Lag
    * pairing is 7 `lag`s over the AGGREGATED daily table (one small
    * window), unpivoted map-side; one hash agg per output row.
    */
  def autocorrelation(spark: SparkSession, dir: String): DataFrame = {
    val money = org.apache.spark.sql.types.DecimalType(14, 2)
    val t = Tables(spark, dir)
    val daily = t.orders
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg((sum(col("o_totalprice").cast(money)) * 100).cast("long").as("x"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(
      col("x") +: (1 to 7).map(k => lag(col("x"), k).over(w).as(s"y$k")): _*)
    val pairs = lagged.select(explode(expr(
      "filter(array(" +
        (1 to 7).map(k => s"named_struct('lg', $k, 'x', x, 'y', y$k)").mkString(", ") +
        "), p -> p.y IS NOT NULL)")).as("p"))
      .select(col("p.lg").as("lag"), col("p.x").as("x"), col("p.y").as("y"))
    // Σx² of cent values overflows int64 (~10²¹); all sums run in
    // DECIMAL(38,0) — scale-0 decimal is exact integer arithmetic with
    // 128-bit headroom, same as DuckDB's HUGEINT accumulation
    val d38 = "decimal(38,0)"
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum(col("x").cast(d38) * col("y")).as("sxy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"),
        sum(col("y").cast(d38) * col("y")).as("syy"))
      .select(col("lag"), col("n").cast("long").as("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
          / sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
            * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
          .as("acf"))
  }

  private val autocorrelationSql = {
    val structs = (1 to 7).map(k =>
      s"SELECT $k AS lag, x, lag(x, $k) OVER (ORDER BY day) AS y FROM daily")
      .mkString("\n  UNION ALL ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) * 100 AS BIGINT) AS x
       |  FROM orders GROUP BY 1),
       |lagged AS (
       |  $structs
       |),
       |pairs AS (SELECT lag, x, y FROM lagged WHERE y IS NOT NULL)
       |SELECT lag, COUNT(*) AS n,
       |  round(CAST(COUNT(*) * SUM(x*y) - SUM(x) * SUM(y) AS DOUBLE)
       |    / sqrt(CAST(COUNT(*) * SUM(x*x) - SUM(x) * SUM(x) AS DOUBLE)
       |         * CAST(COUNT(*) * SUM(y*y) - SUM(y) * SUM(y) AS DOUBLE)), 6)
       |    AS acf
       |FROM pairs GROUP BY lag""".stripMargin
  }

  /** q148 — Population Stability Index between the first and second half
    * of the date range (industry's drift score, complementing q95's KL:
    * PSI sums both directions): revenue decile bins fixed on the FIRST
    * half (the "expected" period — drift is measured against the
    * baseline's binning, the standard mistake-proof convention), per-bin
    * shares as exact integer counts, PSI = Σ (p−q)·ln(p/q) with
    * per-term rounding and a decimal sum (q105's determinism recipe).
    * Laplace-style +1 smoothing keeps empty bins finite — mirrored
    * exactly in the oracle.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: two passes of exact-percentile partial aggregation over the
    // 1-split orders scan otherwise run single-threaded (2.8–11 s range)
    val dated = Tables.spread(t.orders).select(col("o_totalprice").as("x"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"))
    val mid = dated.agg(
      ((min(col("ts_us")) + max(col("ts_us"))) / 2).cast("long").as("mid_us"))
    val tagged = dated.crossJoin(broadcast(mid))
      .withColumn("period",
        when(col("ts_us") < col("mid_us"), "expected").otherwise("actual"))
    // ONE array-percentile aggregate — nine scalar percentile() calls each
    // buffered the expected-period column independently (9× aggregation
    // state; round-19, same fix as q130's decileBounds)
    val bounds = tagged.filter(col("period") === "expected")
      .agg(expr(
        "percentile(x, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("ts"))
      .select((1 to 9).map(j => col("ts").getItem(j - 1).as(s"t$j")): _*)
    val bin = (1 to 9).map(j =>
      when(col("x") > col(s"t$j"), 1).otherwise(0)).reduce(_ + _)
    val counts = tagged.crossJoin(broadcast(bounds))
      .withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(sum(when(col("period") === "expected", 1).otherwise(0)).as("ne"),
        sum(when(col("period") === "actual", 1).otherwise(0)).as("na"))
    val totals = counts.agg(sum(col("ne")).as("te"), sum(col("na")).as("ta"))
    counts.crossJoin(broadcast(totals))
      .withColumn("p", (col("ne") + 1).cast("double") / (col("te") + 10))
      .withColumn("q", (col("na") + 1).cast("double") / (col("ta") + 10))
      .withColumn("term", round((col("p") - col("q")) * log(col("p") / col("q")), 6))
      .agg(sum(col("term").cast("decimal(18,6)")).cast("double").as("psi"),
        count(lit(1)).as("n_bins"))
  }

  private val psiDriftSql = Oracles("analytics", "psiDrift")

  /** q151 — hierarchical share-of-parent contribution (the BI drill-down
    * staple): nation revenue as a share of its region, region as a share
    * of the corpus — three stacked aggregates joined back broadcast
    * (region and total tables are dimension-sized), NO window anywhere.
    * Shares are exact-decimal-cent ratios with one rounded division
    * each.
    */
  def shareOfParent(spark: SparkSession, dir: String): DataFrame = {
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val t = Tables(spark, dir)
    val nat = t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"),
        col("n_regionkey"))), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg((sum(col("o_totalprice").cast(money)) * 100).cast("long").as("rev_u"))
      // |nations| rows, referenced THREE times below (directly, via reg,
      // via tot) — un-truncated, the whole orders join+agg re-executed
      // per reference (broadcast builds don't share exchanges); one eager
      // checkpoint of the 25-row rollup collapses that to a single pass
      // (r19; measured 1.96 s → see OPTIMIZATION_r19.md)
      .localCheckpoint(true)
    val reg = nat.groupBy(col("r_name")).agg(sum(col("rev_u")).as("reg_u"))
    val tot = reg.agg(sum(col("reg_u")).as("tot_u"))
    nat.join(broadcast(reg), Seq("r_name")).crossJoin(broadcast(tot))
      .select(col("r_name"), col("n_name"),
        (col("rev_u") / 100.0).as("revenue"),
        round(col("rev_u").cast("double") / col("reg_u") * 100.0, 6)
          .as("pct_of_region"),
        round(col("reg_u").cast("double") / col("tot_u") * 100.0, 6)
          .as("region_pct_of_total"))
  }

  private val shareOfParentSql = Oracles("analytics", "shareOfParent")

  /** q152 — Gini coefficient of order values per market segment (the
    * inequality/concentration diagnostic): the rank formula
    * `G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n` over values sorted ascending
    * WITHIN each segment — windows partition by segment (they scale
    * out; never a global sort), ranks are unique via the orderkey
    * tiebreak, and Σ(i·xᵢ) runs in DECIMAL(38,0) cents (the q147
    * overflow lesson: rank×cents×count exceeds int64). One rounded
    * division pair at the end.
    */
  def giniConcentration(spark: SparkSession, dir: String): DataFrame = {
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val d38 = "decimal(38,0)"
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("x_u"), col("o_orderkey"))
    t.orders
      .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
        (col("o_totalprice").cast(money) * 100).cast("long").as("x_u"))
      .withColumn("i", row_number().over(w))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("x_u").cast(d38)).as("sx"),
        sum(col("i").cast(d38) * col("x_u")).as("six"))
      .select(col("c_mktsegment"), col("n"),
        round(
          lit(2.0) * col("six").cast("double")
            / (col("n") * col("sx")).cast("double")
            - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
  }

  private val giniConcentrationSql = Oracles("analytics", "giniConcentration")

  /** q224 — cohort LTV curves: cumulative revenue per cohort member by
    * month offset — the MONEY companion to q110's retention matrix
    * (retention says who came back; LTV says what the cohort is WORTH
    * by age, the payback-period readout acquisition spend is judged
    * against). Same integer year·12+month cohort arithmetic as q110 so
    * the two matrices read on identical cohorts.
    *
    * Determinism: revenue is exact cents (q132 convention); the
    * cumulative sum and the per-member floor division are exact BIGINT
    * — no interval semantics, no float.
    *
    * Scale shape: the ONLY data-sized exchange is the (customer, month)
    * hash agg (map-side combine, customer-keyed — q110's shape with a
    * cents measure); cohort assignment is one window over that table,
    * and the LTV accumulation runs on the ~400-row (cohort, offset)
    * grid.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val act = t.orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("o_custkey"), col("ym"))
      .agg(sum(col("cents")).as("v"))
    val coh = act.withColumn("cohort_ym",
      min(col("ym")).over(Window.partitionBy(col("o_custkey"))))
    val per = coh
      .groupBy(col("cohort_ym"), (col("ym") - col("cohort_ym")).as("month_offset"))
      .agg(count(lit(1)).as("n_customers"), sum(col("v")).as("rev_cents"))
    val wCum = Window.partitionBy(col("cohort_ym")).orderBy(col("month_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    per
      .withColumn("cohort_size",
        max(when(col("month_offset") === 0, col("n_customers")))
          .over(Window.partitionBy(col("cohort_ym"))))
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(wCum))
      .select(
        expr("(cohort_ym - 1) div 12").cast("int").as("cohort_year"),
        (expr("(cohort_ym - 1) % 12") + 1).cast("int").as("cohort_mon"),
        col("month_offset"), col("cohort_size"), col("rev_cents"),
        col("cum_rev_cents"),
        expr("cum_rev_cents div cohort_size").as("ltv_cents"))
  }

  private val cohortLtvSql = Oracles("analytics", "cohortLtv")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q224_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    QueryDef("q151_share_of_parent", shareOfParent, Some(shareOfParentSql)),
    QueryDef("q152_gini_concentration", giniConcentration, Some(giniConcentrationSql)),
    QueryDef("q147_autocorrelation", autocorrelation, Some(autocorrelationSql)),
    QueryDef("q148_psi_drift", psiDrift, Some(psiDriftSql)),
    QueryDef("q141_ab_readout", abReadout, Some(abReadoutSql)),
    QueryDef("q132_abc_classification", abcClassification, Some(abcClassificationSql)),
    QueryDef("q110_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    QueryDef("q112_markov_transitions", markovTransitions, Some(markovTransitionsSql)),
    QueryDef("q115_benford_audit", benfordAudit, Some(benfordAuditSql)),
  )
}
