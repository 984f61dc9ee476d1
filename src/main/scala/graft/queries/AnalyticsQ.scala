package graft.queries

import graft.QueryDef
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

  private val cohortRetentionSql =
    """WITH act AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(year(o_orderdate)*12 + month(o_orderdate) AS INT) AS ym
      |  FROM orders),
      |coh AS (
      |  SELECT o_custkey, ym,
      |    min(ym) OVER (PARTITION BY o_custkey) AS cohort_ym
      |  FROM act),
      |ret AS (
      |  SELECT cohort_ym, ym - cohort_ym AS month_offset,
      |    COUNT(*) AS n_customers
      |  FROM coh GROUP BY 1, 2),
      |sized AS (
      |  SELECT *,
      |    MAX(CASE WHEN month_offset = 0 THEN n_customers END)
      |      OVER (PARTITION BY cohort_ym) AS cohort_size
      |  FROM ret)
      |SELECT CAST((cohort_ym - 1) // 12 AS INT) AS cohort_year,
      |  CAST((cohort_ym - 1) % 12 + 1 AS INT) AS cohort_mon,
      |  CAST(month_offset AS INT) AS month_offset,
      |  n_customers, cohort_size,
      |  round(CAST(n_customers AS DOUBLE) / cohort_size, 6) AS retention_rate
      |FROM sized""".stripMargin

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

  private val markovTransitionsSql =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |                           ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |cnt AS (
      |  SELECT from_type, to_type, COUNT(*) AS n
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS n_from,
      |  round(CAST(n AS DOUBLE) /
      |        CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT), 6) AS p
      |FROM cnt""".stripMargin

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

  private val benfordAuditSql =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
      |                             AS VARCHAR), 1, 1) AS INT) AS digit
      |  FROM orders),
      |obs AS (
      |  SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
      |tot AS (
      |  SELECT *, CAST(SUM(n) OVER () AS BIGINT) AS total FROM obs),
      |p AS (
      |  SELECT digit, n, total,
      |    round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
      |    round(log10(1.0 + 1.0 / digit), 6) AS expected_p
      |  FROM tot)
      |SELECT digit, n, total, observed_p, expected_p,
      |  round(abs(observed_p - expected_p), 6) AS abs_dev
      |FROM p""".stripMargin

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

  private val abcClassificationSql =
    """WITH per_part AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) * 100 AS BIGINT)
      |      AS rev_u
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT l_partkey, rev_u,
      |    CAST(SUM(rev_u) OVER (ORDER BY rev_u DESC, l_partkey
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_u
      |  FROM per_part),
      |t AS (SELECT SUM(rev_u) AS total_u FROM per_part)
      |SELECT l_partkey, rev_u / 100.0 AS revenue, cum_u,
      |  CASE WHEN cum_u * 10 <= total_u * 7 THEN 'A'
      |       WHEN cum_u * 10 <= total_u * 9 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM cum CROSS JOIN t""".stripMargin

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
    val per = assigned.groupBy(col("c_mktsegment"), col("arm"))
      .agg(graft.ops.Exact.dsum(col("o_totalprice")).as("rev"),
        count(lit(1)).as("n"))
      .withColumn("mean_rev", round(col("rev") / col("n"), 6))
    val c = per.filter(col("arm") === "control")
      .select(col("c_mktsegment"), col("mean_rev").as("control_mean"),
        col("n").as("n_control"))
    val tr = per.filter(col("arm") === "treatment")
      .select(col("c_mktsegment"), col("mean_rev").as("treatment_mean"),
        col("n").as("n_treatment"))
    c.join(tr, Seq("c_mktsegment"))
      .select(col("c_mktsegment"), col("n_control"), col("n_treatment"),
        col("control_mean"), col("treatment_mean"),
        round(col("treatment_mean") - col("control_mean"), 6).as("delta"),
        round((col("treatment_mean") - col("control_mean"))
          / col("control_mean") * 100.0, 6).as("lift_pct"))
  }

  private val abReadoutSql =
    """WITH assigned AS (
      |  SELECT c.c_mktsegment, o.o_totalprice,
      |    CASE WHEN (('0x' || substr(md5(CAST(o.o_custkey AS VARCHAR)), 1, 15))::BIGINT % 2) = 0
      |         THEN 'control' ELSE 'treatment' END AS arm
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |per AS (
      |  SELECT c_mktsegment, arm,
      |    round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |      / COUNT(*), 6) AS mean_rev,
      |    COUNT(*) AS n
      |  FROM assigned GROUP BY 1, 2)
      |SELECT c.c_mktsegment,
      |  c.n AS n_control, t.n AS n_treatment,
      |  c.mean_rev AS control_mean, t.mean_rev AS treatment_mean,
      |  round(t.mean_rev - c.mean_rev, 6) AS delta,
      |  round((t.mean_rev - c.mean_rev) / c.mean_rev * 100.0, 6) AS lift_pct
      |FROM (SELECT * FROM per WHERE arm = 'control') c
      |JOIN (SELECT * FROM per WHERE arm = 'treatment') t
      |  USING (c_mktsegment)""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q141_ab_readout", abReadout, Some(abReadoutSql)),
    QueryDef("q132_abc_classification", abcClassification, Some(abcClassificationSql)),
    QueryDef("q110_cohort_retention", cohortRetention, Some(cohortRetentionSql)),
    QueryDef("q112_markov_transitions", markovTransitions, Some(markovTransitionsSql)),
    QueryDef("q115_benford_audit", benfordAudit, Some(benfordAuditSql)),
  )
}
