package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Exact
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Window functions + time-grain trend rollups (SURVEY.md §2.5 W1–W4,
  * §2.4 A10) and the incremental-ingest surface (§2.10, S2/A14/W1).
  *
  * Every window ordering carries a unique tiebreaker (`o_orderkey` /
  * `event_id`) — the reference's windows order by date alone
  * (`go-metric-elt.py:132-134`), which is nondeterministic under ties; we pin
  * determinism (SURVEY.md §7.4 item 2).
  *
  * Scale posture: all windows partition by a high-cardinality key (customer,
  * user) so state is distributed; no unpartitioned windows over raw facts.
  */
object WindowsQ {

  /** W1 analog — keep latest row per key:
    * `row_number() over (partitionBy pks orderBy wm desc)` = 1
    * (`go-incremental-ingest-elt.py:207-212`).
    */
  def latestEventPerKey(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t.events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
  }

  private val latestEventPerKeySql = Oracles("windows", "latestEventPerKey")

  /** S2+W1+A14 composite — incremental ingest semantics: watermark pushdown
    * filter, then latest-per-key dedupe (`go-incremental-ingest-elt.py:
    * 162-165,207-212`). The predicate reaches the parquet scan
    * (PushedFilters) exactly as the reference pushes its subquery into JDBC.
    */
  def incrementalSlice(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    // Tables.eventsSince phrases the watermark predicate against the on-disk
    // ts type (int64 nanos OR native micros timestamp) so it shows up in
    // PushedFilters and prunes row groups in either layout;
    // 1705276800000000 us = 2024-01-15T00:00:00Z
    t.eventsSince(1705276800000000L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
  }

  private val incrementalSliceSql =
    // epoch_ns on both sides: exact for the legacy nanos layout (micro-
    // aligned data) and trivially exact for the current micros layout
    // (epoch_ns is epoch_us × 1000), so one oracle covers both
    Oracles("windows", "incrementalSlice")

  /** A14 analog — max-watermark scalar (`go-incremental-ingest-elt.py:
    * 268-271`), exposed as a 1-row aggregate rather than a driver collect.
    */
  def maxWatermark(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events.agg(
      max(unix_micros(col("ts"))).as("watermark_us"),
      count(lit(1)).as("n_rows"))
  }

  private val maxWatermarkSql = Oracles("windows", "maxWatermark")

  /** W2/W3/A9 analog — activity profile: lag-based order gaps and revenue
    * %-change, then per-customer aggregates + tags
    * (`go-metric-elt.py:132-156`).
    */
  def activityProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val enriched = t.orders
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")))
      .withColumn("rev_change_pct",
        when(col("prev_price").isNotNull && col("prev_price") =!= 0.0,
          (col("o_totalprice") - col("prev_price")) / col("prev_price")))
    enriched.groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate").cast("date")).as("last_order"),
        count(lit(1)).as("n_orders"),
        round(avg(col("gap_days")), 6).as("avg_gap_days"),
        round(avg(col("rev_change_pct")), 6).as("avg_rev_change"))
      .withColumn("activity_tag",
        when(col("avg_gap_days").isNull, "one-off")
          .when(col("avg_gap_days") <= 120.0, "frequent")
          .when(col("avg_gap_days") <= 365.0, "regular")
          .otherwise("dormant"))
  }

  private val activityProfileSql = Oracles("windows", "activityProfile")

  /** A10 analog — daily trend grain (`go-metric-elt.py:168-181`). */
  def trendsDaily(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
  }

  private val trendsDailySql = Oracles("windows", "trendsDaily")

  /** A10 analog — weekly grain incl. the reference's week-start
    * reconstruction `date_add(to_date(concat(year,'-01-01')),(week-1)*7)`
    * (`go-metric-elt.py:185`; quirky at ISO year boundaries, preserved
    * deliberately and documented).
    */
  def trendsWeekly(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("wk", weekofyear(col("o_orderdate")))
      .groupBy(col("yr"), col("wk"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .withColumn("week_start",
        date_add(to_date(concat(col("yr"), lit("-01-01"))), (col("wk") - 1) * 7))
  }

  private val trendsWeeklySql = Oracles("windows", "trendsWeekly")

  /** A10 analog — monthly grain with month-name derivation
    * (`go-metric-elt.py:191-192` parses "MMMM yyyy"; we emit the name —
    * locale pinned by session UTC/`Locale.US` semantics, SURVEY.md §7.4).
    */
  def trendsMonthly(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .withColumn("yr", year(col("o_orderdate")))
      .withColumn("mon", month(col("o_orderdate")))
      .groupBy(col("yr"), col("mon"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .withColumn("month_start", make_date(col("yr"), col("mon"), lit(1)))
      .withColumn("month_name", date_format(col("month_start"), "MMMM"))
  }

  private val trendsMonthlySql = Oracles("windows", "trendsMonthly")

  /** A10 analog — hourly grain over the event stream
    * (`go-metric-elt.py:196-204` buckets by `hour(to_timestamp(...))`).
    */
  def trendsHourly(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(hour(col("ts")).as("hour_of_day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
  }

  private val trendsHourlySql = Oracles("windows", "trendsHourly")

  /** Sessionization — gap-based session assignment via lag + running sum
    * (frame spec `rowsBetween`; SURVEY.md §2.5 notes frames are "available
    * free in Spark" — here is the batch twin of the streaming
    * mapGroupsWithState sessionizer in graft.streaming).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("is_new_session",
        when(col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > 7200L * 1000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("is_new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"),
        Exact.dsum(col("value")).as("session_value"))
  }

  private val sessionizeSql = Oracles("windows", "sessionize")

  /** Ranking-family showcase beyond row_number (SURVEY.md §2.5 notes these
    * are "available free in Spark"): rank, dense_rank, ntile, lead,
    * first_value over per-customer order histories.
    */
  def windowFamily(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t.orders
      .withColumn("price_rank", rank().over(w))
      .withColumn("price_dense_rank", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("top_order_price", first_value(col("o_totalprice")).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("price_rank"), col("price_dense_rank"), col("quartile"),
        col("next_price"), col("top_order_price"))
  }

  private val windowFamilySql = Oracles("windows", "windowFamily")


  /** q104 — calendar-spine gap fill: the daily trend (q22) leaves missing
    * days ABSENT; dashboards need them PRESENT as zeros (else averages,
    * sparklines and period-over-period deltas lie). The spine is generated
    * from a 1-row min/max bounds aggregate (`sequence` + explode — never a
    * driver loop), crossed with the distinct priority dim, and
    * left-joined back; both spine inputs are broadcast-sized by
    * construction (days × dims), so the fill never shuffles the fact
    * aggregate.
    */
  def trendGapfill(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders
    val daily = orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"),
        count(lit(1)).as("n_orders"))
    val bounds = orders.agg(
      min(col("o_orderdate").cast("date")).as("d0"),
      max(col("o_orderdate").cast("date")).as("d1"))
    val spine = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("order_date"))
      .crossJoin(orders.select(col("o_orderpriority")).distinct())
    spine.join(daily, Seq("order_date", "o_orderpriority"), "left")
      .na.fill(0.0, Seq("revenue")).na.fill(0L, Seq("n_orders"))
  }

  private val trendGapfillSql = Oracles("windows", "trendGapfill")


  /** q107 — time-based trailing aggregate via a RANGE window frame: each
    * order's 7-day trailing revenue and order count for its customer
    * (`rangeBetween(-6, 0)` over an integer day number — a VALUE frame, so
    * a burst of same-week orders aggregates by TIME distance, which the
    * ROWS frames of q43/q51 cannot express). One shuffle on customer; the
    * trailing sum accumulates in decimal (Exact rules) and both engines
    * order the frame by the same day number.
    */
  def trailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day_num"))
      .rangeBetween(-6, Window.currentRow)
    t.orders
      .withColumn("day_num",
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")))
      .withColumn("trail_rev",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double"))
      .withColumn("trail_n", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_custkey"), col("day_num"),
        col("o_totalprice"), col("trail_rev"), col("trail_n"))
  }

  private val trailingWindowSql = Oracles("windows", "trailingWindow")

  /** q116 — the distribution-rank window family q51 doesn't cover:
    * percent_rank, cume_dist, nth_value and last_value over an explicit
    * full frame — on monthly revenue per priority. The window runs over
    * the ALREADY-AGGREGATED (month × priority) table (~400 rows at any
    * scale — months × 5 priorities is data-size-independent), so the
    * unbounded frame is free; raw orders see exactly one hash agg.
    * Revenue is an Exact.dsum (order-independent); the ordering carries
    * the month as tiebreak and percent_rank/cume_dist round to 6dp (they
    * are integer-ratio divides, deterministic given the total order).
    */
  def rankDistributions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val monthly = t.orders
      .groupBy(
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("ym"),
        col("o_orderpriority"))
      .agg(Exact.dsum(col("o_totalprice")).as("revenue"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("ym"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    monthly
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("second_best", nth_value(col("revenue"), 2).over(wf))
      .withColumn("worst", last_value(col("revenue")).over(wf))
  }

  private val rankDistributionsSql = Oracles("windows", "rankDistributions")

  /** q128 — trailing-exponential smoothing (EWMA, α = ½) of the daily
    * revenue trend, in FIXED POINT: with α = ½ the weights are powers of
    * two, so `ewma_u = Σ_{k=0..19} rev_cents[t−k] · 2^(19−k)` is an exact
    * BIGINT (the 20-term window truncates weights below 2⁻²⁰ — under a
    * cent on any realistic magnitude; series-start missing lags
    * contribute 0). One window partition (priority) ordered by day, 20
    * `lag`s over the ALREADY-AGGREGATED daily table (q22's output, never
    * raw orders), and the only floating op is the final division — same
    * fixed-point discipline as PageRank/Gramian, so both engines are
    * bit-equal with no rounding anywhere. This is the anomaly-baseline /
    * trend-smoothing step monitoring pipelines run on warehouse metrics.
    */
  def ewmaSmoothing(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val money = org.apache.spark.sql.types.DecimalType(14, 2)
    val daily = t.orders
      .groupBy(col("o_orderdate").cast("date").as("order_date"),
        col("o_orderpriority"))
      .agg((sum(col("o_totalprice").cast(money)) * 100).cast("long").as("rev_cents"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("order_date"))
    val ewmaU = (0 until 20).map { k =>
      coalesce(lag(col("rev_cents"), k).over(w), lit(0L)) * lit(1L << (19 - k))
    }.reduce(_ + _)
    daily
      .withColumn("ewma_u", ewmaU)
      .select(col("order_date"), col("o_orderpriority"),
        (col("rev_cents") / 100.0).as("revenue"),
        col("ewma_u"),
        (col("ewma_u") / 104857600.0).as("ewma")) // 100 · 2²⁰, one IEEE divide
  }

  /** The 20-term fixed-point EWMA sum q128 and q139 both splice into
    * their oracles — GENERATED SQL, so it stays in Scala per the
    * extraction policy (resources hold static text; generation is logic).
    */
  private def ewmaTermsSql: String = (0 until 20).map(k =>
    s"COALESCE(lag(rev_cents, $k) OVER (PARTITION BY o_orderpriority ORDER BY order_date), 0) * ${1L << (19 - k)}"
  ).mkString(" + ")

  private val ewmaSmoothingSql =
    Oracles("windows", "ewmaSmoothing", "TERMS" -> ewmaTermsSql)

  /** q139 — trend anomaly flags on the q128 EWMA residuals: per
    * priority, residual = revenue − EWMA, flagged when |residual| exceeds
    * the 3.5 modified-z cutoff on the residual MAD (q108's robust
    * method applied to the smoothed series — the complete
    * metric-monitoring pipeline: aggregate → smooth → deviation →
    * robust flag). The MAD runs over the AGGREGATED daily table per
    * priority; everything downstream of q128's exact BIGINT smoothing is
    * the same deterministic IEEE sequence in both engines (q108's
    * precedent), so flags agree exactly.
    */
  def trendAnomalies(spark: SparkSession, dir: String): DataFrame = {
    // checkpoint: `smoothed` feeds BOTH the MAD aggregate and the final
    // join — un-persisted, the whole q128 subtree (daily agg + 20-term
    // EWMA window) executed twice (broadcast builds don't share
    // exchanges; the q151 precedent). Day-grain rows: tiny at any scale.
    val smoothed = ewmaSmoothing(spark, dir)
      .withColumn("residual", col("revenue") - col("ewma"))
      .localCheckpoint(true)
    val mad = smoothed
      .withColumn("absres", abs(col("residual")))
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(absres, 0.5)").as("mad"))
    smoothed.join(broadcast(mad), Seq("o_orderpriority"))
      .select(col("order_date"), col("o_orderpriority"),
        col("revenue"), col("ewma"),
        round(col("residual"), 6).as("residual"),
        (col("mad") =!= 0.0 &&
          abs(col("residual")) > lit(5.1891) * col("mad")).as("is_anomaly"))
  }

  private val trendAnomaliesSql =
    Oracles("windows", "trendAnomalies", "TERMS" -> ewmaTermsSql)

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q139_trend_anomalies", trendAnomalies, Some(trendAnomaliesSql)),
    QueryDef("q128_ewma_smoothing", ewmaSmoothing, Some(ewmaSmoothingSql)),
    QueryDef("q116_rank_distributions", rankDistributions, Some(rankDistributionsSql)),
    QueryDef("q51_window_family", windowFamily, Some(windowFamilySql)),
    QueryDef("q18_latest_event_per_key", latestEventPerKey, Some(latestEventPerKeySql)),
    QueryDef("q19_incremental_slice", incrementalSlice, Some(incrementalSliceSql)),
    QueryDef("q20_max_watermark", maxWatermark, Some(maxWatermarkSql)),
    QueryDef("q21_activity_profile", activityProfile, Some(activityProfileSql)),
    QueryDef("q22_trends_daily", trendsDaily, Some(trendsDailySql)),
    QueryDef("q23_trends_weekly", trendsWeekly, Some(trendsWeeklySql)),
    QueryDef("q24_trends_monthly", trendsMonthly, Some(trendsMonthlySql)),
    QueryDef("q25_trends_hourly", trendsHourly, Some(trendsHourlySql)),
    QueryDef("q26_sessionize", sessionize, Some(sessionizeSql)),
    QueryDef("q104_trend_gapfill", trendGapfill, Some(trendGapfillSql)),
    QueryDef("q107_trailing_window", trailingWindow, Some(trailingWindowSql)),
  )
}
