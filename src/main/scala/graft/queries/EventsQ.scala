package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Exact
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream batch queries — the batch twins of the Structured Streaming
  * pipelines in [[graft.streaming.EventStreams]] (SURVEY.md §2.10: the
  * reference's "streaming" is incremental batch; we provide both). Tumbling
  * windows here use the same `window()` semantics the streaming job uses, so
  * batch and streaming results are directly comparable.
  */
object EventsQ {

  /** Tumbling 1-hour window aggregate (streaming-parity shape:
    * `readStream.groupBy(window($"ts", "1 hour"), ...)`).
    */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  private val hourlyWindowSql = Oracles("events", "hourlyWindow")

  /** Per-user running totals over the stream — frame-spec window (running
    * sum), the batch shape of stateful per-key streaming aggregation.
    */
  def runningValue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("running_value"))
  }

  private val runningValueSql = Oracles("events", "runningValue")

  /** q96 — ordered funnel: per user, the earliest click, the earliest view
    * STRICTLY AFTER that click, the earliest purchase strictly after that
    * view, and the resulting funnel stage. Three whole-partition `min`
    * windows chained over ONE user_id exchange (each depends on the
    * previous stage's timestamp — the sequential-projection shape Spark
    * plans as stacked Window nodes without re-shuffling); the rollup is a
    * per-user max over constant-per-user columns.
    */
  def funnelStages(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
    t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("t1",
        min(when(col("event_type") === "click", col("ts_us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "view" && col("ts_us") > col("t1"),
          col("ts_us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
          col("ts_us"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("click_us"), max(col("t2")).as("view_us"),
        max(col("t3")).as("purchase_us"))
      .withColumn("stage",
        when(col("purchase_us").isNotNull, lit(3))
          .when(col("view_us").isNotNull, lit(2))
          .when(col("click_us").isNotNull, lit(1))
          .otherwise(lit(0)))
  }

  private val funnelStagesSql = Oracles("events", "funnelStages")

  /** q225 — funnel stage LATENCY distribution: q96 says how many users
    * reach each stage; this says how LONG the click→view and
    * view→purchase transitions take (n, p50/p90 interpolated seconds,
    * max) — the conversion-velocity readout that decides retargeting
    * windows and session-timeout budgets. Rides q96's exact stage
    * timestamps (same chained conditional-min windows over ONE user_id
    * exchange), so "stage reached" and "stage latency" can never
    * disagree.
    *
    * Determinism: gaps are exact integer seconds (micros div 10⁶,
    * non-negative); p50/p90 are the pinned interpolated-percentile IEEE
    * sequence (q130 precedent) exported ×1000-rounded; the final stats
    * run per transition over the converting-user table.
    *
    * Scale shape: identical to q96 (one user-keyed exchange, stacked
    * windows, per-user rollup) plus a 2-row stats aggregate — the
    * transition gaps table is user-count-sized, the output is 2 rows.
    */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
    val stages = t.events
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("t1",
        min(when(col("event_type") === "click", col("ts_us"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "view" && col("ts_us") > col("t1"),
          col("ts_us"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" && col("ts_us") > col("t2"),
          col("ts_us"))).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("t1")).as("c"), max(col("t2")).as("v"), max(col("t3")).as("p"))
    val gaps = stages.select(
      expr("""stack(2,
        |'click_to_view',  CASE WHEN v IS NOT NULL THEN (v - c) div 1000000L END,
        |'view_to_purchase', CASE WHEN p IS NOT NULL THEN (p - v) div 1000000L END)
        |AS (transition, gap_s)""".stripMargin))
      .filter(col("gap_s").isNotNull)
    // one array-percentile buffer per transition instead of two (round-19)
    gaps.groupBy(col("transition"))
      .agg(count(lit(1)).as("n_users"),
        expr("percentile(gap_s, array(0.5, 0.9))").as("__p"),
        max(col("gap_s")).as("max_s"))
      .select(col("transition"), col("n_users"),
        expr("CAST(round(__p[0] * 1000) AS BIGINT)").as("p50_ms_x1000"),
        expr("CAST(round(__p[1] * 1000) AS BIGINT)").as("p90_ms_x1000"),
        col("max_s"))
  }

  private val funnelLatencySql = Oracles("events", "funnelLatency")

  /** q117 — semi-structured JSON props: extract the numeric `k` field from
    * the `props` JSON column (`get_json_object`, the codegen'd path — no
    * UDF) and aggregate value by (event_type, k). The extraction is pure
    * map-side; the only shuffle is the final small hash agg. At 100 TB
    * prefer `from_json` with an explicit schema once the props shape is
    * known (one parse, typed struct) — `get_json_object` re-parses per
    * path, fine for the single-field case here.
    */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // NO spread (A/B-rejected twice, r19, with q34): the partial agg
    // collapses map-side, so pre-exchanging the full props column costs
    // more than parallelizing the parse buys (0.53 → 0.62/0.62 s warm
    // medians — the q14/q15 class).
    t.events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        col("value"))
      .groupBy(col("event_type"), col("k"))
      .agg(count(lit(1)).as("n"), Exact.dsum(col("value")).as("sum_value"))
  }

  private val jsonPropsSql = Oracles("events", "jsonProps")

  /** q142 — top user-journey trigrams: sessionize (q26's 2-hour-gap
    * convention), order each session's event types, slide to consecutive
    * event-type trigrams, count corpus-wide, top 15. q112's Markov
    * transitions are the pairwise view; journeys need the longer paths
    * product analytics actually reads ("view→click→purchase"). Shape:
    * session-local windows (partitions scale out with users), trigram
    * expansion via two `lead`s (no per-session array collect), one hash
    * agg on the trigram, `TakeOrderedAndProject` top-k.
    */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = t.events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
      .withColumn("is_new_session",
        when(col("prev_us").isNull ||
          (unix_micros(col("ts")) - col("prev_us")) > 7200L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("is_new_session")).over(wRun))
    val wSess = Window.partitionBy(col("user_id"), col("session_id"))
      .orderBy(col("ts"), col("event_id"))
    sessioned
      .withColumn("e2", lead(col("event_type"), 1).over(wSess))
      .withColumn("e3", lead(col("event_type"), 2).over(wSess))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(15)
  }

  private val topPathsSql = Oracles("events", "topPaths")

  /** q145 — stable pseudonymization: user ids re-keyed to salted sha2
    * surrogates through an explicit VAULT table (distinct id → surrogate),
    * the GDPR tokenization pattern — analytics run on surrogates, the
    * vault alone maps back, and deleting a vault row unlinks a person
    * without touching fact history. Checked: per-surrogate event counts
    * after re-keying ≡ per-user counts before (the re-key is a bijection —
    * collisions would merge rows and fail the oracle). Shape: one
    * distinct on the key domain (dimension-sized), map-side hash, one
    * broadcast join to re-key facts.
    */
  def pseudonymize(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val vault = t.events.select(col("user_id")).distinct()
      .withColumn("surrogate",
        sha2(concat(lit("vault-salt-2026:"), col("user_id").cast("string")), 256))
    t.events
      .join(broadcast(vault), Seq("user_id"))
      .groupBy(col("surrogate"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
  }

  private val pseudonymizeSql = Oracles("events", "pseudonymize")

  /** q146 — 7-day ROLLING DISTINCT users (the non-additive rolling
    * metric: daily distincts can't be summed, and a RANGE window can't
    * dedupe). Exact formulation that scales: dedupe to (day, user) pairs
    * ONCE (one shuffle over the events), then each pair map-side expands
    * to the ≤7 window-end days it participates in (`sequence` — bounded
    * fan-out), and one hash agg counts per window-end. Raw events never
    * see the ×7; only the aggregated pair table does. Sketch path
    * (mergeable HLL per day) trades exactness for O(1) state when ±2%
    * suffices — q48 covers that family.
    */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = t.events
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    pairs
      .select(col("user_id"), explode(expr(
        "sequence(day, date_add(day, 6))")).as("win_end"))
      .groupBy(col("win_end"))
      .agg(countDistinct(col("user_id")).as("u7"))
  }

  private val rollingDistinctSql = Oracles("events", "rollingDistinct")

  /** q215 — SURVIVAL analysis of inter-event waiting times (Nelson–Aalen
    * cumulative hazard with right-censoring): every gap between a user's
    * consecutive events is a COMPLETE observation ("waited g hours, then
    * acted"); each user's final open gap (last event → observation end)
    * is right-CENSORED — we know they waited at least that long, and
    * dropping it would bias the estimator optimistic (the classic
    * churn-analysis mistake). For each gap length t (hours) with ≥1
    * completed wait: the risk set `n(t)` (gaps, complete or censored,
    * of length ≥ t), completion count `d(t)`, discrete hazard `d/n`,
    * and the Nelson–Aalen cumulative hazard `Σ_{t'≤t} d/n` — "given
    * you've been silent t hours, how likely are you to ever return".
    * Complements q110's calendar cohort grid with the censoring-aware,
    * cohort-free estimator.
    *
    * Determinism: Nelson–Aalen instead of Kaplan–Meier PRODUCT-limit —
    * each hazard term is an exact integer ppm (`d·10⁶ div n`, both
    * non-negative so Spark `div` ≡ DuckDB `//`) and the cumulative sum
    * is exact BIGINT; a KM product would force float multiplication
    * chains that drift across engines. Timestamps cross as unix_micros;
    * the lead window carries event_id as the equal-ts tiebreaker.
    *
    * Scale shape: one per-user lead window over events (keyed shuffle,
    * the q21 lag-gap shape), one hash agg onto the distinct-gap-length
    * table (≤ observation-window hours — hundreds of rows); the risk set
    * is total-minus-prefix off ONE cumulative window, and the
    * single-partition ordered windows run on that tiny table only (the
    * q213 ECDF precedent).
    */
  def survivalHazard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val ev = t.events.select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("us"))
    val obsEnd = ev.agg(max(col("us")).as("end_us"))
    val wLead = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val gaps = ev
      .withColumn("next_us", lead(col("us"), 1).over(wLead))
      .crossJoin(broadcast(obsEnd))
      .select(
        expr("coalesce(next_us - us, end_us - us) div 3600000000L")
          .as("gap_h"),
        col("next_us").isNotNull.as("complete"))
    // byGap feeds BOTH the total and the hazard windows — un-persisted,
    // the data-sized lead-window + agg subtree executed twice (r19
    // runtime plan audit: events scanned 4×). Checkpoint: gap_h-grain,
    // ≤ observation-window hours — bounded at any data scale.
    val byGap = gaps.groupBy(col("gap_h"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("complete"), 1L).otherwise(0L)).as("d"))
      .localCheckpoint(true)
    val tot = byGap.agg(sum(col("n_all")).as("n_gaps"))
    val wPrev = Window.orderBy(col("gap_h"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("gap_h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byGap
      .crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_gaps") - coalesce(sum(col("n_all")).over(wPrev), lit(0L)))
      .filter(col("d") > 0L)
      .withColumn("hazard_ppm", expr("d * 1000000L div n_risk"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(wCum))
      .select(col("gap_h"), col("n_risk"), col("d").as("d_completed"),
        col("hazard_ppm"), col("cum_hazard_ppm"))
  }

  private val survivalHazardSql = Oracles("events", "survivalHazard")

  /** q223 — SEASONAL-residual anomaly detection: hour-of-day baseline
    * per event type (the daily cycle every ops metric has), residual =
    * each (type, date, hour) cell minus its hour-of-day mean, robust
    * flag at 3×MAD of the type's residuals. The SEASONALITY companion
    * to q139 (which flags deviations from the EWMA TREND — a traffic
    * spike at 3am is invisible to a trend model if Tuesdays always
    * spike, and invisible to this model if it matches the hourly
    * cycle; monitoring runs both).
    *
    * Determinism: cell values are exact event-value cents (q132
    * convention); the baseline is an integer floor-mean, residuals are
    * exact integers; only the MAD is an interpolated median — the same
    * IEEE `percentile`/`quantile_cont` sequence in both engines (q130
    * precedent), exported ×100-rounded.
    *
    * Scale shape: ONE data-sized hash agg (events → type×date×hour
    * cells); the baseline, MAD, and flags all run on that ~3.6k-row
    * cell table (tiny joins + one small percentile per type). Hours
    * with NO events are absent, not zero — the baseline is over
    * OBSERVED cells (documented; a gap-filled variant rides q104's
    * calendar-spine recipe).
    */
  def seasonalAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // cells feeds BOTH the baseline agg and the residual join, and resid
    // feeds BOTH the MAD agg and the final flag join — un-persisted, the
    // data-sized events agg executed four times (r19 runtime plan audit:
    // events scanned 4×, AQE reused only the leaf exchange). Checkpoint
    // both: each is cell-grain (≤ types × days × 24 rows — calendar-
    // bounded at any data scale), the q139/q151 shared-subtree rule.
    // base is types×24-grain ⇒ broadcast by contract (checkpointed inputs
    // have no stats, so the planner could never pick it on its own).
    val cells = t.events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("d"), col("h"))
      .agg(sum(col("cents")).as("v"))
      .localCheckpoint(true)
    val base = cells.groupBy(col("event_type"), col("h"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val resid = cells.join(broadcast(base), Seq("event_type", "h"))
      .withColumn("resid", expr("v - s div n"))
      .localCheckpoint(true)
    val mad = resid.groupBy(col("event_type"))
      .agg(expr("percentile(abs(resid), 0.5)").as("mad"))
    resid.join(broadcast(mad), Seq("event_type"))
      .withColumn("flagged", abs(col("resid")).cast("double") > col("mad") * 3.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_anomalies"),
        max(abs(col("resid"))).as("max_abs_resid_cents"),
        expr("CAST(round(max(mad) * 100) AS BIGINT)").as("mad_cents_x100"))
  }

  /** q227 — GAP-FILLED seasonal anomalies: q223 over a complete
    * (event_type × day × hour) spine with absent cells present as ZERO
    * (q104's calendar-spine recipe extended to hours). q223's
    * observed-cells baseline is blind to the anomaly monitoring most
    * wants: an hour that normally has traffic going SILENT simply
    * vanishes from the cell table. Here a missing cell is a 0-cent
    * observation, so dead hours pull the hour-of-day baseline down and
    * flag against it like any other residual. Output adds `n_gap_cells`
    * (cells the spine created) next to q223's readout.
    *
    * Determinism: the spine is exact (sequence of days × 24 hours ×
    * distinct types); fills are integer zeros; baseline floor-mean,
    * residuals, and the MAD/flag pipeline are q223's unchanged (the one
    * interpolated median, exported ×100-rounded).
    *
    * Scale shape: one data-sized hash agg (identical to q223); the
    * spine is generated from a 1-row bounds aggregate (`sequence` +
    * explode — never a driver loop) crossed with two broadcast-sized
    * dims (types × 24 hours), so the fill LEFT-joins the tiny spine
    * against the aggregated cells — the raw events never join anything.
    */
  def seasonalGapfill(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // ONE events scan (r19): the runtime plan audit showed events scanned
    // 12× — cells under every filled reader, PLUS separate raw scans for
    // the date bounds and the distinct-type dim, all duplicated again by
    // the resid double-reference. cells is checkpointed (cell-grain,
    // calendar-bounded) and both spine dims now ride IT: min/max of
    // cells.d IS min/max of to_date(ts) (every event lands in a cell) and
    // cells' distinct event_type IS the raw distinct. resid is
    // checkpointed for the MAD/flag double-read (q223's rule); base is
    // types×24-grain ⇒ broadcast by contract.
    val cells = t.events
      .select(col("event_type"), to_date(col("ts")).as("d"),
        hour(col("ts")).as("h"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("d"), col("h"))
      .agg(sum(col("cents")).as("v"))
      .localCheckpoint(true)
    val bounds = cells.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = bounds
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
      .crossJoin(spark.range(0, 24).select(col("id").cast("int").as("h")))
      .crossJoin(cells.select(col("event_type")).distinct())
    val filled = spine.join(cells, Seq("event_type", "d", "h"), "left")
      .withColumn("gap", col("v").isNull)
      .na.fill(0L, Seq("v"))
    val base = filled.groupBy(col("event_type"), col("h"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
    val resid = filled.join(broadcast(base), Seq("event_type", "h"))
      .withColumn("resid", expr("v - s div n"))
      .localCheckpoint(true)
    val mad = resid.groupBy(col("event_type"))
      .agg(expr("percentile(abs(resid), 0.5)").as("mad"))
    resid.join(broadcast(mad), Seq("event_type"))
      .withColumn("flagged", abs(col("resid")).cast("double") > col("mad") * 3.0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("gap"), 1L).otherwise(0L)).as("n_gap_cells"),
        sum(when(col("flagged"), 1L).otherwise(0L)).as("n_anomalies"),
        max(abs(col("resid"))).as("max_abs_resid_cents"),
        expr("CAST(round(max(mad) * 100) AS BIGINT)").as("mad_cents_x100"))
  }

  private val seasonalGapfillSql = Oracles("events", "seasonalGapfill")

  private val seasonalAnomaliesSql = Oracles("events", "seasonalAnomalies")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q145_pseudonymize", pseudonymize, Some(pseudonymizeSql)),
    QueryDef("q215_survival_hazard", survivalHazard, Some(survivalHazardSql)),
    QueryDef("q223_seasonal_anomalies", seasonalAnomalies,
      Some(seasonalAnomaliesSql)),
    QueryDef("q227_seasonal_gapfill", seasonalGapfill,
      Some(seasonalGapfillSql)),
    QueryDef("q225_funnel_latency", funnelLatency, Some(funnelLatencySql)),
    QueryDef("q146_rolling_distinct", rollingDistinct, Some(rollingDistinctSql)),
    QueryDef("q142_top_paths", topPaths, Some(topPathsSql)),
    QueryDef("q117_json_props", jsonProps, Some(jsonPropsSql)),
    QueryDef("q96_funnel_stages", funnelStages, Some(funnelStagesSql)),
    QueryDef("q42_hourly_window", hourlyWindow, Some(hourlyWindowSql)),
    QueryDef("q43_running_value", runningValue, Some(runningValueSql)),
  )
}
