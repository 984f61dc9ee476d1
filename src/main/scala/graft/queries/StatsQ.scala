package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Statistical / sampling / aggregation-shape operators rounding out the
  * analytics surface: deterministic sampling, fixed-width histograms,
  * second-order moments, ordered string aggregation, conditional aggregates.
  */
object StatsQ {

  /** Deterministic 10% sample via md5 bucketing — unlike `TABLESAMPLE` /
    * `rand()`, the SAME rows are sampled on any engine, any partitioning,
    * any rerun (the only sampling that is debuggable at 100 TB). Bucket =
    * 60-bit md5 of the id, mod 100.
    */
  def deterministicSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("bucket",
        pmod(graft.ops.Dedup.hash60(col("doc_id").cast("string")), lit(100L)))
      .filter(col("bucket") < 10)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("bucket"))
  }

  private val deterministicSampleSql = Oracles("stats", "deterministicSample")

  /** Deterministic STRATIFIED sample — up to `n` rows per group (smaller
    * strata return all their rows), chosen by md5 rank (the per-group
    * companion of [[deterministicSample]]: a training-data curation
    * primitive for class-balanced-capped subsets that is reproducible on
    * any engine/partitioning). One window over the group key; the hash
    * makes the order — and therefore the selection — content-derived, not
    * physical.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val h = md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
    val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
      .orderBy(col("h"), col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    // spread: Spark 4's WindowGroupLimit already bounds the exchange to
    // ≤ partitions·groups·50 rows, but its map-side Sort (and the md5 of
    // every row) runs on the 1-split gate-scale scan as ONE task —
    // spreading parallelizes the local sort+limit; identity at production
    // split counts (per-site rule, r19)
    Tables.spread(t.lineitem)
      .withColumn("h", h)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 50)
      .select(col("l_returnflag"), col("l_linestatus"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"), col("rk"))
  }

  private val stratifiedSampleSql = Oracles("stats", "stratifiedSample")

  /** Fixed-width histogram of extended price (20 buckets of 5500 from 0):
    * the distributed profile scan behind threshold generation (A15's
    * exploratory side).
    */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .withColumn("bucket", floor(col("l_extendedprice") / 5500.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
  }

  private val priceHistogramSql = Oracles("stats", "priceHistogram")

  /** Second-order moments per return flag — stddev / correlation /
    * covariance, rounded(6) on both sides (the one aggregate family where
    * float summation order is inherent; error ~1e-12 ≪ the rounding scale).
    */
  def moments(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 6).as("price_stddev"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_covar"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"))
  }

  private val momentsSql = Oracles("stats", "moments")

  /** Ordered string aggregation + conditional aggregates per region:
    * sorted-concat of nation names (deterministic collect), count_if-style
    * filters, bool_or.
    */
  def regionSummary(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.nation
      .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
      .join(t.supplier, col("s_nationkey") === col("n_nationkey"), "left")
      .groupBy(col("r_name"))
      .agg(
        array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"),
        count(col("s_suppkey")).as("n_suppliers"),
        count(when(col("s_acctbal") > 0.0, 1)).as("n_positive_bal"),
        max(col("s_acctbal") < 0.0).as("has_negative_bal"))
  }

  private val regionSummarySql = Oracles("stats", "regionSummary")

  /** Date/conditional scalar family: add_months, last_day, quarter trunc,
    * greatest/least, nullif — per-order derivations (the §2.8 scalar surface
    * beyond what the trend queries already exercise).
    */
  def dateFunctions(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.orders
      .withColumn("d", col("o_orderdate").cast("date"))
      .select(
        col("o_orderkey"),
        col("d").as("order_date"),
        add_months(col("d"), 3).as("plus_3_months"),
        last_day(col("d")).as("month_end"),
        date_trunc("quarter", col("d")).cast("date").as("quarter_start"),
        quarter(col("d")).as("qtr"),
        greatest(col("o_totalprice"), lit(50000.0)).as("price_floor_50k"),
        nullif(col("o_orderstatus"), lit("O")).as("status_non_open"))
  }

  private val dateFunctionsSql = Oracles("stats", "dateFunctions")

  /** q98 — Spearman rank correlation between quantity and price per return
    * flag: two `row_number` rankings over ONE l_returnflag exchange (same
    * partitioning, different orders — partition-local sorts), then
    * ρ = 1 − 6·Σd²/(n(n²−1)). Both rankings carry the full unique line-item
    * key (ok, ln, pk, sk — NOTES.md: unique at the sf0.01 gate) as
    * tiebreak, so ranks are permutations and Σd² is an EXACT integer sum
    * (order-independent, no decimal needed; n³ < 2⁵³ keeps the one double
    * expression exact too).
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val tie = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"))
    val wq = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity") +: tie: _*)
    val wp = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice") +: tie: _*)
    t.lineitem
      .withColumn("rx", row_number().over(wq))
      .withColumn("ry", row_number().over(wp))
      // widen BEFORE squaring: row_number is 32-bit and d² overflows INT
      // once a group passes ~46k rows (sf1 does)
      .withColumn("d", col("rx").cast("long") - col("ry"))
      // d² and Σd² in DECIMAL(38,0): a LONG Σd² overflows past ~3M rows
      // per group (≈ n³/3 > 2⁶³ — the round-14 30× bracket hit it), and
      // d² itself overflows past ~4.3e9 rows; exactness is unchanged
      .withColumn("d2",
        col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("d2")).cast("decimal(38,0)").as("sum_d2"))
      .withColumn("rho",
        lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
          (col("n").cast("double") *
            (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
      // gate-facing projection: the DECIMAL(38,0) accumulation stays
      // internal; >64-bit integers ship as STRING (digits only, identical
      // text on Spark and DuckDB) because int128-backed decimals hash
      // differently across the two engines under the driver's gate
      // (round-14 regression: q98/q248 hash-fail with cell-exact values)
      .withColumn("sum_d2", col("sum_d2").cast("string"))
  }

  private val spearmanSql = Oracles("stats", "spearman")

  /** q98's statistic over the STRICT 6-column order q248 uses (the
    * 4-column tiebreak is not unique at sf0.001 — one pair differs only
    * in quantity/price). Identical to spearmanSql wherever the 4-column
    * key is unique (it is at the sf0.01 gate).
    */
  private val spearmanDistributedSql = Oracles("stats", "spearmanDistributed")

  /** q248 — Spearman ρ via the DISTRIBUTED two-phase ranking
    * ([[graft.ops.Ranking.rowNumber]]) — q98's scale sibling in the
    * q130/q234 pattern: the SAME exact statistic (bit-identical ranks:
    * the order keys carry the full unique line-item tiebreak) through a
    * plan whose parallelism does not collapse to |l_returnflag| = 3
    * tasks. Both rankings range-repartition 32-way, rank locally, and
    * offset through driver-summed per-span run-lengths; the second
    * ranking CHAINS over the first's output with `rx` as payload, so the
    * (rx, ry) pairing never joins (round 17 — the old 6-column-key hash
    * join of two full-width sides is gone). The oracle is q98's,
    * verbatim — a two-phase off-by-one, span-offset slip, or
    * boundary-dependent tie would shift Σd² and cannot hash-match.
    *
    * Scale shape: two chained range shuffles, all 32-way (and N-way on
    * a cluster) — versus q98's single exchange into three tasks. Slower
    * at sf0.1, unbounded fan-out at 100 TB; BASELINE round 14 documents
    * the ceiling this removes.
    */
  def spearmanDistributed(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // q98's 4-column tiebreak is unique at the sf0.01 gate but NOT at
    // sf0.001 (one pair differs only in quantity/price) — the two-phase
    // ranking REQUIRES a strict total order per group, so both rankings
    // carry the full 6-column composite in their order keys (and the
    // oracle below orders by the same columns). That strictness is the
    // SOLE reason for the wide composite: the old pairing join on it is
    // gone (chained re-rank below), so do not prune it back to tie4.
    val tie4 = Seq(col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"))
    val key = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
      "l_quantity", "l_extendedprice")
    val base = t.lineitem.select(
      (col("l_returnflag") +: key.map(col)): _*)
    // CHAINED re-rank, not two independent rankings joined back (round
    // 17, VERDICT r16 item 2): the second ranking runs over the FIRST
    // ranking's output with `rx` carried along as payload, so the per-row
    // (rx, ry) pairing needs NO join at all — the old shape hash-joined
    // two 6-column-composite-keyed sides (both shuffled), the widest
    // stages of the query. Same statistic, same ranks: each ranking is a
    // row's position in its own strict total order, independent of input
    // partitioning or carried columns.
    val rx = graft.ops.Ranking.rowNumber(base,
      Seq(col("l_returnflag")),
      (col("l_quantity") +: tie4) :+ col("l_extendedprice"), "rx", 32)
    graft.ops.Ranking.rowNumber(rx,
      Seq(col("l_returnflag")),
      (col("l_extendedprice") +: tie4) :+ col("l_quantity"), "ry", 32)
      .withColumn("d", col("rx").cast("long") - col("ry"))
      .withColumn("d2", // decimal before squaring — see q98's overflow note
        col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("d2")).cast("decimal(38,0)").as("sum_d2"))
      .withColumn("rho",
        lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
          (col("n").cast("double") *
            (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
      // same gate-type convention as q98: >64-bit integer ships as STRING
      .withColumn("sum_d2", col("sum_d2").cast("string"))
  }

  /** q99 — deterministic table fingerprint: per-group row checksum (first 8
    * md5 hex chars of a canonical `|`-joined row string, summed exactly) —
    * the replica-verification primitive: two copies of a 100 TB table
    * compare by exchanging 3 rows. Doubles are excluded from the canonical
    * string (float-to-text differs across engines); the timestamp joins as
    * unix_micros. The BIGINT sum holds ~2×10⁹ rows per group (9.2e18 /
    * 4.3e9); beyond that, switch both sides to a DECIMAL(38,0) sum — same
    * exactness, wider headroom.
    */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.lineitem
      .withColumn("h", conv(substring(md5(concat_ws("|",
        col("l_orderkey").cast("string"), col("l_linenumber").cast("string"),
        col("l_partkey").cast("string"), col("l_suppkey").cast("string"),
        col("l_returnflag"), col("l_linestatus"),
        unix_micros(col("l_shipdate").cast("timestamp")).cast("string"))),
        1, 8), 16, 10).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("checksum"))
  }

  private val tableChecksumSql = Oracles("stats", "tableChecksum")

  /** q103 — deterministic WEIGHTED Bernoulli sample: each document's keep
    * probability scales with its length (here min(1, n_chars/2000) — stand-in
    * for any quality weight), decided by an integer compare between a
    * 60-bit md5 residue and the micro-unit weight. Entirely map-side, same
    * rows on any engine/partitioning/rerun (q57's property, extended to
    * non-uniform weights — the quality-weighted downsampling a curation
    * pipeline actually runs). No floats anywhere: weight_u = min(1e6,
    * n_chars·500) exactly.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("w_u", least(lit(1000000L), col("n_chars") * 500L))
      .withColumn("r_u",
        pmod(graft.ops.Dedup.hash60(col("doc_id").cast("string")), lit(1000000L)))
      .filter(col("r_u") < col("w_u"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("w_u"))
  }

  private val weightedSampleSql = Oracles("stats", "weightedSample")

  /** q108 — robust outlier detection per group: median/MAD z-scores
    * (|x − med| > 3.5·1.4826·MAD), the statistically-sound upgrade of the
    * reference's fixed min/max thresholds (U5/q45 family — mean/stddev
    * break under the very outliers they hunt; median/MAD don't). Two
    * exact `percentile` passes (median, then median absolute deviation)
    * joined back broadcast; the flag threshold uses the single literal
    * 5.1891 (= 3.5·1.4826 exactly, avoiding a cross-engine
    * literal-product) and counts a deterministic double comparison — no
    * rounding needed anywhere.
    *
    * `mode` is the 100 TB knob ([[graft.ops.Percentiles]]): both median
    * passes buffer one group's values in exact mode; approx mode swaps in
    * the mergeable sketch with a rank-error bound (PercentileModeSpec
    * pins that the flag set is stable under the swap on fixture data).
    */
  def robustOutliers(spark: SparkSession, dir: String,
      mode: graft.ops.Percentiles.Mode = graft.ops.Percentiles.Exact): DataFrame = {
    val t = Tables(spark, dir)
    val orders = t.orders
    val m = graft.ops.Percentiles.resolve(orders, Seq(col("o_orderpriority")), mode)
    val med = orders.groupBy(col("o_orderpriority"))
      .agg(graft.ops.Percentiles.pctl(col("o_totalprice"), 0.5, m).as("med"))
    // checkpoint: dev feeds BOTH the MAD broadcast build and the final
    // probe — un-persisted, the scan + median-join executed twice
    // (q151/q139 pattern). Reused and data-sized — guide-§5 persist case.
    val dev = orders.join(broadcast(med), "o_orderpriority")
      .withColumn("absdev", abs(col("o_totalprice") - col("med")))
      .localCheckpoint(true)
    val stats = dev.groupBy(col("o_orderpriority"))
      .agg(graft.ops.Percentiles.pctl(col("absdev"), 0.5, m).as("mad"))
    dev.join(broadcast(stats), "o_orderpriority")
      .withColumn("robust_z",
        when(col("mad") =!= 0.0,
          round(col("absdev") / (lit(1.4826) * col("mad")), 6)))
      .withColumn("is_outlier",
        col("mad") =!= 0.0 &&
          col("absdev") > lit(5.1891) * col("mad")) // 3.5 · 1.4826, one literal
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"), col("robust_z"), col("is_outlier"))
  }

  private val robustOutliersSql = Oracles("stats", "robustOutliers")

  /** q109 — key-space integrity audit (the lost-batch detector): bucket the
    * key domain (`key div 1000`), and per bucket report span vs distinct
    * count (`missing_within`) plus the gap to the previous NON-EMPTY
    * bucket's max (`gap_to_prev`, via a lag window over the TINY bucket
    * summary). Detects dropped ranges and duplicate keys without ever
    * sorting the full table globally — the global-sequence formulation
    * (`lead` over all keys) is a single-reducer sort at 100 TB; this is one
    * hash agg plus a window over thousands of bucket rows.
    */
  def keyIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val buckets = t.orders
      .groupBy(expr("o_orderkey div 1000").as("bucket")) // integer div: exact at any key magnitude
      .agg(
        countDistinct(col("o_orderkey")).as("n_keys"),
        count(lit(1)).as("n_rows"), // n_rows > n_keys ⇒ duplicate keys
        min(col("o_orderkey")).as("k_min"),
        max(col("o_orderkey")).as("k_max"))
      .withColumn("missing_within",
        col("k_max") - col("k_min") + 1 - col("n_keys"))
    val w = Window.orderBy(col("bucket"))
    buckets
      .withColumn("gap_to_prev",
        col("k_min") - lag(col("k_max"), 1).over(w) - 1)
      .select(col("bucket"), col("n_keys"), col("n_rows"), col("k_min"),
        col("k_max"), col("missing_within"), col("gap_to_prev"))
  }

  private val keyIntegritySql = Oracles("stats", "keyIntegrity")

  /** q114 — deterministic train/val/test split: each document hashes to a
    * 32-bit value (first 8 md5 hex chars of a salted id) compared against
    * pinned integer thresholds at 80% / 90% of 2³² — pure map-side, zero
    * shuffles (the 100-TB shape: split assignment must not require a
    * per-stratum sort; exact-count splits need rank-within-stratum, which
    * q57's top-n-per-group demonstrates). Because the hash is independent
    * of any attribute, every stratum (lang, source, …) inherits the same
    * ~80/10/10 proportions — stratification without grouping. The salt
    * ("split|") decorrelates this hash from q57's sampling hash, so split
    * and sample membership are independent. Assignments are permanent: a
    * document never changes split when the corpus grows — the property
    * decontamination (q83) depends on.
    */
  def stratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val v = conv(substring(md5(concat_ws("|", lit("split"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    t.documents
      .select(col("doc_id"), col("lang"),
        when(v < 3435973836L, lit("train"))        // floor(0.8 * 2^32)
          .when(v < 3865470566L, lit("val"))       // floor(0.9 * 2^32)
          .otherwise(lit("test")).as("split"))
  }

  private val stratifiedSplitSql = Oracles("stats", "stratifiedSplit")

  /** q125 — domain-MIXTURE resampling: the step that turns a raw crawl
    * into a training mix ("web 40%, code 30%, …"). Per-source target
    * weights (here md5-derived 1–5, standing in for the mix config),
    * a global budget of 40% of corpus chars, per-source acceptance rate =
    * min(1, source_budget / source_chars), and a deterministic per-doc
    * hash accept at that rate (q103's integer-compare convention — same
    * rows on any engine/partitioning/rerun).
    *
    * All rate arithmetic is exact BIGINT in KILO-char units: at 100 TB,
    * `chars × 1e6` overflows int64 (1e14·1e6 > 2⁶³) but `kchars × 1e6`
    * does not — the unit choice IS the overflow guard, and it only
    * quantizes the control-plane rate table (20 rows), not the data.
    * Shape: two tiny aggs (per-source, corpus total) broadcast back, then
    * one map-side filter over the corpus — no data-plane shuffle at all.
    */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select(col("doc_id"), col("source"), col("n_chars"))
    // ONE sizing pass (r19, the q150 rates fix): per is checkpointed
    // (source-grain, bounded) so the weight total is a control-plane
    // read, and the corpus total rides per — Σ_s chars_s ≡ Σ n_chars
    // EXACTLY (exact BIGINT sums; the div-1000 floor applies after the
    // identical total). The old plan re-ran the corpus agg per reader
    // (runtime plan audit: documents scanned 4×).
    val per = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("chars_s"))
      .withColumn("ks_s", greatest(lit(1L), expr("chars_s div 1000")))
      .withColumn("w_s", graft.ops.Dedup.hash60(col("source")) % 5 + 1)
      .localCheckpoint(true)
    val tot = per.agg(expr("sum(chars_s) div 1000").as("ks_tot"))
    val sumw = per.agg(sum(col("w_s")).as("sum_w"))
    val rates = per.crossJoin(broadcast(tot)).crossJoin(broadcast(sumw))
      .withColumn("rate_u", least(lit(1000000L),
        expr("(ks_tot * 2 div 5) * w_s div sum_w * 1000000 div ks_s")))
      .select(col("source"), col("rate_u"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(pmod(graft.ops.Dedup.hash60(col("doc_id").cast("string")),
        lit(1000000L)) < col("rate_u"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("rate_u"))
  }

  private val mixtureResampleSql = Oracles("stats", "mixtureResample")

  /** q130 — EQUI-DEPTH (decile) histogram of order totals: the
    * optimizer-statistics / drift-monitoring companion of q58's
    * equi-WIDTH histogram (equal-count bins adapt to skew; equal-range
    * bins don't). Nine exact interpolated deciles from ONE `percentile`
    * aggregate (single pass — not 9 sort jobs), broadcast as a 1-row
    * frame; bin assignment is a map-side chain of strictly-greater
    * comparisons (`bin = Σ (x > tⱼ)`, so boundary ties land LOW in both
    * engines deterministically), then one per-bin aggregate. The
    * interpolation arithmetic (`a + (b−a)·frac`) is the same IEEE
    * sequence in Spark `percentile` and DuckDB `quantile_cont` — the
    * q11/q44/q108 cross-engine precedent.
    *
    * Scale note: exact `percentile` over ONE global group buffers the
    * column in a single aggregation state — fine at the oracle gate, but
    * at 100 TB the bounds step swaps to [[graft.ops.Percentiles.Approx]]
    * (Greenwald–Khanna sketch, mergeable, bounded state) and trades the
    * exact oracle for a rank-error-bound assert (the q48 sketch pattern —
    * q234 runs THIS operator in approx mode under that gate). The binning
    * plan — broadcast bounds, map-side comparison chain — is unchanged;
    * only the bounds aggregation differs.
    */
  /** The ONE decile-bounds aggregation q130 bins with and q234 gates —
    * shared so the gate can never drift from the computation it certifies.
    */
  private def decileBounds(x: DataFrame,
      mode: graft.ops.Percentiles.Mode): DataFrame = {
    val m = graft.ops.Percentiles.resolve(x, Seq.empty, mode)
    // ONE array-percentile aggregate (single value buffer / sketch) — nine
    // scalar pctl() calls each buffered the whole column independently
    // (9× the aggregation state and sort work; guide §1.2 per-task work)
    x.agg(graft.ops.Percentiles.pctls(col("x"), (1 to 9).map(_ / 10.0), m)
        .as("ts"))
      .select((1 to 9).map(j => col("ts").getItem(j - 1).as(s"t$j")): _*)
  }

  def equidepthHistogram(spark: SparkSession, dir: String,
      mode: graft.ops.Percentiles.Mode = graft.ops.Percentiles.Exact): DataFrame = {
    val t = Tables(spark, dir)
    // spread: both the bounds aggregation (value-buffering percentile
    // partials) and the binning pass otherwise run on the 1-split orders
    // scan — one task owns the whole column (round-19 stage log: 3-task
    // stage, med 0.0 / max 1.2 s). Projection first so the round-robin
    // exchange carries one double per row (guide §2.3/§2.5).
    val x = Tables.spread(t.orders.select(col("o_totalprice").as("x")))
    val bounds = decileBounds(x, mode)
    val bin = (1 to 9).map(j =>
      when(col("x") > col(s"t$j"), 1).otherwise(0)).reduce(_ + _)
    x.crossJoin(broadcast(bounds))
      .withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("lo"), max(col("x")).as("hi"),
        graft.ops.Exact.dsum(col("x")).as("total"))
  }

  private val equidepthHistogramSql = {
    val qs = (1 to 9).map(j => s"quantile_cont(o_totalprice, 0.$j) AS t$j")
      .mkString(", ")
    val bin = (1 to 9).map(j => s"CASE WHEN x > t$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH b AS (SELECT $qs FROM orders),
       |assigned AS (
       |  SELECT o_totalprice AS x, CAST($bin AS INT) AS bin
       |  FROM orders CROSS JOIN b)
       |SELECT bin, COUNT(*) AS n, MIN(x) AS lo, MAX(x) AS hi,
       |  ${graft.ops.OracleSql.dsum("x")} AS total
       |FROM assigned GROUP BY bin""".stripMargin
  }

  /** q234 — the 100 TB percentile path UNDER THE ORACLE GATE: q130's
    * equi-depth bounds recomputed in [[graft.ops.Percentiles.Approx]] mode
    * (accuracy 10000), with the sketch's rank-error contract verified
    * inside the plan and exported as per-decile booleans the oracle
    * asserts (the q48 sketch-gating pattern — an approximate value can't
    * hash-match a cross-engine exact, but its ERROR BOUND can).
    *
    * For each approx decile tⱼ, the empirical rank fraction
    * |{x ≤ tⱼ}| / n must sit within 0.005 of j/10 — 50× the sketch's
    * guaranteed n/accuracy rank error at gate scale, slack for duplicate
    * values (the count includes every tie of tⱼ), and 20× tighter than
    * the 10%-wide decision the bounds feed. The verification aggregation
    * is itself scale-shaped: one pass, map-side comparisons against the
    * broadcast 1-row bounds, constant output.
    */
  def equidepthApproxGate(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.Percentiles
    val t = Tables(spark, dir)
    // same spread rationale as q130 (shared 1-split orders scan)
    val x = Tables.spread(t.orders.select(col("o_totalprice").as("x")))
    val bounds = decileBounds(x, Percentiles.Approx(10000))
    val ranked = x.crossJoin(broadcast(bounds))
      .agg(count(lit(1)).as("n"),
        (1 to 9).map(j =>
          sum(when(col("x") <= col(s"t$j"), 1L).otherwise(0L)).as(s"r$j")): _*)
    val perDecile = array((1 to 9).map(j => struct(
      lit(j).as("decile"),
      (abs(col(s"r$j") / col("n") - lit(j / 10.0)) <= lit(0.005)).as("rank_ok"))): _*)
    ranked.select(explode(perDecile).as("d"))
      .select(col("d.decile").as("decile"), col("d.rank_ok").as("rank_ok"))
  }

  /** The oracle asserts the CONTRACT (every decile inside its rank-error
    * bound), not the sketch values — the q48 precedent for approximate
    * operators.
    */
  private val equidepthApproxGateSql = Oracles("stats", "equidepthApproxGate")

  /** q140 — referential-integrity audit across the star schema: per FK
    * relationship, total child rows and ORPHANS (child keys with no
    * parent) — q109 finds holes inside ONE key space; this finds broken
    * edges BETWEEN tables (the replication/partial-load detector). Each
    * relationship is one left_anti join against the parent's key
    * projection — dimension parents broadcast; the orders parent
    * anti-join shuffles on the key like any fact⋈fact. Constant-size
    * output (one row per relationship), exact counts.
    *
    * NULL semantics are PINNED on both sides, because dirty data is this
    * query's whole subject: a NULL child key IS an orphan (it references
    * no parent), and a NULL parent key matches nothing. `left_anti`
    * gives exactly that; the oracle uses `NOT EXISTS (… WHERE parent =
    * child)` — which agrees on both cases — and deliberately NOT
    * `NOT IN`, whose three-valued logic reports ZERO orphans for every
    * child the moment the parent key set contains a single NULL.
    */
  def fkAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def audit(name: String, child: DataFrame, childKey: String,
        parent: DataFrame, parentKey: String, bcast: Boolean) = {
      // ONE pass per relationship (r19): the old anti-join + separate
      // count(*) scanned the child twice; a left join against the
      // DISTINCT key set (multiplicity 1, so row counts are preserved)
      // yields both aggregates from the same probe — n_orphans = rows
      // whose parent key never matched. Same join strategy as before
      // (broadcast where the parent is small, shuffle for orders).
      val keys = parent.select(col(parentKey).as(childKey)).distinct()
        .withColumn("__hit", lit(1))
      child
        .join(if (bcast) broadcast(keys) else keys, Seq(childKey), "left")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("__hit").isNull, 1)).as("n_orphans"))
        .select(lit(name).as("relationship"), col("n_rows"), col("n_orphans"))
    }
    Seq(
      audit("lineitem.orderkey->orders", t.lineitem, "l_orderkey",
        t.orders.select(col("o_orderkey").as("l_orderkey")), "l_orderkey", bcast = false),
      audit("lineitem.partkey->part", t.lineitem, "l_partkey",
        t.part.select(col("p_partkey").as("l_partkey")), "l_partkey", bcast = true),
      audit("lineitem.suppkey->supplier", t.lineitem, "l_suppkey",
        t.supplier.select(col("s_suppkey").as("l_suppkey")), "l_suppkey", bcast = true),
      audit("orders.custkey->customer", t.orders, "o_custkey",
        t.customer.select(col("c_custkey").as("o_custkey")), "o_custkey", bcast = true),
      audit("customer.nationkey->nation", t.customer, "c_nationkey",
        t.nation.select(col("n_nationkey").as("c_nationkey")), "c_nationkey", bcast = true),
    ).reduce(_ unionByName _)
  }

  private val fkAuditSql = Oracles("stats", "fkAudit")

  /** q143 — per-group quantile normalization (the rank-based feature
    * scaling ML prep uses when distributions are skewed or cross-group
    * comparable features are needed): within each language,
    * `percent_rank` and `cume_dist` of document length, plus the [0,1]
    * normalized feature. Both are exact integer-ratio doubles
    * ((rank−1)/(n−1), rank/n) over a UNIQUE ordering (n_chars, doc_id),
    * so engines agree bit-for-bit with no rounding. Windows partition by
    * lang — partitions scale out; no global order anywhere.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    // Window form KEPT after a measured round-15 A/B (VERDICT r14 item 4,
    // BASELINE round 15): PARTITION BY lang pins the rank sorts at |lang|
    // = 5 tasks — the q98 ceiling SHAPE — but documents volumes keep each
    // group 3 orders of magnitude below the window/two-phase crossover
    // (q98's was ~20M rows/group), and the q248-pattern rewrite measured
    // 2.2–2.3× SLOWER at every available point (sf0.1/10×/100×). The swap
    // is mechanical when a profile justifies it: rank == row_number here
    // (strict order), pr = (rn-1)/(n-1), cd = rn/n over
    // [[graft.ops.Ranking.rowNumber]] + a |lang|-row broadcast count.
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    t.documents
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
  }

  private val quantileNormalizeSql = Oracles("stats", "quantileNormalize")

  /** q249 — q143's SCALE sibling (the q248 pattern): the same
    * percent_rank/cume_dist statistics through the two-phase distributed
    * ranking instead of a |lang|=5-task window. The order (n_chars,
    * doc_id) is STRICT, so rank == row_number and both statistics have
    * closed forms over exact integers:
    * pr = (rn-1)/(n-1) (0.0 when n == 1 — Spark's own branch), cd = rn/n,
    * with n from a |lang|-row broadcast count. One IEEE divide each —
    * bit-identical to both engines' window implementations, which is why
    * the oracle is q143's VERBATIM. Slower at gate scale (A/B table,
    * BASELINE round 15); unbounded fan-out at 100 TB, where the window's
    * 5 tasks are a hard wall.
    */
  def quantileNormalizeDistributed(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = t.documents.select(col("doc_id"), col("lang"), col("n_chars"))
    val ranked = graft.ops.Ranking.rowNumber(base,
      Seq(col("lang")), Seq(col("n_chars"), col("doc_id")), "rn", 32)
    val counts = base.groupBy(col("lang")).agg(count(lit(1)).as("__n"))
      .withColumnRenamed("lang", "__cl")
    // null-safe join (this round's lesson class): a NULL lang forms its own
    // window partition, but a plain inner equi-join would silently drop it
    ranked.join(broadcast(counts), col("lang") <=> col("__cl"))
      .drop("__cl")
      .withColumn("pr",
        when(col("__n") > 1,
          (col("rn") - 1).cast("double") / (col("__n") - 1).cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("cd", col("rn").cast("double") / col("__n").cast("double"))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("pr"), col("cd"))
  }

  /** q144 — weighted sampling WITHOUT replacement (Efraimidis–Spirakis):
    * key = ln(u)/w with u an md5-derived uniform in (0,1], take the
    * top-k keys — each item's inclusion probability is proportional to
    * its weight, exactly k rows come back, and (unlike q103's Bernoulli
    * sampler) the sample size is fixed. Deterministic end to end: u is
    * the same 60-bit integer ratio on any engine, ln/divide are the IEEE
    * ops of the q87/q91 precedent, and the top-k is
    * `TakeOrderedAndProject` with a doc_id tiebreak — map-side keys, no
    * shuffle of the corpus, the ONE pass a weighted reservoir needs.
    */
  def weightedTopkSample(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .withColumn("u",
        (graft.ops.Dedup.hash60(col("doc_id").cast("string")) + 1).cast("double")
          / lit(1152921504606846976.0)) // 2^60; +1 keeps u in (0,1]
      .withColumn("es_key",
        log(col("u")) / greatest(col("n_chars"), lit(1L)).cast("double"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("es_key"), 9).as("es_key"))
  }

  private val weightedTopkSampleSql = Oracles("stats", "weightedTopkSample")

  /** q149 — Poisson-bootstrap confidence interval for the mean order
    * value: the uncertainty-quantification technique that actually works
    * distributed (classic resampling needs global coordination; Poisson
    * bootstrap gives every row an INDEPENDENT Poisson(1) replica weight,
    * so it's one map-side expression per (row, replica)). 40 replicas,
    * weights from the md5-uniform inverse CDF (cumulative Poisson(1)
    * thresholds as literals — the identical when-chain in both engines),
    * replica means from exact decimal-cent sums, CI = interpolated
    * 2.5%/97.5% percentiles over the 40 means. Deterministic end to end —
    * same CI on any engine, partitioning, or rerun.
    *
    * Scale note: the ×40 fan-out is map-side over the FACT scan — linear
    * cost, no shuffle growth (the agg keys are 40 replicas); at 100 TB
    * you either accept the 40× scan-side arithmetic (it pipelines) or
    * bootstrap per-partition summary statistics instead.
    */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // cumulative Poisson(1): P(X<=k), k=0..5; >thresh(5) → weight 6
    val cdf = Seq(0.367879441, 0.735758882, 0.919698603,
      0.981011843, 0.996340153, 0.999405815)
    // digest thrift (the minhash twin-window trick, 3-way): ONE md5 and
    // ONE conv per (row, digest-group), split into THREE 20-bit windows
    // by integer shifts — 14 digests+convs per row instead of 40 of each.
    // Power-of-two window divisor ⇒ no modular bias; u resolution 2⁻²⁰,
    // far below the bootstrap's own resampling noise. With the
    // exact-cents agg below: 16.4 s → 6.5 s standalone at sf0.1 (2.5×).
    // spread: 14 md5+conv per row over the 1-split orders scan otherwise
    // single-threads the whole fan-out (measured 6–43 s; ~1 s spread)
    val b = Tables.spread(t.orders).select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      // in-row fan (explode of a literal sequence stays inside whole-stage
      // codegen; a crossJoin against range() is a BroadcastNestedLoopJoin
      // materialization per row)
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(1L), lit(14L))).as("g"))
      .withColumn("d", md5(concat(col("o_orderkey").cast("string"),
        lit(":"), col("g").cast("string"))))
      .withColumn("h", expr("CAST(conv(substring(d, 1, 15), 16, 10) AS BIGINT)"))
      .select(col("cents"), col("g"),
        posexplode(expr(
          "transform(sequence(0, 2), wi -> shiftright(h, 20 * wi) & 1048575L)"))
          .as(Seq("wi", "hu")))
      .withColumn("rep", (col("g") - 1) * 3 + col("wi") + 1)
      .filter(col("rep") <= 40)
      .withColumn("u", col("hu").cast("double") / 1048576.0)
      .withColumn("w",
        cdf.zipWithIndex.foldRight(lit(6): org.apache.spark.sql.Column) {
          case ((th, k), rest) => when(col("u") <= th, k).otherwise(rest)
        })
    // exact-cents longs, not DECIMAL: the 6M decimal multiplies were
    // ~4.5 s of the agg side (11.0 s → 6.5 s measured); w·cents stays
    // exact in int64 to ~10¹² orders (q132 convention), and the one
    // double division per replica is pinned identically in the oracle
    val means = b.groupBy(col("rep"))
      .agg((sum(col("w") * col("cents")).cast("double") / 100.0
        / sum(col("w"))).as("m"))
    means.agg(
      count(lit(1)).as("n_replicas"),
      round(avg(col("m")), 6).as("boot_mean"),
      round(expr("percentile(m, 0.025)"), 6).as("ci_lo"),
      round(expr("percentile(m, 0.975)"), 6).as("ci_hi"))
  }

  private val bootstrapCiSql = Oracles("stats", "bootstrapCi")

  /** q162 — K-ANONYMITY audit over quasi-identifiers: equivalence-class
    * size histogram for the (nation, market segment, $1000
    * account-balance band) triple — the standard re-identification risk
    * readout for a dataset release (a class of size 1 means a record is
    * unique on its quasi-identifiers; k<5 is the conventional "at risk"
    * line). Complements q145's pseudonymization: hashing direct
    * identifiers does nothing about quasi-identifier uniqueness.
    *
    * Balance bands are EXACT-CENTS integer arithmetic (the q132
    * convention — `round(bal*100)::BIGINT div 100000`), so band edges
    * can't float-drift between engines.
    *
    * Scale shape: one hash aggregate on the QI triple (map-side partial
    * combine does the heavy lifting), one tiny re-aggregate on the class
    * size, plus a broadcast 1-row total for the ppm — the class table is
    * at most one row per QI combination, never data-sized.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val classes = t.customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("k"))
    val tot = classes.agg(sum(col("k")).as("n_total"))
    classes.groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_records"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("n_classes"), col("n_records"),
        (col("k") < 5).as("at_risk"),
        expr("n_records * 1000000L div n_total").as("records_ppm"))
  }

  private val kAnonymitySql = Oracles("stats", "kAnonymity")

  /** q209 — L-DIVERSITY audit over the q162 quasi-identifier classes:
    * distinct-sensitive-value counts (exact-cents account balance as the
    * sensitive attribute) per equivalence class. Completes the privacy
    * pair: k-anonymity bounds RE-IDENTIFICATION (class size), but a
    * large class whose members all share one sensitive value still
    * discloses that value to anyone who can place a record in the class
    * — l < 3 is the conventional homogeneity-risk line. Same QI triple
    * and exact-cents integer banding as q162, so the two audits read on
    * identical classes.
    *
    * Scale shape: two stacked hash aggs — (QI, sensitive) then QI —
    * keep the distinct count Expand-free (the q15 recipe); the l
    * histogram and broadcast 1-row total are class-table-sized, never
    * data-sized.
    */
  def lDiversity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val perVal = t.customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("bal_band"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_cents"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"),
        col("bal_cents"))
      .agg(count(lit(1)).as("c"))
    val classes = perVal
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(sum(col("c")).as("k"), count(lit(1)).as("l"))
    val tot = classes.agg(sum(col("k")).as("n_total"))
    classes.groupBy(col("l"))
      .agg(count(lit(1)).as("n_classes"), sum(col("k")).as("n_records"))
      .crossJoin(broadcast(tot))
      .select(col("l"), col("n_classes"), col("n_records"),
        (col("l") < 3).as("at_risk"),
        expr("n_records * 1000000L div n_total").as("records_ppm"))
  }

  private val lDiversitySql = Oracles("stats", "lDiversity")

  /** q214 — T-CLOSENESS audit, completing the privacy triple with q162
    * (k-anonymity: class SIZE) and q209 (l-diversity: value VARIETY):
    * per quasi-identifier class, the ordered Earth Mover's Distance
    * between the class's sensitive-value distribution and the global
    * one (Li et al., ICDE 2007 — a class can be large AND diverse yet
    * still leak if its distribution is skewed vs the population, e.g.
    * "this nation+segment is mostly top-band balances"). QI here is the
    * (nation, segment) pair; the sensitive attribute is the q162 $1000
    * exact-cents balance band, which is ORDERED, so the audit uses the
    * ordinal EMD `Σ|cumΣ(p−q)| / (m−1)`, not plain total-variation.
    *
    * Determinism: p and q are integer micro-unit fractions (floor-div of
    * non-negative counts, where Spark `div` and DuckDB `//` agree); the
    * cumulative differences, their absolute sum, and the final `/(m−1)`
    * are all exact BIGINT — no float anywhere (q131 lift convention).
    *
    * Scale shape: two stacked hash aggs off one (QI, band) count table,
    * then everything runs on the classes×bands GRID (|QI classes| · |m
    * bands| rows — class-table-sized, never data-sized): the global band
    * distribution and the 1-row total broadcast in, the cumulative
    * window partitions by class. No data-plane shuffle after the first
    * aggregate.
    */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    // pv feeds three readers (class sizes, the global band histogram, the
    // grid join) — un-persisted, the data-sized customer agg executed per
    // reader (r19 runtime plan audit: customer scanned 4×). Checkpoint:
    // (nation × segment × band)-grain, bounded at any data scale.
    val pv = t.customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT) div 100000").as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val cls = pv.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("c")).as("k"))
    val gl = pv.groupBy(col("bal_band")).agg(sum(col("c")).as("nc"))
    val tot = gl.agg(sum(col("nc")).as("n_total"), count(lit(1)).as("m"))
    val grid = cls
      .crossJoin(broadcast(gl))
      .join(pv, Seq("c_nationkey", "c_mktsegment", "bal_band"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
      .withColumn("diff_u",
        expr("c * 1000000L div k - nc * 1000000L div n_total"))
    val w = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("bal_band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_u", sum(col("diff_u")).over(w))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("k"), col("m"))
      .agg(sum(abs(col("cum_u"))).as("s"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("k"),
        expr("s div greatest(1L, m - 1L)").as("emd_u"))
      .withColumn("at_risk", col("emd_u") > 200000L)
  }

  private val tClosenessSql = Oracles("stats", "tCloseness")

  /** q218 — DIFFERENTIALLY-PRIVATE count release (ε=0.5 two-sided
    * geometric mechanism): per-nation customer counts published with
    * integer noise drawn by inverse-CDF from the discrete Laplace
    * distribution — the release step after the q162/q209/q214 audits
    * say raw counts are too risky, and the privacy-family capstone
    * (pseudonymize → k-anon → l-div → t-close → DP release). Output
    * keeps the true count beside the released one: this is the
    * CALIBRATION view (per-key absolute error and the ε accounting), the
    * view a data owner signs off on before dropping the true column.
    *
    * Determinism: production DP draws fresh randomness per release; a
    * cross-engine oracle needs the DRAW pinned, so u comes from the q57
    * md5 convention (`hash60('dp:'||key) % 10⁶` — the [[graft.ops
    * .QualityScorer.md5Weights]] demo-weights pattern: swap in a real
    * RNG in production, keep the mechanism). With α=e^(−ε) and ε=0.5 the
    * magnitude is `floor(−2·round(ln(1−v),6))` — ln of an exact small
    * integer ratio is the same IEEE double in both engines, round-6
    * pins it (QueryDef rules), and everything after is exact integer.
    *
    * Scale shape: one nation-keyed hash agg (map-side combine) and a
    * map-side noise projection — release tables are key-space-sized, the
    * mechanism adds zero exchanges.
    */
  def dpRelease(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.customer.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("u", graft.ops.Dedup.hash60(
        concat(lit("dp:"), col("c_nationkey").cast("string"))) % 1000000L)
      .withColumn("sgn", when(col("u") < 500000L, -1L).otherwise(lit(1L)))
      .withColumn("vv",
        when(col("u") < 500000L, (lit(500000L) - col("u")) * 2L)
          .otherwise((col("u") - lit(500000L)) * 2L))
      .withColumn("k", floor(
        round(log((lit(1000000L) - col("vv")).cast("double") / 1000000.0), 6)
          * -2.0).cast("long"))
      .withColumn("noise", col("sgn") * col("k"))
      .select(col("c_nationkey"), col("true_count"), col("noise"),
        greatest(lit(0L), col("true_count") + col("noise")).as("released"),
        abs(col("noise")).as("abs_err"),
        lit(500L).as("epsilon_milli"))
  }

  private val dpReleaseSql = Oracles("stats", "dpRelease")

  /** q220 — training-ORDER shuffle quality (Wald–Wolfowitz runs audit):
    * within each shard, in training order (doc_id), count the RUNS of
    * consecutive same-source documents and compare to the expectation
    * under a random permutation, `E[R] = 1 + (n² − Σnᵢ²)/n`. A ratio
    * well below 1 means source-clumped batches (consecutive gradient
    * steps see one distribution — the thing corpus shuffling exists to
    * prevent); ≈1 means well-mixed. Complements q177 (shard SIZE
    * balance) and q178 (cluster source purity) with the ORDER dimension
    * neither sees.
    *
    * Determinism: run boundaries are exact (lag + string inequality);
    * E[R] and the ratio are the documented rounded-double exception
    * (n² exceeds BIGINT at petabyte shard sizes, so both engines compute
    * the same IEEE expression and round to 6 — QueryDef rules).
    *
    * Scale shape: one (shard, source) hash agg for the expectation
    * terms, and a per-shard ordered lag window for the observed runs.
    * The window keys on ONE-BYTE cardinality (8 shards) — fine at the
    * oracle gate, but at 100 TB this is 8 sort partitions; the scale
    * path chunks the order key (runs stitch exactly across chunk
    * boundaries: ΣchunkRuns − Σ[chunk k+1 starts with chunk k's last
    * source]) — same answer, partition-local sorts. The audit readout
    * is unchanged either way.
    */
  def shuffleRuns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val d = t.documents.select(col("doc_id"), col("source"),
      pmod(col("doc_id"), lit(8L)).cast("int").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    val runs = d
      .withColumn("prev", lag(col("source"), 1).over(w))
      .select(col("shard"),
        when(col("prev").isNull || col("prev") =!= col("source"), 1L)
          .otherwise(0L).as("is_start"))
      .groupBy(col("shard")).agg(sum(col("is_start")).as("n_runs"))
    val exp = d.groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("shard"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_sources"),
        sum(col("c") * col("c")).as("sum_sq"))
    runs.join(exp, Seq("shard"))
      .withColumn("e_runs", round(
        lit(1.0) + (col("n_docs").cast("double") * col("n_docs")
          - col("sum_sq")) / col("n_docs"), 6))
      .select(col("shard"), col("n_docs"), col("n_sources"), col("n_runs"),
        col("e_runs"),
        round(col("n_runs").cast("double") / col("e_runs"), 6)
          .as("runs_ratio"))
  }

  private val shuffleRunsSql = Oracles("stats", "shuffleRuns")

  /** q228 — CHUNK-STITCHED shuffle runs: q220's documented scale
    * formulation, implemented and proven. The global per-shard sort
    * (8 sort partitions at any data size — q220's stated limit) is
    * replaced by chunk-local sorts: `chunk = doc_id div 128` is monotone
    * in the training order, each (shard, chunk) counts its runs
    * independently, and the exact stitching identity
    * `runs = Σ chunkRuns − Σ [chunk k+1 starts with chunk k's last
    * source]` recovers the global count. The ORACLE is q220's global
    * formulation verbatim — the driver's gate is the cross-engine proof
    * that stitched ≡ global, and ChunkStitchSpec pins the same identity
    * in-engine at every chunk width.
    *
    * Determinism: run boundaries and boundary corrections are exact
    * integer/string comparisons; first/last per chunk are
    * `min_by`/`max_by` on the unique doc_id; e_runs/runs_ratio are
    * q220's documented rounded-double exception.
    *
    * Scale shape: the wide window keys on (shard, chunk) — parallelism
    * grows with the data instead of pinning at 8, and each sort is
    * 128 rows regardless of corpus size. The stitch runs on the
    * per-chunk table (rows = corpus/128) with a per-shard lag over the
    * chunk sequence — the q220 8-partition window, but over a
    * 128×-smaller input. The expectation terms are the same
    * (shard, source) hash agg as q220.
    */
  def chunkedRuns(spark: SparkSession, dir: String): DataFrame =
    chunkedRunsWidth(128L)(spark, dir)

  /** q228 core with the chunk width exposed — ChunkStitchSpec proves the
    * stitching identity holds at EVERY width (1 = every row its own
    * chunk, pure boundary corrections; ≥ corpus = one chunk, pure q220).
    */
  def chunkedRunsWidth(width: Long)(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(width >= 1, "chunk width must be positive")
    val t = Tables(spark, dir)
    val d = t.documents.select(col("doc_id"), col("source"),
      pmod(col("doc_id"), lit(8L)).cast("int").as("shard"),
      expr(s"doc_id div ${width}L").as("chunk"))
    val wc = Window.partitionBy(col("shard"), col("chunk")).orderBy(col("doc_id"))
    val perChunk = d
      .withColumn("prev", lag(col("source"), 1).over(wc))
      .groupBy(col("shard"), col("chunk"))
      .agg(
        sum(when(col("prev").isNull || col("prev") =!= col("source"), 1L)
          .otherwise(0L)).as("runs_c"),
        expr("min_by(source, doc_id)").as("first_src"),
        expr("max_by(source, doc_id)").as("last_src"))
    val ws = Window.partitionBy(col("shard")).orderBy(col("chunk"))
    val stitched = perChunk
      .withColumn("prev_last", lag(col("last_src"), 1).over(ws))
      .groupBy(col("shard"))
      .agg((sum(col("runs_c")) -
        sum(when(col("prev_last") === col("first_src"), 1L).otherwise(0L)))
        .as("n_runs"))
    val exp = d.groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("shard"))
      .agg(sum(col("c")).as("n_docs"), count(lit(1)).as("n_sources"),
        sum(col("c") * col("c")).as("sum_sq"))
    stitched.join(exp, Seq("shard"))
      .withColumn("e_runs", round(
        lit(1.0) + (col("n_docs").cast("double") * col("n_docs")
          - col("sum_sq")) / col("n_docs"), 6))
      .select(col("shard"), col("n_docs"), col("n_sources"), col("n_runs"),
        col("e_runs"),
        round(col("n_runs").cast("double") / col("e_runs"), 6)
          .as("runs_ratio"))
  }

  /** q165 — TEMPERATURE-scaled language mixture: the multilingual
    * sampling weights `p_l ∝ c_l^(1/T)` with T=2 (α=0.5), the standard
    * low-resource up-sampling rule (mBERT/XLM exponent smoothing): a
    * language with 4× the documents gets only 2× the sampling weight.
    * Output compares the proportional (T=1) and temperature (T=2) ppm
    * side by side plus each language's boost factor.
    *
    * Determinism: `c^(1/2)` is computed as `floor(sqrt(c · 10⁶))` —
    * the argument is an exact integer ≤2⁵³ so the long→double cast is
    * exact, IEEE sqrt is correctly rounded on both engines, and the
    * floor pins the result to a BIGINT; every downstream ratio is
    * integer ppm (no float division anywhere).
    *
    * Scale shape: one language-keyed hash agg (map-side combine), two
    * broadcast 1-row totals — control-plane after the first agg.
    */
  def temperatureMixture(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val per = t.documents.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
      .withColumn("w",
        expr("CAST(floor(sqrt(CAST(n_docs * 1000000 AS DOUBLE))) AS BIGINT)"))
    val tot = per.agg(sum(col("n_docs")).as("n_tot"), sum(col("w")).as("w_tot"))
    per.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_chars"),
        expr("n_docs * 1000000L div n_tot").as("prop_ppm"),
        expr("w * 1000000L div w_tot").as("temp_ppm"),
        expr("(w * 1000000L div w_tot) * 1000000L div (n_docs * 1000000L div n_tot)")
          .as("boost_ppm"))
  }

  private val temperatureMixtureSql = Oracles("stats", "temperatureMixture")

  /** q172 — EPOCH ALLOCATION under a fixed token budget: given a global
    * budget of 2× the corpus (the data-constrained regime), per-source
    * mix weights (q125's md5-derived 1–5 stand-in for the config), and
    * the ≤4-epoch repeat ceiling (beyond ~4 epochs repeated data stops
    * helping — the data-constrained-scaling rule of thumb), compute each
    * source's allocated budget, its repeat factor in milli-epochs, and
    * the budget it actually absorbs. The gap between `alloc_k` and
    * `actual_k` is the head-room the mix designer reassigns.
    *
    * All arithmetic is exact BIGINT in KILO-char units (q125's overflow
    * guard: chars×10⁶ overflows int64 at 100 TB, kchars×10³ does not).
    *
    * Scale shape: one per-source agg, two broadcast 1-row totals —
    * control-plane after the first aggregate, zero data-plane shuffles.
    */
  def epochAllocation(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents.select(col("source"), col("n_chars"))
    // ONE sizing pass (r19, the q125/q150 fix): per is checkpointed
    // (source-grain) and the corpus total rides it — Σ_s chars_s ≡
    // Σ n_chars exactly (exact BIGINT sums, div floor applied after the
    // identical total); the old plan scanned documents per reader.
    val per = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("chars_s"))
      .withColumn("ks_s", greatest(lit(1L), expr("chars_s div 1000")))
      .withColumn("w_s", graft.ops.Dedup.hash60(col("source")) % 5 + 1)
      .localCheckpoint(true)
    val tot = per.agg(expr("sum(chars_s) div 1000").as("ks_tot"))
    val sumw = per.agg(sum(col("w_s")).as("sum_w"))
    per.crossJoin(broadcast(tot)).crossJoin(broadcast(sumw))
      .withColumn("alloc_k", expr("2 * ks_tot * w_s div sum_w"))
      .withColumn("epochs_milli",
        least(lit(4000L), expr("alloc_k * 1000 div ks_s")))
      .withColumn("actual_k", expr("ks_s * epochs_milli div 1000"))
      .select(col("source"), col("ks_s"), col("w_s"), col("alloc_k"),
        col("epochs_milli"), col("actual_k"))
  }

  private val epochAllocationSql = Oracles("stats", "epochAllocation")

  /** q177 — output SHARD BALANCE audit: hash documents into 16 output
    * shards (the training-data write layout) and report each shard's
    * doc/char share plus its deviation from the uniform 1/16 — the
    * pre-write check that catches a bad shard key before 1000 workers
    * inherit a straggler shard. Hash sharding is the q114 family
    * convention (salted md5 → stable under corpus growth).
    *
    * Scale shape: map-side shard tag, one 16-group agg, one broadcast
    * 1-row total; exact integer ppm.
    */
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val d = t.documents.select(col("doc_id"), col("n_chars"),
      pmod(graft.ops.Dedup.hash60(col("doc_id").cast("string"), "shard"),
        lit(16L)).as("shard"))
    val per = d.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    val tot = per.agg(sum(col("n_docs")).as("t_docs"),
      sum(col("n_chars")).as("t_chars"))
    per.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_chars"),
        expr("n_chars * 1000000L div t_chars").as("chars_share_ppm"),
        expr("abs(n_chars * 1000000L div t_chars - 62500)").as("dev_ppm"))
  }

  private val shardBalanceSql = Oracles("stats", "shardBalance")

  /** q179 — SPLIT FAIRNESS audit: per train/val/test split (q114's
    * thresholds verbatim), document count and mean token count — the
    * "is the held-out set distributionally comparable" check that
    * accompanies any random split (a split whose test docs are
    * systematically longer measures length, not generalization).
    *
    * Scale shape: map-side split tag + token count in one projection,
    * one 3-group agg; exact integer micro-token means.
    */
  def splitFairness(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val v = conv(substring(md5(concat_ws("|", lit("split"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    t.documents
      .select(
        when(v < 3435973836L, lit("train"))
          .when(v < 3865470566L, lit("val"))
          .otherwise(lit("test")).as("split"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"),
        col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("split"), col("n_docs"), col("n_tokens"),
        expr("n_tokens * 1000000L div n_docs").as("mean_tokens_micro"),
        expr("n_chars * 1000000L div n_docs").as("mean_chars_micro"))
  }

  private val splitFairnessSql = Oracles("stats", "splitFairness")

  /** q181 — log₂ LENGTH HISTOGRAM: documents per power-of-two token
    * bucket — the heavy-tail audit (natural text lengths are roughly
    * log-normal; a missing tail bucket means truncation upstream, a fat
    * one means concatenation artifacts). Bucket edges are EXACT integer
    * thresholds compiled from one Scala sequence into the SAME CASE
    * chain on both engines (the MappingRules convention) — never
    * `floor(log2(double))`, whose boundary cells drift between engines.
    *
    * Scale shape: map-side bucket assignment + one ≤12-group agg.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val n = size(split(lower(trim(col("text"))), "\\s+")).cast("long")
    // ascending chained whens — FIRST match wins, exactly like the SQL
    // CASE below (a fold that wraps outward would invert the precedence
    // and classify everything into the widest bucket)
    val bucket = (1 to 11).foldLeft(null: Column) { (acc, i) =>
      val w = if (acc == null) when(n < (1L << i), i - 1)
              else acc.when(n < (1L << i), i - 1)
      w
    }.otherwise(11)
    t.documents
      .select(bucket.as("bucket"), n.as("n_tokens"), col("n_chars"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("bucket"),
        expr("CAST(shiftleft(1L, bucket) AS BIGINT)").as("bucket_lo"),
        expr("CAST(shiftleft(1L, bucket + 1) - 1 AS BIGINT)").as("bucket_hi"),
        col("n_docs"), col("n_tokens"), col("n_chars"))
  }

  private val lengthHistogramSql = {
    val whens = (1 to 11).map(i => s"WHEN n < ${1L << i} THEN ${i - 1}")
      .mkString("\n      |    ", "\n      |    ", "")
    s"""WITH d AS (
      |  SELECT CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
      |    AS BIGINT) AS n, n_chars
      |  FROM documents),
      |b AS (
      |  SELECT CASE$whens
      |    ELSE 11 END AS bucket, n, n_chars
      |  FROM d)
      |SELECT CAST(bucket AS INT) AS bucket,
      |  CAST(1 << bucket AS BIGINT) AS bucket_lo,
      |  CAST((1 << (bucket + 1)) - 1 AS BIGINT) AS bucket_hi,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS n_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM b GROUP BY bucket""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q181_length_histogram", lengthHistogram, Some(lengthHistogramSql)),
    QueryDef("q177_shard_balance", shardBalance, Some(shardBalanceSql)),
    QueryDef("q179_split_fairness", splitFairness, Some(splitFairnessSql)),
    QueryDef("q172_epoch_allocation", epochAllocation, Some(epochAllocationSql)),
    QueryDef("q165_temperature_mixture", temperatureMixture, Some(temperatureMixtureSql)),
    QueryDef("q162_kanonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("q209_ldiversity", lDiversity, Some(lDiversitySql)),
    QueryDef("q214_tcloseness", tCloseness, Some(tClosenessSql)),
    QueryDef("q218_dp_release", dpRelease, Some(dpReleaseSql)),
    QueryDef("q220_shuffle_runs", shuffleRuns, Some(shuffleRunsSql)),
    // Oracle is deliberately q220's GLOBAL formulation: the gate proves
    // the chunk-stitching identity cross-engine.
    QueryDef("q228_chunked_runs", chunkedRuns, Some(shuffleRunsSql)),
    QueryDef("q149_bootstrap_ci", bootstrapCi, Some(bootstrapCiSql)),
    QueryDef("q144_weighted_topk_sample", weightedTopkSample, Some(weightedTopkSampleSql)),
    QueryDef("q143_quantile_normalize", quantileNormalize, Some(quantileNormalizeSql)),
    QueryDef("q249_quantile_normalize_distributed", quantileNormalizeDistributed,
      Some(quantileNormalizeSql)), // q143's oracle VERBATIM — closed forms must hash-match the window
    QueryDef("q140_fk_audit", fkAudit, Some(fkAuditSql)),
    QueryDef("q130_equidepth_histogram", (s, d) => equidepthHistogram(s, d),
      Some(equidepthHistogramSql),
      tags = Set("baseline_only")), // exact single-group percentile buffers values; scale path = q234 Auto/Approx
    QueryDef("q234_equidepth_approx_gate", equidepthApproxGate,
      Some(equidepthApproxGateSql)),
    QueryDef("q125_mixture_resample", mixtureResample, Some(mixtureResampleSql)),
    QueryDef("q114_stratified_split", stratifiedSplit, Some(stratifiedSplitSql)),
    QueryDef("q109_key_integrity", keyIntegrity, Some(keyIntegritySql)),
    QueryDef("q108_robust_outliers", (s, d) => robustOutliers(s, d),
      Some(robustOutliersSql)),
    QueryDef("q103_weighted_sample", weightedSample, Some(weightedSampleSql)),
    QueryDef("q98_spearman", spearman, Some(spearmanSql),
      tags = Set("baseline_only")), // 3-task window form kept as documentation; scale path = q248

    QueryDef("q248_spearman_distributed", spearmanDistributed,
      Some(spearmanDistributedSql)),
    QueryDef("q99_table_checksum", tableChecksum, Some(tableChecksumSql)),
    QueryDef("q62_date_functions", dateFunctions, Some(dateFunctionsSql)),
    QueryDef("q57_deterministic_sample", deterministicSample, Some(deterministicSampleSql)),
    QueryDef("q58_price_histogram", priceHistogram, Some(priceHistogramSql)),
    QueryDef("q59_moments", moments, Some(momentsSql)),
    QueryDef("q60_region_summary", regionSummary, Some(regionSummarySql)),
    QueryDef("q75_stratified_sample", stratifiedSample, Some(stratifiedSampleSql)),
  )
}
