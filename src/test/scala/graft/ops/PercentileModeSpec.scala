package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The exact↔approx percentile knob ([[Percentiles]]) — VERDICT r10 item 2:
  * the 100 TB swap must be code, not a comment. Pins
  *  (1) the rank-error contract of the approx branch,
  *  (2) that every mode-parameterized operator produces the same SHAPE
  *      (schema + row count) in both modes and stable decisions on the
  *      fixture data,
  *  (3) that exact mode is bit-identical to the pre-knob formulation
  *      (the 233 oracles already gate this at sf0.01; here at sf0.001).
  */
class PercentileModeSpec extends SparkTestBase {

  test("approx branch emits approx_percentile, exact branch emits percentile") {
    val df = spark.range(100).select(col("id").cast("double").as("x"))
    val exactPlan = df.agg(Percentiles.pctl(col("x"), 0.5, Percentiles.Exact))
      .queryExecution.analyzed.toString
    val approxPlan = df.agg(Percentiles.pctl(col("x"), 0.5, Percentiles.Approx(1000)))
      .queryExecution.analyzed.toString
    assert(exactPlan.contains("percentile") && !exactPlan.contains("percentile_approx"))
    assert(approxPlan.contains("approx_percentile") || approxPlan.contains("percentile_approx"))
  }

  test("approx rank error is within n/accuracy on a known distribution") {
    // 10k distinct values 0..9999: rank of the returned element is exact
    // arithmetic. Guarantee: |rank - p*n| <= n/accuracy = 100 at acc=100.
    val df = spark.range(10000).select(col("id").cast("double").as("x"))
    val row = df.agg(
      Percentiles.pctl(col("x"), 0.5, Percentiles.Approx(100)).as("a"),
      Percentiles.pctl(col("x"), 0.9, Percentiles.Approx(100)).as("b")).head()
    assert(math.abs(row.getDouble(0) - 5000.0) <= 100.0,
      s"p50 ${row.getDouble(0)} outside rank bound")
    assert(math.abs(row.getDouble(1) - 9000.0) <= 100.0,
      s"p90 ${row.getDouble(1)} outside rank bound")
  }

  test("q130 equi-depth: approx mode keeps schema and near-uniform bins") {
    val exact = graft.queries.StatsQ.equidepthHistogram(spark, sf)
    val approx =
      graft.queries.StatsQ.equidepthHistogram(spark, sf, Percentiles.Approx(10000))
    assert(exact.schema == approx.schema)
    val n = exact.agg(sum("n")).head().getLong(0)
    val binsA = approx.select("bin", "n").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(binsA.keySet == (0 to 9).toSet, s"bins ${binsA.keySet}")
    // every decile bin within 0.5% of n of the ideal n/10 (accuracy 10000
    // at sf0.001 ⇒ the sketch is rank-exact; slack covers value ties)
    binsA.values.foreach(c =>
      assert(math.abs(c - n / 10.0) <= 0.005 * n + 1,
        s"bin count $c vs ideal ${n / 10.0}"))
  }

  test("q234 gate: every decile rank_ok in approx mode") {
    val rows = graft.queries.StatsQ.equidepthApproxGate(spark, sf).collect()
    assert(rows.length == 9)
    assert(rows.forall(_.getBoolean(1)), "a decile violated the rank bound")
  }

  test("q108 robust outliers: flag decisions stable under the approx swap") {
    val exact = graft.queries.StatsQ.robustOutliers(spark, sf)
      .select("o_orderkey", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val approx = graft.queries.StatsQ.robustOutliers(spark, sf, Percentiles.Approx(10000))
      .select("o_orderkey", "is_outlier").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(exact.keySet == approx.keySet)
    // outliers sit >3.5 robust z-scores out — far from the decision
    // boundary, so an element-vs-interpolated median shift flips nothing
    // on the fixture data (deterministic: fixed data, deterministic sketch)
    val flips = exact.count { case (k, v) => approx(k) != v }
    assert(flips == 0, s"$flips outlier decisions flipped under approx mode")
  }

  test("q45 threshold severity: approx mode severity counts within 10% of exact") {
    val exact = graft.queries.ParityQ.thresholdSeverity(spark, sf)
    val approx = graft.queries.ParityQ.thresholdSeverity(spark, sf, Percentiles.Approx(10000))
    val ce = exact.count(); val ca = approx.count()
    assert(exact.columns.sameElements(approx.columns))
    assert(math.abs(ca - ce) <= 0.1 * ce,
      s"approx flagged $ca rows vs exact $ce — thresholds moved too far")
  }

  test("clv buckets: approx mode keeps every customer bucketed, near-exact splits") {
    val t = graft.core.Tables(spark, sf)
    // tiny synthetic final layer standing in for the pipeline fixture
    val base = t.orders.select(
      (col("o_orderkey") % 5).cast("string").as("restaurant_id"),
      col("o_custkey").cast("string").as("customer_id"),
      col("o_totalprice").as("revenue"),
      col("o_orderkey").as("order_id"))
    val exact = graft.pipeline.MetricsJob.clvBuckets(base)
      .groupBy("clv_bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.pipeline.MetricsJob.clvBuckets(base, Percentiles.Approx(10000))
      .groupBy("clv_bucket").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.values.sum == approx.values.sum, "a customer lost its bucket")
    val total = exact.values.sum.toDouble
    (exact.keySet ++ approx.keySet).foreach { k =>
      val d = math.abs(exact.getOrElse(k, 0L) - approx.getOrElse(k, 0L))
      assert(d <= 0.02 * total + 2, s"bucket $k moved by $d rows under approx mode")
    }
  }

  // ---- Auto mode (VERDICT r11 item 6): the knob drives itself ----

  test("Auto resolves Exact below the bound, Approx above it, on the same input") {
    // 1000 rows, 4 groups → ~250 values/group (approx_count_distinct is
    // rank-exact at 4 distinct keys)
    val df = spark.range(1000).select(
      (col("id") % 4).as("k"), col("id").cast("double").as("x"))
    assert(Percentiles.resolve(df, Seq(col("k")), Percentiles.Auto(bound = 1000))
      == Percentiles.Exact, "avg 250 under bound 1000 must stay Exact")
    assert(Percentiles.resolve(df, Seq(col("k")), Percentiles.Auto(bound = 100))
      == Percentiles.Approx(10000), "avg 250 over bound 100 must go Approx")
    // a global aggregation (no group columns) counts the whole frame as
    // one group
    assert(Percentiles.resolve(df, Seq.empty, Percentiles.Auto(bound = 999))
      == Percentiles.Approx(10000))
    assert(Percentiles.resolve(df, Seq.empty, Percentiles.Auto(bound = 1001))
      == Percentiles.Exact)
    // explicit modes pass through untouched (no estimate scan to pay)
    assert(Percentiles.resolve(df, Seq(col("k")), Percentiles.Exact)
      == Percentiles.Exact)
    assert(Percentiles.resolve(df, Seq(col("k")), Percentiles.Approx(55))
      == Percentiles.Approx(55))
  }

  test("pctl rejects an unresolved Auto loudly") {
    intercept[IllegalArgumentException] {
      Percentiles.pctl(col("x"), 0.5, Percentiles.Auto())
    }
  }

  test("q108 end-to-end: Auto at the default bound is row-identical to Exact") {
    // fixture groups are far below 10⁷ values → Auto must resolve Exact
    val exact = graft.queries.StatsQ.robustOutliers(spark, sf)
      .collect().map(_.toString).sorted
    val auto = graft.queries.StatsQ.robustOutliers(spark, sf, Percentiles.Auto())
      .collect().map(_.toString).sorted
    assert(exact.sameElements(auto),
      "Auto below the bound must be bit-identical to the Exact default")
  }

  test("q108 end-to-end: Auto with a tiny bound takes the approx branch and keeps shape") {
    val auto = graft.queries.StatsQ.robustOutliers(spark, sf,
      Percentiles.Auto(bound = 1))
    val exact = graft.queries.StatsQ.robustOutliers(spark, sf)
    assert(auto.schema == exact.schema)
    assert(auto.count() == exact.count())
  }
}
