package graft

import graft.queries.{AnalyticsQ, CorpusStatsQ, EventsQ, StatsQ, WindowsQ}
import org.apache.spark.sql.functions._

/** Semantic invariants for the round-4 analytics batch (q110–q117) —
  * properties the DuckDB hash-compare can't express as naturally: mass
  * conservation, range bounds, and determinism under re-run.
  */
class AnalyticsSpec extends SparkTestBase {

  test("q110 cohort: offset-0 row IS the cohort size; offsets non-negative") {
    val df = AnalyticsQ.cohortRetention(spark, sf).cache()
    try {
      assert(df.filter(col("month_offset") < 0).isEmpty)
      val base = df.filter(col("month_offset") === 0)
      assert(base.filter(col("n_customers") =!= col("cohort_size")).isEmpty)
      assert(base.filter(col("retention_rate") =!= 1.0).isEmpty)
      // retention never exceeds the cohort
      assert(df.filter(col("n_customers") > col("cohort_size")).isEmpty)
    } finally df.unpersist()
  }

  test("q112 markov: each from_type's transition row is a proper distribution") {
    val df = AnalyticsQ.markovTransitions(spark, sf).cache()
    try {
      // counts conserve: sum(n) per from_type == n_from on every row
      val bad = df.groupBy("from_type", "n_from")
        .agg(sum("n").as("s"))
        .filter(col("s") =!= col("n_from"))
      assert(bad.isEmpty)
      // probabilities sum to ~1 (6dp rounding per cell)
      val sums = df.groupBy("from_type").agg(sum("p").as("sp"))
        .filter(abs(col("sp") - 1.0) > 1e-4)
      assert(sums.isEmpty)
    } finally df.unpersist()
  }

  test("q115 benford: digits 1-9, observed mass sums to ~1") {
    val rows = AnalyticsQ.benfordAudit(spark, sf).collect()
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    val mass = rows.map(_.getAs[Double]("observed_p")).sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass=$mass")
    // every row's n sums to the shared total
    assert(rows.map(_.getAs[Long]("n")).sum == rows.head.getAs[Long]("total"))
  }

  test("q113 entropy: bounded by ln(n_distinct), zero iff one distinct token") {
    val df = CorpusStatsQ.tokenEntropy(spark, sf).cache()
    try {
      assert(df.filter(col("entropy") < 0).isEmpty)
      // H <= ln(n_distinct) + rounding slack (6dp per term)
      assert(df.filter(col("entropy") >
        log(col("n_distinct").cast("double")) + 0.001).isEmpty)
      assert(df.filter(col("n_distinct") === 1 && col("entropy") =!= 0.0).isEmpty)
    } finally df.unpersist()
  }

  test("q114 split: total partition of docs, deterministic, sane fractions") {
    val a = StatsQ.stratifiedSplit(spark, sf)
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(a.count() == total)
    val bytes = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bytes.keySet.subsetOf(Set("train", "val", "test")))
    // binomial tolerance at n=50 is wide; just require train strictly dominant
    assert(bytes.getOrElse("train", 0L) > bytes.getOrElse("val", 0L))
    assert(bytes.getOrElse("train", 0L) > bytes.getOrElse("test", 0L))
    // permanence: same assignment on re-run
    val b = StatsQ.stratifiedSplit(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("q111 inverted index: postings head length = min(df, 20), sorted ascending") {
    val rows = CorpusStatsQ.invertedIndex(spark, sf).collect()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val ids = r.getAs[String]("postings_head").split(",").map(_.toLong)
      assert(ids.length == math.min(df, 20L))
      assert(ids.sameElements(ids.sorted), s"unsorted postings for ${r.getAs[String]("term")}")
    }
  }

  test("q116 rank distributions: pct_rank/cume in [0,1], worst is the partition min") {
    val df = WindowsQ.rankDistributions(spark, sf).cache()
    try {
      assert(df.filter(col("pct_rank") < 0 || col("pct_rank") > 1).isEmpty)
      assert(df.filter(col("cume") <= 0 || col("cume") > 1).isEmpty)
      val bad = df.groupBy("o_orderpriority")
        .agg(min("revenue").as("m"), max("worst").as("w"), min("worst").as("w2"))
        .filter(col("m") =!= col("w") || col("m") =!= col("w2"))
      assert(bad.isEmpty)
    } finally df.unpersist()
  }

  test("q117 json props: k extracted for every event, counts conserve") {
    val df = EventsQ.jsonProps(spark, sf)
    val total = spark.read.parquet(s"$sf/events.parquet").count()
    assert(df.filter(col("k").isNull).isEmpty, "unparseable props")
    assert(df.agg(sum("n")).head.getLong(0) == total)
  }

  test("q223 seasonal anomalies: cells conserve, flags bounded, MAD non-negative") {
    val rows = EventsQ.seasonalAnomalies(spark, sf).collect()
    assert(rows.nonEmpty)
    val expected = graft.core.Tables(spark, sf).events
      .select(col("event_type"), to_date(col("ts")), hour(col("ts")))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_cells")).sum == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_anomalies") <= r.getAs[Long]("n_cells"))
      assert(r.getAs[Long]("mad_cents_x100") >= 0L)
      assert(r.getAs[Long]("max_abs_resid_cents") >= 0L)
    }
  }

  test("q224 cohort LTV: cumulative revenue monotone, conserves order totals") {
    val df = AnalyticsQ.cohortLtv(spark, sf).cache()
    try {
      // total revenue across all cohort cells equals the orders table's
      val totalCents = spark.read.parquet(s"$sf/orders.parquet")
        .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
        .head.getLong(0)
      assert(df.agg(sum("rev_cents")).head.getLong(0) == totalCents)
      // cum is monotone non-decreasing in offset within a cohort
      val byCohort = df.collect()
        .groupBy(r => (r.getAs[Int]("cohort_year"), r.getAs[Int]("cohort_mon")))
      byCohort.values.foreach { rs =>
        val sorted = rs.sortBy(_.getAs[Int]("month_offset"))
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Long]("cum_rev_cents") <= b.getAs[Long]("cum_rev_cents"))
          case _ => ()
        }
        // LTV at offset 0 is average first-month spend per member
        val first = sorted.head
        assert(first.getAs[Int]("month_offset") == 0)
        assert(first.getAs[Long]("ltv_cents") ==
          first.getAs[Long]("cum_rev_cents") / first.getAs[Long]("cohort_size"))
      }
    } finally df.unpersist()
  }

  test("q225 funnel latency: counts agree with q96 stages, ordering sane") {
    val lat = EventsQ.funnelLatency(spark, sf).collect()
      .map(r => r.getAs[String]("transition") -> r).toMap
    val stages = EventsQ.funnelStages(spark, sf)
      .groupBy("stage").count().collect()
      .map(r => r.getAs[Int]("stage") -> r.getAs[Long]("count")).toMap
    // users with a view-after-click == stage>=2; purchase-after-view == stage 3
    assert(lat("click_to_view").getAs[Long]("n_users") ==
      stages.getOrElse(2, 0L) + stages.getOrElse(3, 0L))
    assert(lat("view_to_purchase").getAs[Long]("n_users") ==
      stages.getOrElse(3, 0L))
    lat.values.foreach { r =>
      assert(r.getAs[Long]("p50_ms_x1000") <= r.getAs[Long]("p90_ms_x1000"))
      assert(r.getAs[Long]("p90_ms_x1000") <= r.getAs[Long]("max_s") * 1000L)
      assert(r.getAs[Long]("p50_ms_x1000") >= 0L)
    }
  }

  test("q214 t-closeness: EMD in [0,1e6], classes cover every customer") {
    val df = StatsQ.tCloseness(spark, sf).cache()
    try {
      assert(df.filter(col("emd_u") < 0 || col("emd_u") > 1000000L).isEmpty)
      // every (nation, segment) class present exactly once; k conserves
      val nCustomers = spark.read.parquet(s"$sf/customer.parquet").count()
      assert(df.agg(sum("k")).head.getLong(0) == nCustomers)
      val nClasses = spark.read.parquet(s"$sf/customer.parquet")
        .select("c_nationkey", "c_mktsegment").distinct().count()
      assert(df.count() == nClasses)
      assert(df.filter(col("at_risk") =!= (col("emd_u") > 200000L)).isEmpty)
    } finally df.unpersist()
  }

  test("q215 survival: risk set monotone down, hazard bounded, cum hazard monotone up") {
    val rows = EventsQ.survivalHazard(spark, sf)
      .orderBy(col("gap_h")).collect()
    assert(rows.nonEmpty)
    // total gap observations = one per event (last gap censored at obs end)
    val nEvents = spark.read.parquet(s"$sf/events.parquet").count()
    assert(rows.head.getAs[Long]("n_risk") == nEvents)
    rows.foreach { r =>
      val d = r.getAs[Long]("d_completed")
      val n = r.getAs[Long]("n_risk")
      assert(d >= 1L && d <= n)
      val h = r.getAs[Long]("hazard_ppm")
      assert(h >= 0L && h <= 1000000L)
    }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_risk") > b.getAs[Long]("n_risk"))
        assert(a.getAs[Long]("cum_hazard_ppm") <= b.getAs[Long]("cum_hazard_ppm"))
      case _ => ()
    }
  }
}
