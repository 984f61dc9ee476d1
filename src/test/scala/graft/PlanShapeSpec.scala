package graft

/** Plan-shape regressions for the round-4 single-pass rewrites: these
  * queries were specifically shaped to scan/tokenize ONCE and avoid
  * self-joins (PLANS_r4.md) — a future edit reintroducing a join or a
  * second scan should fail here, not in a 100-TB bill.
  */
class PlanShapeSpec extends SparkTestBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q89 dupspan: one parquet scan, no join") {
    val p = plan("q89_dupspan_fraction")
    assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, p)
    assert(!p.contains("Join"), s"q89 must not self-join:\n$p")
  }

  test("q87 tfidf: no join except the broadcast 1-row corpus count") {
    val p = plan("q87_tfidf_keywords")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the only join is the nested-loop cross of the broadcast single-row agg
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q84 video meta: map-only (zero exchanges)") {
    val p = plan("q84_video_meta")
    assert(!p.contains("Exchange"), s"q84 must stay map-only:\n$p")
  }

  test("q88 pair counts: raw pairs shuffle exactly once before top-k") {
    val p = plan("q88_bpe_pair_counts")
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), s"top-50 must not global-sort:\n$p")
  }

  test("q86 scd2: both windows share one user_id exchange") {
    val p = plan("q86_scd2_history")
    val exchanges = p.sliding("Exchange".length).count(_ == "Exchange")
    // one hashpartitioning exchange (AQE may add a final coalesce read, no 2nd shuffle)
    assert(p.sliding("hashpartitioning".length).count(_ == "hashpartitioning") <= 2,
      s"scd2 must not re-shuffle between windows:\n$p")
    assert(!p.contains("Join"), p)
    assert(exchanges >= 1, p)
  }
}
