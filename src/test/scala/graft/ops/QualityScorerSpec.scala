package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class QualityScorerSpec extends SparkTestBase {
  import spark.implicits._

  test("logit is the exact integer sum of per-occurrence bucket weights") {
    val w = QualityScorer.md5Weights(64)
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha beta")).toDF("doc_id", "text")
    val out = df.select($"doc_id", QualityScorer.logitMicro($"text", w).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // duplicate token counts once per OCCURRENCE (bag, not set)
    val alphaBucket = df.sparkSession.range(1)
      .select(QualityScorer.bucket(lit("alpha"), 64).cast("int")).head().getInt(0)
    assert(out(1L) - out(2L) == w(alphaBucket),
      "adding one more 'alpha' occurrence must add exactly its bucket weight")
  }

  test("weights are deterministic, bounded, and both signs occur") {
    val w = QualityScorer.md5Weights(256)
    assert(w == QualityScorer.md5Weights(256))
    assert(w.forall(x => x >= -500000L && x <= 500000L))
    assert(w.exists(_ > 0) && w.exists(_ < 0))
  }

  test("scoring plan is map-only (zero exchanges)") {
    val w = QualityScorer.md5Weights(64)
    val df = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val plan = df.select(QualityScorer.logitMicro($"text", w))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"classifier inference must not shuffle:\n$plan")
  }
}
