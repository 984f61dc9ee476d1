package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert: updates replace, inserts append, base otherwise untouched") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "status", "price")
    val updates = Seq((2L, "B", 21.0), (9L, "new", 90.0))
      .toDF("k", "status", "price")
    val out = Merge.upsert(base, updates, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "B", 21.0),
      (3L, "c", 30.0), (9L, "new", 90.0)))
  }

  test("upsert: multi-version delta resolved by tiebreak, greatest wins") {
    val base = Seq((1L, "a", 1L)).toDF("k", "status", "v")
    val updates = Seq((1L, "v2", 2L), (1L, "v3", 3L), (1L, "v1", 1L))
      .toDF("k", "status", "v")
    val out = Merge.upsert(base, updates, Seq("k"), tiebreak = Seq("v"))
      .as[(Long, String, Long)].collect()
    assert(out.toSeq == Seq((1L, "v3", 3L)))
  }

  test("upsert: extra delta columns dropped; missing ones rejected loudly") {
    val base = Seq((1L, "a")).toDF("k", "status")
    val extra = Seq((2L, "b", "ignored")).toDF("k", "status", "junk")
    assert(Merge.upsert(base, extra, Seq("k")).columns.toSeq == Seq("k", "status"))
    val partial = Seq(2L).toDF("k")
    val e = intercept[IllegalArgumentException](Merge.upsert(base, partial, Seq("k")))
    assert(e.getMessage.contains("status"))
  }

  test("upsert plan: base side is broadcast-anti-joined, never sorted/windowed") {
    val base = spark.read.parquet(s"$sf/orders.parquet")
    val updates = base.limit(50).withColumn("o_orderstatus", lit("U"))
    val plan = Merge.upsert(base, updates, Seq("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast anti join, got:\n$plan")
    assert(!plan.contains("Window"), "upsert must not window the base")
    assert(!plan.contains("SortMergeJoin"), "small delta must broadcast")
  }

  test("scd2: equal-state runs collapse into validity intervals") {
    // user 1: x@10 x@20 y@30 x@40 → [10,30)x [30,40)y [40,∞)x
    val log = Seq((1L, "x", 10L, 1L), (1L, "x", 20L, 2L), (1L, "y", 30L, 3L),
      (1L, "x", 40L, 4L), (2L, "z", 5L, 5L))
      .toDF("user", "state", "ts", "id")
    val out = Merge.scd2(log, Seq("user"), "state", "ts", "id")
      .select($"user", $"state", $"valid_from", $"valid_to", $"is_current")
      .orderBy($"user", $"valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, "x", 10L, Some(30L), false),
      (1L, "y", 30L, Some(40L), false),
      (1L, "x", 40L, None, true),
      (2L, "z", 5L, None, true)))
  }

  test("scd2: null states are states (null-safe run collapse); ts ties broken by tie col") {
    val log = Seq((1L, Some("x"), 10L, 1L), (1L, None, 20L, 2L),
      (1L, None, 30L, 3L), (1L, Some("y"), 40L, 4L),
      // same-ts tie: id decides order → state ends 'b', not 'a'
      (2L, Some("a"), 10L, 6L), (2L, Some("b"), 10L, 7L))
      .toDF("user", "state", "ts", "id")
    val out = Merge.scd2(log, Seq("user"), "state", "ts", "id")
      .select($"user", $"state", $"valid_from", $"is_current")
      .orderBy($"user", $"valid_from", $"state")
      .as[(Long, Option[String], Long, Boolean)].collect()
    assert(out.toSeq == Seq(
      (1L, Some("x"), 10L, false),
      (1L, None, 20L, false),
      (1L, Some("y"), 40L, true),
      (2L, Some("a"), 10L, false),
      (2L, Some("b"), 10L, true)))
  }
}
