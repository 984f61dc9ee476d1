package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RankingSpec extends SparkTestBase {

  test("two-phase rank equals the window rank on a strict order") {
    val spark = this.spark
    import spark.implicits._
    val rnd = new scala.util.Random(4711)
    val df = (1 to 5000).map { i =>
      (s"g${i % 3}", rnd.nextInt(400), i) // (group, value, unique tiebreak)
    }.toDF("g", "v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
    for (parts <- Seq(1, 7, 32)) {
      val got = Ranking.rowNumber(df, Seq($"g"), Seq($"v", $"id"), "rn", parts)
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"parts=$parts: two-phase rank must be bit-identical to the window")
    }
  }

  test("group key is injective: nulls and separator-carrying values " +
      "do not merge rank spaces (ADVICE r14)") {
    val spark = this.spark
    import spark.implicits._
    // concat_ws skipped NULL columns: ("a", null) collapsed with ("a", "")
    // under any separator; and values containing the separator char
    // collided across column boundaries. Each distinct tuple below MUST
    // get its own dense 1..n rank space.
    val rows = Seq(
      ("a", null, 1), ("a", null, 2),
      ("a", "", 3), ("a", "", 4),
      ("a", "\u0001b", 5), ("a\u0001", "b", 6), // old-separator collision pair
      ("ab", "c", 7), ("a", "bc", 8))           // bare-concat collision pair
    val df = rows.toDF("g1", "g2", "id")
    val got = Ranking.rowNumber(df, Seq($"g1", $"g2"), Seq($"id"), "rn", 4)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g1", $"g2").orderBy($"id")
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "injective-key two-phase rank must match the window on null/collision groups")
  }

  test("span join survives AQE + coalesce(1) without exchange reuse " +
      "(Verify's write path, round-15 regression)") {
    // RangePartitioner seeds its boundary sample per plan instantiation;
    // without the localCheckpoint pin, the span-offset branch and the main
    // branch could range-partition DIFFERENTLY whenever physical planning
    // did not reuse the exchange — observed under AQE + coalesce(1) (the
    // exact Verify dump path), where the (group, pid) inner join dropped
    // 430 of q143's 500 rows. This drives that path end to end.
    val spark = this.spark
    import spark.implicits._
    // getOption + unset, not get-with-default: the session is shared
    // across suites, and restoring a never-explicitly-set key to a
    // literal would pin it for every later suite (this exact slip turned
    // AQE off for DedupSpec's plan-shape assert in the first r15 run)
    val prevAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      val df = (1 to 4000).map(i => (s"g${i % 5}", i * 31 % 997, i)).toDF("g", "v", "id")
      val ranked = Ranking.rowNumber(df, Seq($"g"), Seq($"v", $"id"), "rn", 32)
        .coalesce(1)
      assert(ranked.count() == 4000, "rows lost across the span join")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v", $"id")
      val want = df.withColumn("rn", row_number().over(w).cast("long"))
      assert(ranked.except(want).isEmpty && want.except(ranked).isEmpty)
    } finally prevAqe match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("offsets survive cache eviction mid-query: recompute reproduces " +
      "the same spans (VERDICT r16 item 4)") {
    // The persist pin's fault-tolerance claim: the span offsets are
    // captured from the FIRST materialization's partition boundaries, so
    // they remain valid only if a recompute reproduces those boundaries.
    // A lost executor loses cached BLOCKS, not the cache registry entry —
    // the recompute flows through the retained RDD lineage, whose shuffle
    // dependency holds the ONE RangePartitioner instance sampled at
    // materialization. Simulate total block loss: unpersist (blocking)
    // every RDD the rowNumber call pinned, BEFORE the final join has ever
    // executed, then run the query — every row must land back in its
    // original span and the ranks must still match the window oracle
    // bit-for-bit.
    val spark = this.spark
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (1 to 6000).map(i => (s"g${i % 4}", i * 17 % 1009, i)).toDF("g", "v", "id")
    val ranked = Ranking.rowNumber(df, Seq($"g"), Seq($"v", $"id"), "rn", 16)
    // offsets are captured by now (rowNumber's materializing collect);
    // evict the blocks of every RDD that call persisted
    val pinned = spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => !before.contains(id) }
    assert(pinned.nonEmpty, "rowNumber must have pinned its ranked RDD")
    pinned.values.foreach(_.unpersist(blocking = true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v", $"id")
    val want = df.withColumn("rn", row_number().over(w).cast("long"))
    assert(ranked.count() == 6000, "rows lost after block eviction")
    assert(ranked.except(want).isEmpty && want.except(ranked).isEmpty,
      "post-eviction recompute must reproduce the captured spans exactly")
  }

  test("ranks are partition-boundary independent and dense per group") {
    val spark = this.spark
    import spark.implicits._
    val df = (1 to 999).map(i => (s"k${i % 2}", 999 - i)).toDF("g", "v")
    val a = Ranking.rowNumber(df, Seq($"g"), Seq($"v"), "rn", 5)
    val b = Ranking.rowNumber(df, Seq($"g"), Seq($"v"), "rn", 17)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // dense 1..n per group
    val bounds = a.groupBy($"g")
      .agg(min($"rn").as("lo"), max($"rn").as("hi"), count(lit(1)).as("n"))
      .collect()
    bounds.foreach { r =>
      assert(r.getLong(1) == 1L && r.getLong(2) == r.getLong(3),
        s"group ${r.getString(0)}: ranks must be dense 1..n")
    }
  }
}
