package graft.ops

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("path graph a-b-c: one iteration matches the hand computation") {
    // degrees: a=1, b=2, c=1; r0 = 1_000_000µ everywhere
    // r1(a) = 150000 + (85·500000 + 50) div 100 = 575000µ (only b feeds a)
    // r1(b) = 150000 + (85·2000000 + 50) div 100 = 1850000µ
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val r = PageRank.run(edges, "s", "d", iterations = 1)
      .select($"node", $"rank").as[(Long, Double)].collect().toMap
    assert(r(1L) == 0.575 && r(3L) == 0.575)
    assert(r(2L) == 1.85)
  }

  test("rank mass is conserved per round (no dangling nodes in undirected graphs)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)).toDF("s", "d")
    (1 to 3).foreach { it =>
      val total = PageRank.run(edges, "s", "d", iterations = it)
        .agg(org.apache.spark.sql.functions.sum("rank")).as[Double].head()
      assert(math.abs(total - 4.0) < 1e-4, s"iteration $it: mass $total drifted")
    }
  }

  test("duplicate and reversed edge rows collapse (symmetrize + distinct)") {
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L)).toDF("s", "d")
    val clean = Seq((1L, 2L)).toDF("s", "d")
    val a = PageRank.run(noisy, "s", "d", 2)
      .select($"node", $"rank_u").as[(Long, Long)].collect().toMap
    val b = PageRank.run(clean, "s", "d", 2)
      .select($"node", $"rank_u").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("bit-deterministic across partitionings (fixed-point loop)") {
    val edges = (1L to 40L).map(i => (i, i % 7 + 100L)).toDF("s", "d")
    val a = PageRank.run(edges.repartition(1), "s", "d", 3)
      .select($"node", $"rank_u").as[(Long, Long)].collect().toMap
    val b = PageRank.run(edges.repartition(13), "s", "d", 3)
      .select($"node", $"rank_u").as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
