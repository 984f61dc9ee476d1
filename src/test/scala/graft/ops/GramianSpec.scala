package graft.ops

import graft.SparkTestBase

class GramianSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed 2-dim Gramian in micro-units") {
    // rows (1,2) and (3,-4):
    //   g11 = 1 + 9 = 10; g12 = 2 - 12 = -10; g22 = 4 + 16 = 20
    val df = Seq(Seq(1.0f, 2.0f), Seq(3.0f, -4.0f)).toDF("v")
    val out = Gramian.upperTriangle(df, "v", dim = 2)
      .select($"i", $"j", $"gram_u", $"n")
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(out == Set((1, 1, 10000000L, 2L), (1, 2, -10000000L, 2L),
      (2, 2, 20000000L, 2L)))
  }

  test("bit-deterministic under any partitioning (integer accumulation)") {
    val rnd = new scala.util.Random(7L)
    val vecs = Seq.fill(200)(Seq.fill(8)(rnd.nextFloat() - 0.5f))
    val a = Gramian.upperTriangle(vecs.toDF("v").repartition(1), "v", 8)
      .select($"i", $"j", $"gram_u").as[(Int, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val b = Gramian.upperTriangle(vecs.toDF("v").repartition(17), "v", 8)
      .select($"i", $"j", $"gram_u").as[(Int, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(a == b)
    assert(a.size == 8 * 9 / 2)
  }

  test("wrong-dimension and null vectors fail loudly, not silently skip") {
    val bad = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).toDF("v")
    val e = intercept[org.apache.spark.SparkException](
      Gramian.upperTriangle(bad, "v", 2).collect())
    assert(e.getMessage != null)
  }
}
