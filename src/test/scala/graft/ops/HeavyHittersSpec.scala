package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic skewed stream: term "h0".."h4" appear 200·(i+1) times,
    * plus 3000 singleton terms — forces MG decrements (k << vocab).
    */
  private def skewed = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(200 * (i + 1))(s"h$i"))
    val tail = (0 until 3000).map(i => s"t$i")
    // interleave deterministically so heavy items aren't contiguous
    val all = (heavy ++ tail).zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L + s.hashCode) & 0x7fffffffL }
      .map(_._1)
    all.toDF("item").repartition(7) // several partitions → real merges
  }

  test("MGSketch superset guarantee under decrement pressure: every item with cnt*(k+1) > N survives") {
    val df = skewed
    val n = df.count()
    val sk = HeavyHitters.sketch(df, col("item"), k = 10)
    assert(sk.n == n)
    assert(sk.counters.size <= 10)
    val exact = df.groupBy("item").count().as[(String, Long)].collect().toMap
    val mustSurvive = exact.filter { case (_, c) => c * 11 > n }.keySet
    assert(mustSurvive.nonEmpty, "fixture must have true heavy hitters")
    assert(mustSurvive.subsetOf(sk.counters.keySet),
      s"lost heavy hitters: ${mustSurvive -- sk.counters.keySet}")
    // MG estimates never overcount
    sk.counters.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
    }
  }

  test("exact() returns exactly the threshold set with exact counts") {
    val df = skewed
    val n = df.count()
    val out = HeavyHitters.exact(df, col("item"), k = 10)
      .as[(String, Long)].collect().toMap
    val expected = df.groupBy("item").count().as[(String, Long)].collect()
      .filter { case (_, c) => c * 11 > n }.toMap
    assert(out == expected)
  }

  test("merge reduction keeps at most k counters and the true n") {
    val a = new HeavyHitters.MGSketch(3)
    val b = new HeavyHitters.MGSketch(3)
    Seq("x", "x", "x", "y", "y", "z").foreach(a.add)
    Seq("p", "p", "q", "r", "x").foreach(b.add)
    val m = a.merge(b)
    assert(m.n == 11L)
    assert(m.counters.size <= 3)
    // x has true count 4 > 11/4 → must survive any merge order
    assert(m.counters.contains("x"))
  }

  test("degenerate inputs: empty stream and k=1") {
    val empty = spark.emptyDataset[String].toDF("item")
    assert(HeavyHitters.exact(empty, col("item"), 5).count() == 0)
    val uni = Seq.fill(100)("only").toDF("item")
    val out = HeavyHitters.exact(uni, col("item"), 1).as[(String, Long)].collect()
    assert(out.toSeq == Seq(("only", 100L)))
  }
}
