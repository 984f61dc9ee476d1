package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeAndIvfSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed range join equals the naive range-predicate join") {
    val rnd = new scala.util.Random(11)
    val a = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, i.toLong))
      .toDF("k", "ta", "ida")
    val b = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100000).toLong, i.toLong))
      .toDF("k", "tb", "idb")
    val delta = 700L
    val fast = RangeJoin.withinDelta(a, b, "k", "ta", "tb", delta)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.join(b, Seq("k")).filter(abs($"ta" - $"tb") <= delta)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive, s"missing=${naive -- fast} extra=${fast -- naive}")
  }

  test("IVF top-k achieves reasonable recall vs the exact baseline") {
    val all = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id".as("id"), $"embedding".as("vec"))
    val queries = all.filter($"id" < 10)
    val exact = Similarity.bruteForceTopK(queries, all, k = 10)
      .select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ivf = Similarity.ivfTopK(queries, all, k = 16, nProbe = 4, topK = 10)
      .select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    val recall = exact.map { case (q, truth) =>
      (ivf(q) intersect truth).size.toDouble / truth.size
    }.sum / exact.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall")
    // determinism: same call twice, same result
    val again = Similarity.ivfTopK(queries, all, k = 16, nProbe = 4, topK = 10)
      .select("q_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(again == ivf)
  }
}
