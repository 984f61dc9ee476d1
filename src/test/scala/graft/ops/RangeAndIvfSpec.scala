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

  test("IVF with fewer centroids than nProbe probes every cluster instead of none") {
    // 3-vector corpus, k=16, nProbe=4: only 3 centroids materialize; the
    // probe slice must degrade to all clusters, not an empty array
    val tiny = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f))
    ).toDF("id", "vec")
    val out = Similarity.ivfTopK(tiny.filter($"id" === 1L), tiny,
      k = 16, nProbe = 4, topK = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out == Set(2L, 3L), s"expected both non-self neighbors, got $out")
  }

  test("IVF raises on vectors containing null elements; skips fully-null vectors") {
    val bad = Seq((1L, Seq[java.lang.Float](1.0f, null)), (2L, Seq[java.lang.Float](0.5f, 0.5f)))
      .toDF("id", "vec")
    val e = intercept[Exception] {
      Similarity.ivfTopK(bad, bad, k = 2, nProbe = 1, topK = 1).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("null elements"),
      s"expected a loud null-element failure, got: ${e.getMessage}")

    val withNullVec = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.8f, 0.2f)))
      .toDF("id", "vec")
      .unionByName(Seq((3L, null.asInstanceOf[Seq[Float]])).toDF("id", "vec"))
    val out = Similarity.ivfTopK(withNullVec, withNullVec, k = 2, nProbe = 2, topK = 2)
      .select("q_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L), "null-vector row is skipped, not fatal")
  }
}
