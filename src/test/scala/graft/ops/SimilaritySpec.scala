package graft.ops

import graft.SparkTestBase
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.99f, 0.1f, 0.0f)),  // near 1
    (3L, Array(0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.98f, 0.2f)),  // near 3
    (5L, Array(0.0f, 0.0f, 1.0f))
  ).toDF("id", "vec")

  test("brute-force top-k ranks the nearest vector first") {
    val out = Similarity.bruteForceTopK(vecs.filter($"id" === 1), vecs, k = 2)
      .orderBy($"rank").collect()
    assert(out.head.getAs[Long]("neighbor_id") == 2L)
    assert(out.head.getAs[Int]("rank") == 1)
    assert(out.head.getAs[Double]("sim") > 0.98)
  }

  test("vec_dot native expression equals the HOF fold bit-for-bit") {
    val d = vecs.select(Similarity.toDoubleVec($"vec").as("a"),
      Similarity.toDoubleVec($"vec").as("b"))
    val hof = d.select(Similarity.dot("a", "b").as("x")).collect().map(_.getDouble(0))
    val native = d.select(GraftFunctions.vec_dot($"a", $"b").as("x"))
      .collect().map(_.getDouble(0))
    assert(hof.sameElements(native))
  }

  test("LSH near-dup pairs are a subset of exact pairs and find true near-dups") {
    val exact = Similarity.exactNearDupPairs(vecs, minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(vecs, numBits = 4, minCosine = 0.9, dim = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH must not invent pairs: $lsh vs $exact")
    assert(exact.contains((1L, 2L)) && exact.contains((3L, 4L)))
    assert(lsh.nonEmpty, "4-bit LSH should bucket at least one true near-dup pair")
  }

  test("LSH hot-bucket cap drops oversized buckets and bounds the pair count") {
    // 40 copies of one direction (all land in ONE signature bucket) plus the
    // (1,2) near-dup pair. Cap at 8: the 40-id bucket is dropped entirely —
    // no quadratic expansion — while small buckets still pair.
    val dups = (100L until 140L).map(i => (i, Array(0.0f, 0.70f, 0.71f)))
    val all = (Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.99f, 0.1f, 0.0f))) ++ dups).toDF("id", "vec")
    val capped = Similarity.lshNearDupPairs(all, numBits = 4, minCosine = 0.9,
      dim = 3, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!capped.exists(p => p._1 >= 100L),
      s"pairs from the oversized bucket must be excluded: $capped")
    assert(capped == Set((1L, 2L)), s"small buckets must still pair: $capped")
    val uncapped = Similarity.lshNearDupPairs(all, numBits = 4, minCosine = 0.9,
      dim = 3, maxBucketSize = 4096).count()
    assert(uncapped == 1 + 40L * 39 / 2, "sanity: uncapped expansion is quadratic")
  }

  test("LSH near-dup scoring streams buckets off a partition-local sort") {
    // The scale contract (VERDICT r9 item 2): ONE linear exchange on the
    // signature, then a non-global SortExec feeding the bucket scorer — so
    // task-resident memory is one bucket, never the whole partition. A
    // HashMap-of-the-partition regression would drop the local sort.
    val df = Similarity.lshNearDupPairs(vecs, numBits = 4, minCosine = 0.9, dim = 3)
    df.collect() // force planning through AQE
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    // `Sort [sig#.. ASC .., id#.. ASC ..], false, 0` — the trailing `false`
    // is SortExec's global flag: partition-local
    assert("sort \\[sig#\\d+l? asc[^\\]]*\\], false, 0".r.findFirstIn(plan).isDefined,
      s"expected a partition-local sort on (sig, id) below the scorer:\n$plan")
    assert(!plan.contains("], true, 0"),
      s"no GLOBAL sort belongs in this plan:\n$plan")
    // exactly one exchange of the member rows (the linear repartition on sig)
    assert(plan.sliding("exchange".length).count(_ == "exchange") <= 2,
      s"expected one member exchange (+ possible AQE reuse):\n$plan")
  }

  test("LSH near-dup pairs deduplicate repeated ids within a bucket") {
    // Two rows share id=7 (identical direction, so same bucket): the old
    // collect_set contract kept ONE representative — no (7,7) self-pair, no
    // duplicated (7,8) pair — and the bucket cap counts DISTINCT ids.
    val withDup = Seq(
      (7L, Array(0.0f, 0.70f, 0.71f)),
      (7L, Array(0.0f, 0.70f, 0.71f)),
      (8L, Array(0.0f, 0.69f, 0.72f))
    ).toDF("id", "vec")
    val pairs = Similarity.lshNearDupPairs(withDup, numBits = 4, minCosine = 0.9,
      dim = 3).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((7L, 8L)),
      s"duplicate ids must collapse to one representative: ${pairs.toSeq}")
    // distinct-id cap: 2 distinct ids fit a cap of 2 even with 3 rows
    val capped = Similarity.lshNearDupPairs(withDup, numBits = 4, minCosine = 0.9,
      dim = 3, maxBucketSize = 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((7L, 8L)),
      s"bucket cap must count distinct ids, not rows: ${capped.toSeq}")
  }

  test("sql extension injection registers vec_dot") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
