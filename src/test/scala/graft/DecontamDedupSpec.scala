package graft

import org.apache.spark.sql.functions._

/** Invariants of the q201–q205 batch that the DuckDB oracle can't express
  * (properties over the outputs, not a second formulation): bloom
  * no-false-negatives, SemDeDup accounting, CDC chunk reconstruction,
  * Zipf fit sanity, kappa bounds.
  */
class DecontamDedupSpec extends SparkTestBase {

  test("q202: the bloom filter never misses — exact hits ⊆ bloom flags, per source") {
    val rows = graft.queries.DedupQ.bloomDecontam(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bloom = r.getAs[Long]("bloom_flagged")
      val exact = r.getAs[Long]("exact_hits")
      val fp = r.getAs[Long]("fp_docs")
      assert(exact <= bloom,
        s"false negative in ${r.getAs[String]("source")}: exact $exact > bloom $bloom")
      assert(fp == bloom - exact)
      assert(bloom <= r.getAs[Long]("n_train_docs"))
    }
  }

  test("q201: SemDeDup accounting — dropped < size, dropped ≤ pairs, kept ppm exact") {
    val rows = graft.queries.SimilarityQ.semanticDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vectors")
      val pairs = r.getAs[Long]("n_pairs")
      val dropped = r.getAs[Long]("n_dropped")
      // the smallest id in a cluster can never be dropped (no smaller anchor)
      assert(dropped < n)
      assert(dropped <= pairs)
      assert(r.getAs[Long]("kept_ppm") == (n - dropped) * 1000000L / n)
    }
  }

  test("q203: CDC chunks tile each document — word counts sum back to the doc") {
    // rebuild chunk word counts by doc and compare against the raw split;
    // boundary placement must neither drop nor duplicate any word
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_words"))
    val bySize = graft.queries.DedupQ.cdcChunks(spark, sf)
      .agg(sum(col("n_chunks"))).collect()(0).getLong(0)
    val totalWords = docs.agg(sum(col("n_words"))).collect()(0).getLong(0)
    val nDocs = docs.count()
    // each doc yields ≥1 chunk and chunks average ~16 words: the chunk
    // count must sit between n_docs and total words
    assert(bySize >= nDocs && bySize <= totalWords)
  }

  test("q204: Zipf fit is a real regression — slope finite, intercept ≥ top-rank log freq fit") {
    val r = graft.queries.CorpusStatsQ.zipfSlope(spark, sf).collect()(0)
    val slope = r.getAs[Double]("slope")
    assert(!slope.isNaN && !slope.isInfinite)
    // frequency is nonincreasing in rank, so the OLS slope can't be positive
    assert(slope <= 0.0, s"positive Zipf slope $slope")
  }

  test("q210: nDCG bounded by 1, DCG ≤ IDCG, MRR only at exact reciprocal positions") {
    val rows = graft.queries.SimilarityQ.annNdcg(spark, sf).collect()
    assert(rows.nonEmpty)
    val validMrr = (1 to 10).map(p => 1000000L / p).toSet + 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("dcg_u") <= r.getAs[Long]("idcg_u"))
      assert(r.getAs[Long]("ndcg_ppm") <= 1000000L)
      assert(validMrr.contains(r.getAs[Long]("mrr_u")),
        s"mrr ${r.getAs[Long]("mrr_u")} is not 1e6 div pos for pos in 1..10")
      assert(r.getAs[Long]("n_hits") <= 10L)
    }
  }

  test("q211: histogram masses exactly the candidate pair set") {
    val hist = graft.queries.DedupQ.neardupEditDist(spark, sf)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    val pairs = graft.queries.DedupQ.minhashPairs(spark, sf).count()
    assert(hist == pairs, s"histogram covers $hist of $pairs pairs")
  }

  test("q212: per-keyspace row totals equal the scanned tables' counts") {
    val rows = graft.queries.SkewQ.skewReport(spark, sf).collect()
      .map(r => r.getAs[String]("keyspace") -> r).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val ord = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows("lineitem.l_orderkey").getAs[Long]("n_rows") == li)
    assert(rows("lineitem.l_partkey").getAs[Long]("n_rows") == li)
    assert(rows("orders.o_custkey").getAs[Long]("n_rows") == ord)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("max_key_rows") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Long]("top_share_ppm") <= 1000000L)
      // max/mean ratio is ≥ 1× by definition (max ≥ mean)
      assert(r.getAs[Long]("skew_x_ppm") >= 1000000L - 1L)
    }
  }

  test("q205: kappa within [-1, 1] micro-units and po/pe consistent") {
    val r = graft.queries.TextQ.kappaLangid(spark, sf).collect()(0)
    val k = r.getAs[Long]("kappa_u")
    assert(k >= -1000000L && k <= 1000000L)
    val po = r.getAs[Long]("po_ppm")
    val pe = r.getAs[Long]("pe_ppm")
    assert(po >= 0L && po <= 1000000L && pe >= 0L && pe <= 1000000L)
    // sign agreement: kappa positive iff observed beats chance
    if (po > pe) assert(k >= 0L) else if (po < pe) assert(k <= 0L)
  }
}
