package graft

import org.apache.spark.sql.functions._

/** Invariants of the round-6 curation/training-data queries that the
  * DuckDB oracle can't express (properties over the OUTPUT, not a second
  * formulation of it): chunk tiling, quantization error bounds, leakage
  * set containment, mixture normalization, sweep monotonicity, phase
  * partitioning.
  */
class CurationQueriesSpec extends SparkTestBase {

  test("q164: chunks tile every document — stride 48, full coverage, short tail") {
    val rows = graft.queries.PackQ.docChunks(spark, sf)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_id"))
      // starts advance by exactly the stride, beginning at token 1
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("start_tok") == i * 48L + 1L)
        val len = r.getAs[Long]("chunk_len")
        assert(len >= 1L && len <= 64L)
      }
      // the last chunk ends exactly at the document's last token, so with
      // stride < window the chunk union covers [1..n] with no gap
      val last = sorted.last
      val n = sorted.head.getAs[Long]("n_chunks")
      assert(sorted.length.toLong == n)
      // every non-last chunk is full-width; only the tail may be short
      sorted.init.foreach(r => assert(r.getAs[Long]("chunk_len") == 64L))
    }
  }

  test("q171: reconstruction error is bounded by one quantization step") {
    val maxRange = spark.read.parquet(s"$sf/embeddings.parquet")
      .select((array_max(col("embedding")) - array_min(col("embedding")))
        .cast("double").as("r"))
      .agg(max(col("r"))).collect()(0).getDouble(0)
    // q80 FLOOR-quantizes, so |err| < one full step = (mx-mn)/255
    // (round-based quantization would halve this); +1 nano for the half-up
    val boundNano = maxRange / 255.0 * 1e9 + 1
    val out = graft.queries.PackQ.quantError(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mean = r.getAs[Long]("mean_abs_err_nano")
      val mx = r.getAs[Long]("max_abs_err_nano")
      assert(mean <= mx)
      assert(mx <= boundNano, s"max err $mx exceeds step/2 bound $boundNano")
    }
  }

  test("q173: leaked docs are a subset of test docs and ppm is consistent") {
    val r = graft.queries.DedupQ.splitLeakage(spark, sf).collect()(0)
    val nTest = r.getAs[Long]("n_test_docs")
    val nLeak = r.getAs[Long]("n_leaked_test_docs")
    assert(nLeak >= 0L && nLeak <= nTest)
    assert(r.getAs[Long]("leak_ppm") == nLeak * 1000000L / nTest)
  }

  test("q165: temperature weights normalize and compress the distribution") {
    val rows = graft.queries.StatsQ.temperatureMixture(spark, sf).collect()
    val tempSum = rows.map(_.getAs[Long]("temp_ppm")).sum
    // floor division loses at most (#langs - 1) ppm
    assert(tempSum <= 1000000L && tempSum >= 1000000L - rows.length)
    // temperature scaling compresses: the largest language's share shrinks,
    // the smallest language's share grows
    val byDocs = rows.sortBy(_.getAs[Long]("n_docs"))
    assert(byDocs.last.getAs[Long]("temp_ppm") <= byDocs.last.getAs[Long]("prop_ppm"))
    assert(byDocs.head.getAs[Long]("temp_ppm") >= byDocs.head.getAs[Long]("prop_ppm"))
  }

  test("q160: retention is monotonically non-increasing in the cutoff") {
    val rows = graft.queries.TextQ.thresholdSweep(spark, sf)
      .collect().sortBy(_.getAs[Int]("min_tokens"))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("docs_kept") >= b.getAs[Long]("docs_kept"))
      assert(a.getAs[Long]("tokens_kept") >= b.getAs[Long]("tokens_kept"))
    }
  }

  test("q169: phases partition the corpus with ordered score ranges") {
    val rows = graft.queries.TextQ.curriculumPhases(spark, sf)
      .collect().sortBy(_.getAs[Int]("phase"))
    assert(rows.map(_.getAs[Int]("phase")).toSeq == Seq(1, 2, 3, 4))
    val total = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // ntile orders by score: each phase's min is >= the previous phase's min
    // and its max bounds the next phase's min (ties may share a boundary)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_score_ppm") <= b.getAs[Long]("min_score_ppm")
        || a.getAs[Long]("max_score_ppm") == b.getAs[Long]("min_score_ppm"))
      assert(a.getAs[Long]("min_score_ppm") <= b.getAs[Long]("min_score_ppm"))
    }
  }

  test("q172: absorbed budget never exceeds allocation or the epoch ceiling") {
    val rows = graft.queries.StatsQ.epochAllocation(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val em = r.getAs[Long]("epochs_milli")
      assert(em >= 0L && em <= 4000L)
      assert(r.getAs[Long]("actual_k") <= r.getAs[Long]("alloc_k")
        || em == 4000L) // at the cap, actual is ks_s*4 which may differ from alloc
      assert(r.getAs[Long]("actual_k") == r.getAs[Long]("ks_s") * em / 1000L)
    }
  }

  test("q216: kept tokens never exceed the 30% budget; counts conserve") {
    val rows = graft.queries.CorpusStatsQ.tokenBudgetSelect(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("budget_tokens") == r.getAs[Long]("tot_tokens") * 3 / 10)
      assert(r.getAs[Long]("sel_tokens") <= r.getAs[Long]("budget_tokens"))
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("sel_ppm") <= 300000L)
    }
  }

  test("q217: winnowing density below 1, dup fingerprints bounded by selected") {
    val rows = graft.queries.DedupQ.winnowing(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val grams = r.getAs[Long]("n_grams")
      val fps = r.getAs[Long]("n_fps")
      val docs = r.getAs[Long]("n_docs")
      // selected-per-doc is at most the window count g-3, at least 1
      assert(fps >= docs && fps <= grams - 3 * docs)
      assert(r.getAs[Long]("density_ppm") <= 1000000L)
      assert(r.getAs[Long]("dup_fp") <= fps)
      assert(r.getAs[Long]("dup_ppm") <= 1000000L)
    }
  }

  test("q218: DP release clamps at zero, noise bounded by the mechanism tail") {
    val rows = graft.queries.StatsQ.dpRelease(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[Long]("true_count")
      val n = r.getAs[Long]("noise")
      assert(r.getAs[Long]("released") == math.max(0L, t + n))
      assert(r.getAs[Long]("abs_err") == math.abs(n))
      // inverse-CDF magnitude at eps=0.5: floor(-2*ln(2e-6)) = 26 max
      assert(math.abs(n) <= 26L)
      assert(r.getAs[Long]("epsilon_milli") == 500L)
    }
    // the md5-pinned draw is deterministic across invocations
    val again = graft.queries.StatsQ.dpRelease(spark, sf).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("q219: containment histogram conserves the pair set; subset dups within cells") {
    val df = graft.queries.DedupQ.containmentProfile(spark, sf).cache()
    try {
      val nPairs = graft.queries.DedupQ.minhashPairs(spark, sf).count()
      assert(df.agg(sum("n_pairs")).head.getLong(0) == nPairs)
      assert(df.filter(col("cont_band") < 0 || col("cont_band") > 4).isEmpty)
      assert(df.filter(col("jac_band") < 0 || col("jac_band") > 4).isEmpty)
      assert(df.filter(col("n_subset_dups") > col("n_pairs")).isEmpty)
      // containment >= jaccard always (min(na,nb) <= union size)
      assert(df.filter(col("cont_band") < col("jac_band")).isEmpty)
    } finally df.unpersist()
  }

  test("q220: runs bounded by [n_sources, n_docs], ratio positive") {
    val rows = graft.queries.StatsQ.shuffleRuns(spark, sf).collect()
    assert(rows.length == 8)
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      val runs = r.getAs[Long]("n_runs")
      assert(runs >= r.getAs[Long]("n_sources"))
      assert(runs <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("e_runs") >= 1.0)
      assert(r.getAs[Double]("runs_ratio") > 0.0)
    }
  }

  test("q221: effective size between hard-dedup floor and no-dedup ceiling") {
    val rows = graft.queries.DedupQ.softDedupWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      val inCl = r.getAs[Long]("n_in_clusters")
      val eff = r.getAs[Long]("eff_docs_ppm")
      assert(inCl >= 0L && inCl <= n)
      // singletons contribute exactly 1e6 each; clustered docs in (0, 1e6)
      assert(eff > (n - inCl) * 1000000L || inCl == 0L)
      assert(eff <= n * 1000000L)
      assert(r.getAs[Long]("eff_ratio_ppm") <= 1000000L)
    }
  }

  test("q222: participation ratio within [1, dim] milli-dimensions") {
    val r = graft.queries.SimilarityQ.effectiveRank(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_vecs") ==
      spark.read.parquet(s"$sf/embeddings.parquet").count())
    assert(row.getAs[Long]("trace_u") > 0L)
    val pr = row.getAs[Long]("pr_milli")
    assert(pr >= 1000L && pr <= 64000L,
      s"participation ratio $pr outside [1, 64] dims")
  }

  test("q217 guarantee: docs sharing a >=6-word run share a fingerprint") {
    // winnowing's coverage property (any shared run of >= k+w-1 = 6 words
    // yields >= 1 shared selected fingerprint), verified on the same
    // in-row selection expression the query uses: two documents that
    // agree only on a 6-word middle run must intersect in fingerprints
    import spark.implicits._
    val shared = "the quick brown fox jumps over"
    val docs = Seq(
      s"alpha beta gamma $shared delta epsilon zeta",
      s"one two three four $shared five six seven eight").toDF("text")
    val fps = docs.select(expr(
      """array_distinct(transform(sequence(1,
        |  size(split(lower(trim(text)), '\\s+')) - 5), j ->
        |  array_min(transform(sequence(j, j + 3), i ->
        |    CAST(conv(substring(md5(concat_ws(' ',
        |      element_at(split(lower(trim(text)), '\\s+'), i),
        |      element_at(split(lower(trim(text)), '\\s+'), i + 1),
        |      element_at(split(lower(trim(text)), '\\s+'), i + 2))),
        |      1, 15), 16, 10) AS BIGINT)))))""".stripMargin).as("fps"))
      .as[Seq[Long]].collect()
    assert(fps.length == 2)
    assert(fps(0).toSet.intersect(fps(1).toSet).nonEmpty,
      "shared 6-word run selected no common fingerprint")
  }

  test("q187: multi-pass gram counting (huge doc) is exact, same as one-pass") {
    // a >2^19-gram document forces the bounded-memory chunked path
    // (k=2 hash-partitioned passes); its repetition stats must be the
    // hand-computable exact values, and a small k=1 doc alongside must be
    // untouched. Guards the round-11 OOM fix: one pathological doc must
    // never hold all its distinct grams resident at once.
    import spark.implicits._
    val dir = graft.core.Scratch.dir("gopher-hugedoc")
    val huge = ("x y " * 300000).trim // 600000 tokens, 599999 2-grams
    val docs = Seq(
      (1L, huge, "en", "big", huge.length.toLong),
      (2L, "a b a b a b", "en", "small", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQ.gopherRepetition(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val big = out("big")
    // max 2-gram "x y" = 300000 of 600000 tokens -> 2*300000/600000 = 1.0
    assert(big.getAs[Long]("mean_frac2_ppm") == 1000000L, big)
    // max 3-gram = 299999 -> 1e6*3*299999/600000 = 1499995 (exact)
    assert(big.getAs[Long]("mean_frac3_ppm") == 1499995L, big)
    assert(big.getAs[Long]("flagged_2g") == 1L && big.getAs[Long]("flagged_3g") == 1L)
    val small = out("small")
    // "a b" x3 of 6 tokens -> 1.0; "a b a"/"b a b" x2 -> 3*2/6 = 1.0
    assert(small.getAs[Long]("mean_frac2_ppm") == 1000000L, small)
    assert(small.getAs[Long]("mean_frac3_ppm") == 1000000L, small)
  }
}
