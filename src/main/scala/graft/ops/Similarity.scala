package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, per the training-data pipeline surface:
  *  - brute-force cosine top-k — the exact baseline; a crossJoin whose left
  *    side (the query set) is small and broadcast, so the big side streams
  *    through map-side only: no shuffle of the corpus;
  *  - LSH-bucketed ANN (random hyperplanes) — the scale path: corpus hashed
  *    once to b-bit signatures, candidates restricted to equal buckets
  *    (optionally multi-probe), turning O(N·Q) into per-bucket work.
  *
  * All arithmetic runs in double precision over `transform(v, float→double)`
  * arrays; dot products fold left-to-right (deterministic). Hyperplanes are
  * derived from md5 — reproducible with no RNG state.
  */
object Similarity {

  /** Cast a float-array column to double-array (exact widening). */
  def toDoubleVec(c: Column): Column = transform(c, x => x.cast("double"))

  /** Dot product of two double-array columns — the native codegen'd
    * [[graft.functions.VecDotProduct]] (bit-identical to the sequential
    * left-to-right HOF fold `aggregate(zip_with(a,b,*),0,+)`, but a single
    * loop with no intermediate array allocation).
    */
  def dot(a: String, b: String): Column =
    graft.functions.GraftFunctions.vec_dot(col(a), col(b))

  /** L2 norm of a double-array column (self dot product). */
  def norm(a: String): Column = sqrt(dot(a, a))

  /** Brute-force cosine top-k: for each row of `queries` (id, vec), the k
    * nearest rows of `corpus` (id, vec) by cosine. Similarity is rounded to
    * `roundScale` decimals and ordered with the corpus id as tiebreaker, so
    * rankings are reproducible across engines and partitionings.
    *
    * @param excludeSelf drop corpus rows whose id equals the query id.
    *                    Assumes queries and corpus SHARE ONE id space (true
    *                    for self-search, the common near-dup case); pass
    *                    false when the query ids come from a different space
    *                    — a coincidental id match would otherwise silently
    *                    drop a legitimate neighbor.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      roundScale: Int = 4, excludeSelf: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col("id").as("q_id"), toDoubleVec(col("vec")).as("qv"))
      .withColumn("qn", norm("qv"))
    val c = corpus.select(col("id").as("neighbor_id"), toDoubleVec(col("vec")).as("cv"))
      .withColumn("cn", norm("cv"))
    val sim = round(dot("qv", "cv") / (col("qn") * col("cn")), roundScale)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))
    broadcast(q).crossJoin(c)
      .filter(if (excludeSelf) col("q_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", sim)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Deterministic hyperplane component (i, j): md5-derived pseudo-random in
    * [-0.5, 0.5), identical to `conv(substring(md5('plane{i}:{j}'),1,8),16,10)
    * / 2^32 - 0.5` evaluated in SQL — but computed ONCE on the driver.
    */
  private def planeComponent(i: Int, j: Int): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane$i:$j".getBytes("UTF-8"))
    val hex = d.take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0 - 0.5
  }

  /** Random-hyperplane LSH signature (`numBits` bits) for a double-vec
    * column of fixed dimension `dim`: bit i = sign(v · plane_i), where plane
    * components are md5-derived pseudo-randoms in [-0.5, 0.5) — reproducible
    * with no RNG state. Buckets group near vectors; cosine candidates are
    * then scored only within buckets.
    *
    * Planes are folded into FOLDABLE array literals on the driver (numBits ×
    * dim digests happen once, not per row), so per-row work is numBits
    * codegen'd dot products ([[graft.functions.VecDotProduct]] — the same
    * left-to-right fold the previous HOF formulation used, bit-identical).
    */
  def hyperplaneSignature(vecCol: String, numBits: Int, dim: Int): Column = {
    val bits = (0 until numBits).map { i =>
      val plane = typedLit((0 until dim).map(j => planeComponent(i, j)))
      val proj = graft.functions.GraftFunctions.vec_dot(col(vecCol), plane)
      when(proj >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }
    // A vector whose length != dim — or one CONTAINING a null element —
    // would make every vec_dot NULL and fall through otherwise(0) to
    // signature 0, silently bucketing corrupt rows together and away from
    // their true neighbors. Fail loudly on both; fully-null vectors
    // propagate a null signature (they then match no bucket).
    when(col(vecCol).isNull, lit(null).cast("long"))
      .when(size(col(vecCol)) =!= dim,
        raise_error(concat(lit(s"hyperplaneSignature: vector length "),
          size(col(vecCol)).cast("string"), lit(s" != dim $dim"))))
      .when(exists(col(vecCol), _.isNull),
        raise_error(lit(s"hyperplaneSignature: vector contains null elements")))
      .otherwise(bits.reduce(_ + _))
  }

  /** LSH-bucketed approximate near-dup pairs: vectors sharing a signature
    * bucket, scored by exact cosine, kept above `minCosine`. The bucket
    * grouping replaces the full O(N²) crossJoin — this is the plan shape
    * that survives 100×: ONE linear shuffle of (sig, id, vec, norm) on the
    * bucket key, then fully bucket-LOCAL pair scoring.
    *
    * The scoring is a `mapPartitions` escape, justified by two measured
    * Catalyst failure modes at a generated 26× corpus (10.5M candidate
    * pairs): (a) the planner sizes the exploded pair set by the bucket-agg
    * stats (one tiny row per bucket), so it BROADCASTS the pair side — a
    * single-threaded driver collect of the whole candidate set (95 s of a
    * 165 s run); (b) any join-based scoring must co-partition pairs with
    * vectors on BOTH endpoint ids, and the second shuffle carries pairs
    * widened by a 64-double vector (~6 GB there, measured 271 s). Scoring
    * inside the bucket's own task shuffles vectors exactly once (linear in
    * the corpus) and materializes no pair set anywhere. The per-pair
    * arithmetic is the same sequential left-to-right dot-product fold as
    * [[graft.functions.VecDotProduct]] (bit-identical doubles), the raw
    * cosine is thresholded BEFORE Spark's `round` — both exactly as the
    * former plan — and members are processed in ascending-id order, so the
    * pair set and values are identical.
    *
    * The `maxBucketSize` cap is the scale guard a signature self-join
    * lacks: a corpus with 1M copies of one document puts all of them in
    * ONE bucket whose ~5·10¹¹-pair expansion would land in a single task.
    * An over-cap bucket is an identical-signature mass — an exact-dup
    * family upstream [[Dedup.exact]] should have collapsed — so it is
    * DROPPED, bounding any task's fan-out at maxBucketSize²/2 (mirror the
    * cap in any oracle, as q77 does). Buckets are whole within one task by
    * construction (hash partitioning on sig), so the cap check is local.
    *
    * Task memory is bounded by ONE bucket, not the task's whole partition:
    * rows arrive `sortWithinPartitions(sig, id, xxhash64(v))` (a local sort above the
    * single linear exchange — spillable SortExec, not a HashMap of every
    * bucket in the partition), so the scorer streams bucket-contiguous
    * rows and holds at most `maxBucketSize` (id, vec, norm) members
    * resident at a time. Resident bytes per task ≈ maxBucketSize × vector
    * width — independent of corpus/partition size, which is what makes
    * executor heap a non-issue at 100 TB. Member ids are deduplicated
    * within a bucket (the sort makes duplicates adjacent): a repeated id
    * contributes ONE representative — no self-pairs, no duplicate pairs —
    * and the bucket cap counts DISTINCT ids, matching the original
    * collect_set formulation's contract.
    *
    * @param dim embedding dimension (all vectors must have exactly `dim`
    *            elements — required to fold the hyperplanes into literals)
    */
  def lshNearDupPairs(vectors: DataFrame, numBits: Int, minCosine: Double,
      dim: Int, maxBucketSize: Int = 4096): DataFrame = {
    val spark = vectors.sparkSession
    // null signature (null vector) matches no bucket — filtered, same
    // contract a signature equi-join would have (null never equi-joins)
    val members = vectors.select(col("id"), toDoubleVec(col("vec")).as("v"))
      .withColumn("nrm", norm("v"))
      .withColumn("sig", hyperplaneSignature("v", numBits, dim))
      .filter(col("sig").isNotNull)
      .repartition(spark.sparkContext.defaultParallelism, col("sig"))
      // third sort key = content hash: rows sharing (sig, id) but carrying
      // DIFFERENT vectors (an upstream contract violation, but possible)
      // would otherwise arrive in shuffle order, making the kept-first
      // representative — and thus the emitted cosines — vary run-to-run
      // (ADVICE r10). With the codegen'd xxhash64 tie-break the dedup
      // below always keeps the same row; for true bit-identical
      // duplicates every choice is identical anyway.
      .sortWithinPartitions(col("sig"), col("id"), xxhash64(col("v")))
      .select(col("sig"), col("id"), col("v"), col("nrm"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id_a",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("id_b",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cosine_raw",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    val raw = members.mapPartitions { rows =>
      val buf = rows.buffered
      // bucket-at-a-time: consume one signature run (rows are sorted by
      // (sig, id)), then emit its pairs lazily before touching the next run
      val buckets = new Iterator[Array[(Long, Array[Double], Double)]] {
        override def hasNext: Boolean = buf.hasNext
        override def next(): Array[(Long, Array[Double], Double)] = {
          val sig = buf.head.getLong(0)
          val ms = scala.collection.mutable.ArrayBuffer
            .empty[(Long, Array[Double], Double)]
          var lastId = Long.MinValue
          var any = false
          var overCap = false
          while (buf.hasNext && buf.head.getLong(0) == sig) {
            val r = buf.next()
            val id = r.getLong(1)
            if (!any || id != lastId) {
              any = true; lastId = id
              if (overCap) ()
              else if (ms.length >= maxBucketSize) { overCap = true; ms.clear() }
              else ms.append((id, r.getSeq[Double](2).toArray, r.getDouble(3)))
            }
          }
          if (overCap || ms.length < 2) Array.empty else ms.toArray
        }
      }
      buckets.flatMap { sorted =>
        sorted.iterator.zipWithIndex.flatMap { case ((ida, va, na), i) =>
          sorted.iterator.drop(i + 1).flatMap { case (idb, vb, nb) =>
            // same sequential left-to-right fold as VecDotProduct —
            // bit-identical IEEE sequence to the former joined plan
            var s = 0.0; var j = 0
            while (j < va.length) { s += va(j) * vb(j); j += 1 }
            val cos = s / (na * nb)
            if (cos >= minCosine)
              Iterator.single(org.apache.spark.sql.Row(ida, idb, cos))
            else Iterator.empty
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
    raw.select(col("id_a"), col("id_b"),
      round(col("cosine_raw"), 4).as("cosine"))
  }

  /** IVF (inverted-file) approximate top-k: the corpus is clustered once
    * into `k` centroids (deterministic seeds = the `k` lowest md5-ranked
    * ids, refined by `lloydIters` distributed Lloyd iterations), each vector
    * indexed under its nearest centroid, and a query scores ONLY the
    * `nProbe` nearest clusters. At scale the index is computed once and the
    * per-query work drops from O(N) to O(N·nProbe/k); clusters are the
    * shuffle/partition key, so probes are pruned scans.
    *
    * All arithmetic is the same deterministic double fold as the exact path;
    * centroid seeding uses md5 ranks, no RNG.
    */
  /** @param excludeSelf see [[bruteForceTopK]] — requires a shared id space. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nProbe: Int,
      topK: Int, lloydIters: Int = 2, roundScale: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(nProbe <= k, s"nProbe ($nProbe) must be <= k ($k)")
    import org.apache.spark.sql.expressions.Window
    // NOT cached: the returned DataFrame is lazy, so a cache here could
    // never be unpersisted and would pin the widened corpus in executor
    // memory for the session lifetime; at scale, persist the INDEX (the
    // assigned corpus) explicitly at the call site instead.
    // Null-vector rows are skipped (they can match nothing — same contract
    // as the LSH path's null signature); a vector CONTAINING null elements
    // raises, mirroring hyperplaneSignature — without the guard its
    // all-null distances would silently drop it from the index.
    def clean(df: DataFrame, vecCol: Column): DataFrame = df
      .filter(vecCol.isNotNull)
      .withColumn("__vg", when(exists(vecCol, _.isNull),
        raise_error(lit("ivfTopK: vector contains null elements"))).otherwise(vecCol))
    val c = clean(corpus.select(col("id"), toDoubleVec(col("vec")).as("v")), col("v"))
      .select(col("id"), col("__vg").as("v"))

    // deterministic seeds: k smallest md5(id) ranks, selected via
    // TakeOrderedAndProject (orderBy.limit) — NOT a global row_number window,
    // which would drag the whole corpus through one partition; the ranking
    // window then runs over only the k seed rows
    // Each centroid generation is localCheckpoint'd (k rows — trivial at
    // any scale): the frame is BROADCAST once per assign/probe, and an
    // un-truncated lineage nests every prior Lloyd iteration, so each
    // broadcast build re-executed the whole centroid history including
    // its corpus scans (r19 stage logs: a dozen 0.2–0.3 s single-task
    // replans per q53 run). The checkpoint is the NOTES iterative rule
    // (one materialization per round, lineage cut), same as PageRank/BFS.
    var centroids = c
      .withColumn("__md", md5(col("id").cast("string")))
      .orderBy(col("__md"), col("id"))
      .limit(k)
      .withColumn("cluster",
        row_number().over(Window.orderBy(col("__md"), col("id"))) - 1)
      .select(col("cluster"), col("v").as("cv"))
      .localCheckpoint(true)

    // argmin via max_by partial aggregation, NOT a row_number window: a
    // window over Window.partitionBy(id) would shuffle all N·k scored rows
    // and sort them; max_by is a declarative aggregate, so the map side
    // reduces each partition to one candidate per id BEFORE the shuffle
    // (~N rows move, not N·k — the difference is decisive at k in the
    // tens of thousands). Ordering key (cosine, -cluster): lexicographic
    // max = highest cosine, ties to the LOWEST cluster id — identical to
    // the former orderBy(__d desc, cluster asc) tiebreak.
    def assign(vecs: DataFrame, cents: DataFrame): DataFrame =
      vecs.crossJoin(broadcast(cents))
        .withColumn("__d", dot("v", "cv") / (norm("v") * norm("cv")))
        .groupBy(col("id"))
        .agg(max_by(struct(col("cluster"), col("v")),
          struct(col("__d"), -col("cluster"))).as("__best"))
        // max_by skips rows whose ordering is null; if EVERY distance for an
        // id is null (dim mismatch vs all centroids) the row would silently
        // vanish from the index — raise instead
        .withColumn("__best", when(col("__best").isNull,
          raise_error(concat(lit("ivfTopK: no valid centroid distance for id "),
            col("id").cast("string"), lit(" (vector dim mismatch?)"))))
          .otherwise(col("__best")))
        .select(col("id"), col("__best.v").as("v"), col("__best.cluster").as("cluster"))

    // Lloyd refinement: element-wise mean per cluster via posexplode
    (1 to lloydIters).foreach { _ =>
      val assigned = assign(c, centroids)
      centroids = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cluster"), expr("transform(pm, e -> e.m)").as("cv"))
        .localCheckpoint(true)
    }

    val indexed = assign(c, centroids)
      .withColumnRenamed("id", "neighbor_id").withColumnRenamed("v", "cv2")
    val q = clean(queries.select(col("id").as("q_id"), toDoubleVec(col("vec")).as("qv")),
      col("qv")).select(col("q_id"), col("__vg").as("qv"))
    // top-nProbe clusters per query, also via partial aggregation instead of
    // a per-query window sort over Q·k rows: collect the k (score, cluster)
    // pairs per query, array_sort ascending by (cosine, -cluster), take the
    // LAST nProbe (= cosine desc, ties to lowest cluster — same tiebreak as
    // assign). The collected array is k elements — bounded by the centroid
    // count, not the corpus. Positive-start slice: when fewer than nProbe
    // centroids exist (corpus smaller than k), a negative-start slice would
    // return EMPTY and the query would silently match nothing — start at
    // max(1, size-nProbe+1) instead, which degrades to probing all clusters.
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("__d", dot("qv", "cv") / (norm("qv") * norm("cv")))
      .groupBy(col("q_id"))
      .agg(first(col("qv")).as("qv"),
        array_sort(collect_list(struct(col("__d"), (-col("cluster")).as("__nc"),
          col("cluster")))).as("__all"))
      .select(col("q_id"), col("qv"), explode(expr(
        s"slice(__all, greatest(1, size(__all) - $nProbe + 1), $nProbe).cluster"))
        .as("cluster"))

    probes.join(indexed, Seq("cluster"))
      .filter(if (excludeSelf) col("q_id") =!= col("neighbor_id") else lit(true))
      .withColumn("sim", round(dot("qv", "cv2") / (norm("qv") * norm("cv2")), roundScale))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= topK)
      .select(col("q_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  /** Exact cosine near-dup pairs (the correctness baseline for
    * [[lshNearDupPairs]]): full pair space, id_a < id_b.
    */
  def exactNearDupPairs(vectors: DataFrame, minCosine: Double,
      roundScale: Int = 4): DataFrame = {
    val v = vectors.select(col("id"), toDoubleVec(col("vec")).as("v")).withColumn("nrm", norm("v"))
    val a = v.select(col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot("va", "vb") / (col("na") * col("nb")), roundScale))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
