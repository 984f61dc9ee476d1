package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generates a larger synthetic scale factor from an existing one by
  * replicating the FACT tables `factor`× with disjoint key spaces, so plan
  * behavior (bucket caps, iteration counts, shuffle sizes) can be measured
  * one decade up from the graded sf (VERDICT r02 item 5: "the 100-TB
  * argument currently rests on plan shapes alone").
  *
  * Design:
  *  - `lineitem` / `orders` copies shift `*_orderkey` by k·10⁹ — joins stay
  *    consistent within a copy, never collide across copies. Dimension keys
  *    (`partkey`/`suppkey`/`custkey`) are untouched: facts grow, dims don't,
  *    which is exactly how warehouse scale-up behaves.
  *  - `documents` copies shift `doc_id` by k·10⁷ and substitute the text
  *    through a per-copy AFFINE cipher σ(i) = m·i + r (mod 26), m coprime
  *    to 26 (`translate` over the permuted alphabet): any letter bijection
  *    preserves word lengths, shingle counts and within-copy similarity
  *    structure EXACTLY. Cross-copy disjointness is EXACT within one
  *    m-family (same multiplier, different shift: zero agreeing letters —
  *    the old Caesar guarantee, factors ≤ 26) and STATISTICAL across
  *    families: two copies with different multipliers agree on at most 2
  *    letters (the congruence (m₁−m₂)i ≡ r₂−r₁ has gcd(Δm,26) ≤ 2
  *    solutions), and non-letter characters are identity in every copy —
  *    so a cross-copy shingle collision requires text drawn entirely from
  *    the ≤2 shared letters plus digits/punctuation, which the generated
  *    English-like corpus never produces (verified empirically at factor
  *    100: ZERO cross-copy q37 pairs. Per-copy pair counts are
  *    statistically — not bit — identical to the source's, 102.5× total
  *    at 100 copies: true Jaccard is bijection-invariant, but minhash
  *    ESTIMATES hash the substituted shingle strings, so each copy draws
  *    an independent estimator sample; BASELINE round-11). Rounds ≤10 used plain
  *    Caesar rotations (the m = 1 column); 12 units × 26 shifts give 312
  *    distinct permutations, so the 100× table fits with headroom.
  *    Copy 0 is (m=1, r=0) = identity, so source docs survive unchanged.
  *  - `embeddings` copies shift `vec_id` by k·10⁶ and apply a per-copy
  *    ±1 sign-flip to each coordinate (a diagonal orthogonal transform):
  *    every within-copy dot product, norm, and cosine is preserved
  *    BIT-FOR-BIT (s_i² = 1 and ±1 multiplication is exact in IEEE
  *    float), so per-copy neighbor structure is exactly that of the
  *    source. LSH bucket balance and IVF cluster geometry are only
  *    STATISTICALLY equivalent, not bit-exact: the fixed md5-derived
  *    hyperplanes/centroid seeds are NOT sign-flipped with the copies,
  *    so flipped vectors land in different (but equally balanced)
  *    buckets. Meanwhile
  *    cross-copy cosines decorrelate (random-sign inner products
  *    concentrate near 0) — ANN build+probe cost must scale with the
  *    corpus, not luck into one giant cross-copy cluster. Copy 0 keeps
  *    the identity pattern, so the source vectors survive unchanged.
  *  - Everything else (dims) is copied through.
  *
  * Outputs are written with `repartition(32)` — the driver's testdata is
  * single-row-group parquet (NOTES.md), which collapses downstream
  * parallelism; a scale-up run must not inherit that artifact.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [factor=10]
  */
object ScaleUp {

  private val alpha = "abcdefghijklmnopqrstuvwxyz"

  /** Multiplicative units of ℤ/26 — the valid `m` of an affine cipher.
    * m=1 first so copies 0–25 are exactly the Caesar rotations earlier
    * rounds generated (k=0 the identity), keeping old scale dirs
    * regenerable bit-for-bit at factor ≤ 26.
    */
  private val units = Array(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  /** Image alphabet of copy k's substitution: position i holds
    * σₖ('a'+i) where σₖ(i) = mₖ·i + rₖ (mod 26), (mₖ, rₖ) =
    * (units(k/26), k%26). Distinct k < 312 give distinct permutations
    * (an affine map over ℤ/26 is determined by σ(0)=r and σ(1)−σ(0)=m).
    */
  private[tools] def affine(k: Int): String = {
    require(k >= 0 && k < units.length * 26, s"copy index $k out of range")
    val m = units(k / 26); val r = k % 26
    (0 until 26).map(i => alpha((m * i + r) % 26)).mkString
  }

  /** Deterministic ±1 pattern for copy k (identity for k=0): one step of a
    * 64-bit LCG per coordinate, seeded by k — reproducible across runs and
    * JVMs, no RNG state. */
  private[tools] def signPattern(k: Int, dim: Int): Array[Float] =
    if (k == 0) Array.fill(dim)(1f)
    else {
      var s = k.toLong * 6364136223846793005L + 1442695040888963407L
      Array.fill(dim) {
        s = s * 6364136223846793005L + 1442695040888963407L
        if (((s >>> 33) & 1L) == 0L) 1f else -1f
      }
    }

  /** Fail loud on a ragged/null-bearing embedding source (mirrors the
    * stride asserts): `zip_with` null-pads the shorter side, so a vector
    * shorter than the common dimension would silently scale into
    * null-padded embeddings and downstream hyperplaneSignature / dot
    * products would break on the scaled dir only. Returns the uniform
    * dimension.
    */
  private[tools] def assertUniformEmbeddingDim(emb: DataFrame): Int = {
    val dims = emb.select(
      min(size(col("embedding"))).as("lo"), max(size(col("embedding"))).as("hi"),
      count(lit(1)).as("n"), count(col("embedding")).as("nonnull")).head
    require(dims.getLong(2) == dims.getLong(3),
      s"embeddings: ${dims.getLong(2) - dims.getLong(3)} null embedding(s)")
    require(dims.getInt(0) == dims.getInt(1),
      s"embeddings: ragged dimensions min=${dims.getInt(0)} max=${dims.getInt(1)}")
    dims.getInt(1)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // the affine substitution family holds 312 distinct permutations (12
    // units × 26 shifts); past that, copies would repeat text byte-for-byte
    // and silently break the disjoint-shingle guarantee. Id strides bound
    // the per-copy key spaces well above 312 on every driver SF.
    require(factor >= 1 && factor <= 312, s"factor ($factor) must be in [1, 312]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit =
      df.repartition(32).write.mode("overwrite").parquet(s"$dst/$name.parquet")

    def copies(df: DataFrame)(copy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => copy(df, k)).reduce(_ unionAll _)

    // The disjoint-key-space guarantee holds only while every source id
    // stays below its shift stride; a larger source SF that overflowed a
    // stride would collide copies and corrupt the "k× actors with identical
    // per-copy structure" invariant SILENTLY (counts would still look
    // plausible). Fail loudly instead, mirroring the factor<=26 require.
    def assertBelowStride(df: DataFrame, idCol: String, stride: Long,
        table: String): Unit = {
      val mx = df.agg(max(col(idCol).cast("long"))).head.getLong(0)
      require(mx < stride,
        s"$table.$idCol max ($mx) >= copy stride ($stride): scaled copies " +
          "would collide; raise the stride for this source SF")
    }

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    assertBelowStride(lineitem, "l_orderkey", 1000000000L, "lineitem")
    write(copies(lineitem) { (d, k) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * 1000000000L))
    }, "lineitem")

    val orders = spark.read.parquet(s"$src/orders.parquet")
    assertBelowStride(orders, "o_orderkey", 1000000000L, "orders")
    write(copies(orders) { (d, k) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(k.toLong * 1000000000L))
    }, "orders")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    assertBelowStride(docs, "doc_id", 10000000L, "documents")
    write(copies(docs) { (d, k) =>
      d.withColumn("doc_id", col("doc_id") + lit(k.toLong * 10000000L))
        .withColumn("text", translate(col("text"),
          alpha + alpha.toUpperCase, affine(k) + affine(k).toUpperCase))
    }, "documents")

    // events copies shift event_id (tiebreaker stays unique) AND user_id
    // (the partition key of every events window/session/funnel): k× the
    // data means k× the users with identical per-user event structure —
    // the warehouse model for event streams (traffic grows by actors, not
    // by making one actor's history k× longer). Session/funnel/survival
    // counts scale exactly linearly; window-state parallelism grows with
    // the copies, which is precisely what the scale check must exercise.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val eventsSrc = spark.read.parquet(s"$src/events.parquet")
    // normalize ts to the current generator layout (TIMESTAMP_NTZ micros)
    // before writing: a legacy int64-nanos source would otherwise scale into
    // a bare-BIGINT ts that DuckDB reads as a number, breaking every events
    // oracle on the scaled dir (Spark itself would cope via
    // Tables.canonicalizeEventsTs, which is exactly why it would go unseen)
    val events = graft.core.Tables.canonicalizeEventsTs(eventsSrc)
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    assertBelowStride(events, "event_id", 1000000000L, "events")
    assertBelowStride(events, "user_id", 10000000L, "events")
    write(copies(events) { (d, k) =>
      d.withColumn("event_id", col("event_id") + lit(k.toLong * 1000000000L))
        .withColumn("user_id", col("user_id") + lit(k.toLong * 10000000L))
    }, "events")

    // embeddings: vec_id-shifted copies under per-copy sign-flip diagonals
    // (see the scaladoc) — the ANN family's scale-evidence input. The
    // pattern is zip_with-multiplied element-wise; ±1 products are exact,
    // so within-copy geometry is bit-identical to the source.
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    assertBelowStride(emb, "vec_id", 1000000L, "embeddings")
    val dim = assertUniformEmbeddingDim(emb)
    write(copies(emb) { (d, k) =>
      val pat = typedLit(signPattern(k, dim).toSeq)
      d.withColumn("vec_id", col("vec_id") + lit(k.toLong * 1000000L))
        .withColumn("embedding",
          zip_with(col("embedding"), pat, (x, y) => x * y))
    }, "embeddings")

    // passthrough: dims stay fixed-size
    for (t <- Seq("region", "nation", "customer", "supplier", "part")) {
      val in = s"$src/$t.parquet"
      val out = new org.apache.hadoop.fs.Path(s"$dst/$t.parquet")
      val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(out, true)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(in), fs, out, false,
        spark.sparkContext.hadoopConfiguration)
    }

    for (t <- Seq("lineitem", "orders", "documents", "events", "embeddings"))
      println(s"[scaleup] $t rows: " +
        spark.read.parquet(s"$dst/$t.parquet").count())
    spark.stop()
  }
}
