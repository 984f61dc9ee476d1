package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.{Decontaminate, Dedup}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deduplication query surface over `documents` — exact, MinHash+LSH,
  * n-gram Jaccard, SimHash (the training-data pipeline dedup family), each
  * with a full DuckDB oracle thanks to md5-based portable hashing
  * ([[graft.ops.Dedup.hash60]]).
  */
object DedupQ {

  private val NumHashes = 8
  private val RowsPerBand = 2
  /** Degenerate-bucket cap, mirrored EXACTLY in the oracle SQL (the Spark
    * side and the DuckDB side must drop the same buckets or hashes diverge
    * on data with identical-signature masses).
    */
  private val MaxBucketSize = 4096

  /** Exact dedup by content hash. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables(spark, dir).documents, "doc_id", "text")

  private val dedupExactSql = Oracles("dedup", "dedupExact")

  /** MinHash + LSH candidate pairs: word-3-gram shingles → 8 salted-md5
    * minhash signatures → 4 bands of 2 → pairs sharing a band bucket.
    */
  /** Candidate pairs WITH their shared-band count, memoized — the ONE
    * LSH band build the whole dedup family derives from: [[minhashPairs]]
    * (q37 and its consumers) is a projection of this table, and
    * [[lshCalibration]] (q170) reads the counts directly, so the
    * expensive tokenize → shingle → minhash → band pass runs once per
    * (session, sf) no matter how many pair consumers execute.
    */
  private def bandPairCounts(spark: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(spark, s"q170-bandpairs:$dir") {
      // cross-JVM artifact (DiskCache, the GraphQ pattern): the tokenize →
      // shingle → minhash → band expansion is the dedup family's root
      // build; later JVMs read the published pair table
      val fp = graft.core.DiskCache.fingerprint(dir, Seq("documents"))
      graft.core.DiskCache.cached(spark, s"minhash-bandpairs-v1-$fp") {
        val t = Tables(spark, dir)
        val bands = Dedup.bandFingerprints(t.documents, "doc_id", "text",
          NumHashes, RowsPerBand)
        Dedup.candidatePairsWithCount(bands, "doc_id", MaxBucketSize)
      }.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    // the candidate-pair set is TINY (pairs, not corpus) but expensive to
    // build (tokenize → shingle → minhash → band); four consumers exist
    // (q37, q76's closure, q100's curation, DedupSpec) — materialize once
    // per (session, sf) and let the family amortize, the same
    // stage-materialization pattern the pipeline family documents.
    // The pair SET is exactly [[bandPairCounts]] minus the count column
    // (candidatePairs ≡ distinct of the same in-bucket expansion).
    graft.core.Memo.cached(spark, s"q37-pairs:$dir") {
      bandPairCounts(spark, dir).select(col("doc_a"), col("doc_b"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** Shared oracle CTE chain: tokens → shingles → minhash signatures → LSH
    * bands → candidate pairs (mirrors [[graft.ops.Dedup]] exactly, incl. the
    * two 60-bit windows carved from each md5 digest).
    */
  private val minhashCtes: String = {
    def h60(x: String, i: Int): String =
      s"('0x' || substr(md5('${i / 2}:' || $x), ${1 + 15 * (i % 2)}, 15))::BIGINT"
    val minhashes = (0 until NumHashes)
      .map(i => s"MIN(${h60("shingle", i)}) AS h$i").mkString(",\n    ")
    val bandRows = (0 until NumHashes / RowsPerBand).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"h${b * RowsPerBand + r}::VARCHAR")
      s"SELECT doc_id, $b AS band, md5(${cols.mkString(" || ',' || ")}) AS band_key FROM sigs"
    }.mkString("\n  UNION ALL ")
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_distinct(list_transform(range(1, len(toks) - 1),
       |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS shingle
       |  FROM w WHERE len(toks) >= 3
       |), sigs AS (
       |  SELECT doc_id,
       |    $minhashes
       |  FROM sh GROUP BY doc_id
       |), bands AS (
       |  $bandRows
       |), ok_buckets AS ( -- mirrors Dedup.candidatePairs maxBucketSize
       |  SELECT band, band_key FROM bands
       |  GROUP BY band, band_key
       |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND $MaxBucketSize
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |  JOIN ok_buckets k ON a.band = k.band AND a.band_key = k.band_key
       |)""".stripMargin
  }

  private val minhashPairsSql = Oracles("dedup", "minhashPairs",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** N-gram (word-3-gram shingle) exact Jaccard, gated behind the MinHash+LSH
    * candidate pairs (round-1 judge item 6: the former (lang, len_bucket)
    * bucketing was quadratic within hot buckets at scale — LSH candidates
    * bound the pair space by construction, and the exact Jaccard then
    * CONFIRMS candidates rather than re-discovering them). Same shingle
    * construction as the MinHash pipeline, so estimate and exact score are
    * directly comparable; the shingle table is persisted once and feeds both
    * the signature aggregation and the two pair-side lookups.
    */
  /** (doc_id, distinct-3-gram-shingle-array) table, memoized per
    * (session, dir): repeated invocations (bench medians) and the three
    * consumers (q38, q167, q170) reuse ONE pinned shingle table instead
    * of stacking new cache copies.
    */
  private def shingleDocs(spark: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(spark, s"q38-shingles:$dir") {
      val t = Tables(spark, dir)
      // spread: the 1-split testdata scan would otherwise persist this as a
      // ONE-partition cache, and every consumer's heavy map chain on top
      // (q38's shingle explode + NumHashes×md5 signature partials measured
      // as single-task 2 s stages, r19 stage log) serializes on one core.
      // Identity at production split counts — same rule as bandFingerprints.
      Tables.spread(t.documents)
        .select(col("doc_id"), Dedup.words(col("text")).as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), Dedup.wordShingles("w", 3).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val d = shingleDocs(spark, dir)
    val shingled = d.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val sigs = Dedup.minhashSignatures(shingled, "doc_id", "shingle", NumHashes)
    val bands = Dedup.lshBands(sigs, "doc_id", NumHashes, RowsPerBand)
    Dedup.candidatePairs(bands, "doc_id", MaxBucketSize)
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("jaccard", Dedup.jaccard(col("sa"), col("sb")))
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  private val ngramJaccardPairsSql = Oracles("dedup", "ngramJaccardPairs",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** Transitive near-dup clusters: connected components over the MinHash
    * candidate pairs — cluster id = min doc_id in the component (the
    * canonical survivor real dedup keeps). The oracle computes the same
    * closure with a DuckDB RECURSIVE CTE — a fully independent transitive
    * closure implementation, so label-propagation bugs can't self-confirm.
    */
  def neardupComponents(spark: SparkSession, dir: String): DataFrame =
    // the label-propagation result is localCheckpoint-backed (materialized)
    // — memoizing shares it between q76 and q100's curation for free
    graft.core.Memo.cached(spark, s"q76-components:$dir") {
      // the closure's label-propagation rounds are the family's iterative
      // block (q76/q100/q221/q136 all ride it) — published cross-JVM, a
      // warm pass reads (id, component) instead of iterating
      val fp = graft.core.DiskCache.fingerprint(dir, Seq("documents"))
      graft.core.DiskCache.cached(spark, s"neardup-components-v1-$fp") {
        Dedup.connectedComponents(minhashPairs(spark, dir), "doc_a", "doc_b")
      }
    }

  private val neardupComponentsSql = Oracles("dedup", "neardupComponents",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** SimHash 60-bit signatures per document (near-dup clustering key). */
  /** Memoized per (session, dir): the signature build (token explode ×
    * 60 bit votes) is the whole cost, and TWO consumers read it — q39
    * (the listing) and q207 (the distance histogram) — the shingleDocs
    * amortization pattern.
    */
  def simhashSigs(spark: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(spark, s"q39-sigs:$dir") {
      val t = Tables(spark, dir)
      // spread: the per-token md5 fan-out is the hot stage and otherwise
      // runs single-threaded on the 1-split testdata scan (q207 consumer
      // measured 8.6–17.7 s → 2.7 s spread)
      Dedup.simhashInRow(
        Tables.spread(t.documents).select(col("doc_id"),
          array_distinct(Dedup.words(col("text"))).as("toks")),
        "doc_id", "toks")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val simhashSigsSql = Oracles("dedup", "simhashSigs")

  /** Fuzzy matching — levenshtein edit distance over (p_type, p_size)
    * candidate buckets (the bucketing bounds the pair space; edit distance
    * only runs within buckets).
    */
  def fuzzyPartNames(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val p = t.part.select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))
    // spread the STREAM side only: the in-bucket pair expansion +
    // per-pair levenshtein otherwise runs single-task on the 1-split part
    // scan (r19 census: 0.8 s serial); the build side stays unspread so
    // the broadcast pays no extra exchange. Identity at production splits.
    val a = Tables.spread(p).select(col("p_type"), col("p_size"), col("p_partkey").as("key_a"),
      col("p_name").as("name_a"))
    val b = p.select(col("p_type"), col("p_size"), col("p_partkey").as("key_b"),
      col("p_name").as("name_b"))
    a.join(b, Seq("p_type", "p_size"))
      .filter(col("key_a") < col("key_b") && col("name_a") =!= col("name_b"))
      .withColumn("edit_distance", levenshtein(col("name_a"), col("name_b")))
      .filter(col("edit_distance") <= 3)
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("edit_distance"))
  }

  private val fuzzyPartNamesSql = Oracles("dedup", "fuzzyPartNames")

  /** q83 — train/eval decontamination: documents from source `src0` play
    * the eval set, everything else the training corpus; flag eval docs
    * whose (frequency-capped) trigram shingles are >= 50% contained in a
    * train doc. See [[graft.ops.Decontaminate]] for the scale shape (df-cap
    * before the shingle join, post-cap denominators — both mirrored here
    * and in the oracle).
    */
  def decontamination(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents
    Decontaminate.overlap(
      eval = docs.filter(col("source") === "src0"),
      train = docs.filter(col("source") =!= "src0"),
      idCol = "doc_id", textCol = "text",
      n = 3, maxShingleDf = 50, minContainment = 0.5)
  }

  private val decontaminationSql = Oracles("dedup", "decontamination")

  /** q100 — the END-TO-END curation composition under one oracle: LSH
    * near-dup components (q76) pick one canonical survivor per cluster
    * (the component minimum), survivors flow straight into token-budget
    * sequence packing (q79) — the full dedup→pack training-data path as a
    * SINGLE checked dataflow, proving the operators compose without
    * materialization boundaries (CorpusSpec checks the same composition as
    * invariants; this pins exact rows). The anti-join against the loser
    * set is broadcastable (losers ≪ corpus).
    */
  def curateAndPack(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents
    val comps = neardupComponents(spark, dir)
    val losers = comps.filter(col("id") =!= col("component")).select(col("id"))
    val survivors = docs.join(losers, docs("doc_id") === losers("id"), "left_anti")
    graft.ops.Pack.concatAndChunk(survivors, idCol = "doc_id",
      groupCol = "source", budget = 2048, shards = 8)
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
  }

  private val curateAndPackSql = Oracles("dedup", "curateAndPack",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q120 — INCREMENTAL dedup against a prior corpus snapshot, checked by
    * the identity `full-corpus pairs ≡ prior-run pairs ∪ incremental
    * pairs`: the corpus splits into a "prior" snapshot (doc_id % 3 ≠ 0)
    * whose fingerprints go through a real parquet fingerprint-store
    * round trip ([[graft.ops.Dedup.writeFingerprintStore]]), and a "new"
    * batch (doc_id % 3 = 0) paired via
    * [[graft.ops.Dedup.incrementalPairs]] — new-new and new-prior
    * candidates only, prior-prior pairs reused from the prior run, the
    * whole corpus never re-paired. The ORACLE IS q37's full-corpus SQL
    * verbatim: the driver's compare proves the incremental composition
    * reproduces the single-shot run exactly (fingerprints depend only on
    * each document's own text, so bucketing is run-independent; no sf0.01
    * bucket approaches the shared cap).
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(spark, s"q120-incr:$dir") {
      val docs = Tables(spark, dir).documents
      val prior = docs.filter(col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(col("doc_id") % 3 === 0)
      val storePath = graft.core.Scratch.dir("graft-fpstore") + "/bands"
      Dedup.writeFingerprintStore(
        Dedup.bandFingerprints(prior, "doc_id", "text", NumHashes, RowsPerBand),
        storePath)
      val store = Dedup.readFingerprintStore(spark, storePath)
      val priorPairs = Dedup.candidatePairs(store, "doc_id", MaxBucketSize)
      val incr = Dedup.incrementalPairs(
        Dedup.bandFingerprints(fresh, "doc_id", "text", NumHashes, RowsPerBand),
        store, "doc_id", MaxBucketSize)
      // disjoint by construction: incremental pairs always touch a new id
      priorPairs.union(incr)
    }

  /** q136 — QUALITY-aware canonical survivor per near-dup cluster: real
    * curation does not keep the lowest doc_id, it keeps the BEST copy.
    * Compose the q76 component closure with the q122 classifier logit:
    * survivor = argmax (logit, −doc_id) per component, via ONE `max_by`
    * partial aggregate over the (tiny) component assignment joined to
    * the map-only logit — no window, no sort, and the corpus outside
    * the clusters is untouched. Output: one row per cluster with the
    * chosen survivor, its logit, and the cluster size. The oracle
    * re-derives the same closure (RECURSIVE CTE) and the same integer
    * logit, so the argmax agrees exactly (BIGINT logit, deterministic
    * id tiebreak).
    */
  def qualitySurvivor(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val comps = neardupComponents(spark, dir)
    // spread: the per-token md5 logit map otherwise runs single-task on
    // the 1-split scan (q122/q190 rule; identity at production splits)
    val logits = Tables.spread(t.documents).select(col("doc_id"),
      graft.ops.QualityScorer.logitMicro(col("text"),
        graft.ops.QualityScorer.md5Weights(256)).as("logit_u"))
    comps.join(logits, comps("id") === logits("doc_id"))
      .groupBy(col("component"))
      .agg(
        max_by(struct(col("doc_id").as("survivor_id"),
          col("logit_u").as("survivor_logit_u")),
          struct(col("logit_u"), -col("doc_id"))).as("best"),
        count(lit(1)).as("cluster_size"))
      .select(col("component"), col("best.survivor_id").as("survivor_id"),
        col("best.survivor_logit_u").as("survivor_logit_u"),
        col("cluster_size"))
  }

  private val qualitySurvivorSql = Oracles("dedup", "qualitySurvivor",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q188 — dedup IMPACT report per source: document and character counts
    * before vs after quality-survivor near-dup removal (q76 components +
    * q136 argmax-logit survivors), with exact retained-ppm. This is the
    * number every curation change ships with — "near-dup removal cost
    * source X 12% of its characters" — and it surfaces the classic
    * failure where one boilerplate-heavy source silently collapses while
    * the aggregate retention still looks healthy.
    *
    * Scale shape: the component and survivor tables are cluster-members
    * only (≪ corpus) and BROADCAST into one pass over `documents`; the
    * kept/dropped decision is a row-local predicate and the report is a
    * single per-source hash agg — the corpus itself never shuffles.
    * Oracle: the q136 RECURSIVE-CTE closure + argmax survivor recomputed
    * independently in SQL, then the same one-pass accounting.
    */
  def dedupImpact(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val comps = neardupComponents(spark, dir)
    val surv = qualitySurvivor(spark, dir)
      .select(col("component").as("sc"), col("survivor_id"))
    t.documents.select(col("doc_id"), col("source"), col("n_chars"))
      .join(broadcast(comps), col("doc_id") === comps("id"), "left")
      .join(broadcast(surv), col("component") === col("sc"), "left")
      .withColumn("kept",
        col("component").isNull || col("doc_id") === col("survivor_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_before"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_after"),
        sum(col("n_chars")).as("chars_before"),
        sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars_after"))
      .withColumn("retained_ppm", expr("n_after * 1000000 div n_before"))
  }

  private val dedupImpactSql = Oracles("dedup", "dedupImpact",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q150 — the COMPLETE modern curation pipeline as ONE checked
    * dataflow, upgrading q100's min-id composition with this round's
    * operators: LSH near-dup components → BEST-QUALITY survivor per
    * cluster (q136's argmax logit) → domain-mixture resampling over the
    * survivors (q125's exact kilo-char rates) → token-budget sequence
    * packing (q79). Every stage is individually oracle-verified; this
    * pins that they COMPOSE — survivors feed rates computed on the
    * post-dedup corpus (rates on the raw corpus would double-count
    * duplicates' chars, a real pipeline bug), and packing consumes
    * exactly the resampled set. Shapes: all stages keep their audited
    * plans (memoized components, map-only logits, broadcast rate table,
    * shard-local pack windows).
    */
  def curateV2(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val docs = t.documents
    val comps = neardupComponents(spark, dir)
    // spread: the logit projection feeds both the loser build and the
    // survivor read; single-task on the 1-split scan otherwise (q122/q190
    // rule; identity at production splits)
    val logits = Tables.spread(docs).select(col("doc_id"),
      graft.ops.QualityScorer.logitMicro(col("text"),
        graft.ops.QualityScorer.md5Weights(256)).as("logit_u"))
    // comps is cluster-members-only (tiny vs the corpus) — broadcast it
    // into the logit projection, and broadcast the loser set into the
    // anti-join (losers ≪ corpus, q100's documented shape)
    // losers is checkpointed (r19): it feeds the anti-join under THREE
    // survivor readers, and its build contains the full-corpus 256-weight
    // logit projection — un-persisted, the runtime plan re-ran that
    // corpus pass per reader (plan audit: documents scanned 8×). The
    // loser set is cluster-members-only — tiny at any scale.
    val losers = broadcast(comps).join(logits, comps("id") === logits("doc_id"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
          .orderBy(col("logit_u").desc, col("doc_id"))))
      .filter(col("rn") > 1).select(col("id"))
      .localCheckpoint(true)
    val survivors = docs.join(broadcast(losers),
      docs("doc_id") === losers("id"), "left_anti")
    // mixture rates over the SURVIVOR corpus (post-dedup chars): ONE
    // survivor aggregation pass (r19) — per is checkpointed (source-grain,
    // bounded) so the sum-of-weights re-read is control-plane, and the
    // corpus total rides per: Σ_s chars_s ≡ Σ n_chars EXACTLY (both exact
    // BIGINT sums; the div-1000 floor applies after the identical total),
    // so the old second survivor scan computed the same number.
    val per = survivors.groupBy(col("source")).agg(sum(col("n_chars")).as("chars_s"))
      .withColumn("ks_s", greatest(lit(1L), expr("chars_s div 1000")))
      .withColumn("w_s", graft.ops.Dedup.hash60(col("source")) % 5 + 1)
      .localCheckpoint(true)
    val tot = per.agg(expr("sum(chars_s) div 1000").as("ks_tot"))
    val sumw = per.agg(sum(col("w_s")).as("sum_w"))
    val rates = per.crossJoin(broadcast(tot)).crossJoin(broadcast(sumw))
      .withColumn("rate_u", least(lit(1000000L),
        expr("(ks_tot * 2 div 5) * w_s div sum_w * 1000000 div ks_s")))
      .select(col("source"), col("rate_u"))
    val kept = survivors.join(broadcast(rates), Seq("source"))
      .filter(pmod(graft.ops.Dedup.hash60(col("doc_id").cast("string")),
        lit(1000000L)) < col("rate_u"))
    graft.ops.Pack.concatAndChunk(kept, idCol = "doc_id",
      groupCol = "source", budget = 2048, shards = 8)
      .select(col("doc_id"), col("source"), col("shard"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
  }

  private val curateV2Sql = Oracles("dedup", "curateV2",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q156 — near-dup CLUSTER-SIZE distribution: the dedup health report
    * every curation run publishes (how much of the corpus is duplicated,
    * in how many clusters, and is there a mega-cluster?). Singleton docs
    * — never paired, so absent from the component table — appear as
    * size-1 clusters via pure count arithmetic (total − covered), not a
    * data-sized anti-join. A sudden mega-cluster here is the classic
    * boilerplate-template failure a pair count alone hides.
    *
    * Scale shape: sizes and the distribution are two stacked hash aggs
    * over the (already-materialized, memo-shared) component table; the
    * totals are 1-row aggs broadcast into the singleton row. Output is
    * distribution-sized (≤ distinct cluster sizes + 1 rows).
    */
  def clusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val comps = neardupComponents(spark, dir)
    val dist = comps.groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"))
    val totals = t.documents.agg(count(lit(1)).as("n_total"))
    val covered = comps.agg(count(lit(1)).as("n_cov"))
    val singletons = totals.crossJoin(broadcast(covered)).select(
      lit(1L).as("cluster_size"),
      (col("n_total") - col("n_cov")).as("n_clusters"),
      (col("n_total") - col("n_cov")).as("n_docs"))
    dist.unionByName(singletons)
  }

  private val clusterSizesSql = Oracles("dedup", "clusterSizes",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q166 — CROSS-SOURCE near-duplicate MATRIX: the q37 candidate pairs
    * re-keyed to (source, source) — which subsets duplicate INTO each
    * other. Off-diagonal mass is the syndication/mirror signal (the same
    * article crawled from two sites); diagonal mass is within-source
    * boilerplate. This is the data-card companion to q159's
    * within-source exact-dup rate, at near-dup granularity.
    *
    * Scale shape: the pair set is the memoized q37 build (pairs, not
    * corpus — the family amortizes one LSH pass); each side joins to the
    * (doc_id, source) projection on the pair's own key, the pair-canon
    * `least/greatest` keeps the matrix triangular, and the final agg is
    * source×source-sized (tiny by construction).
    */
  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.documents.select(col("doc_id"), col("source"))
    minhashPairs(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_x"),
        greatest(col("sa"), col("sb")).as("source_y"))
      .groupBy(col("source_x"), col("source_y"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private val crossSourceDupsSql = Oracles("dedup", "crossSourceDups",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q167 — n-gram NOVELTY profile: for each document, the share of its
    * distinct 3-gram shingles that first appear IN that document (owner =
    * lowest doc_id containing the shingle — the deterministic
    * first-occurrence convention). Low-novelty documents are assembled
    * from content that already exists elsewhere in the corpus — the
    * incremental-value signal a curation pass reads alongside the
    * near-dup clusters (a doc can be 0.2 Jaccard from everything yet
    * still contribute almost no new n-grams).
    *
    * Scale shape: the memoized q38 shingle table feeds ONE shingle-keyed
    * aggregate (min owner — map-side combine) and one join back on the
    * same shingle key (the decontamination join discipline: shingle-
    * bounded, never doc×doc); the per-doc rollup is the only other
    * exchange. Exact integer ppm.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    // ex feeds the owner aggregate AND the join probe — two DIFFERENT
    // shingle-keyed exchanges (partial-agg vs plain), so exchange reuse
    // never applies and the explode over the memoized shingle table ran
    // twice (r19). Checkpoint the exploded postings once (guide §5 —
    // data-sized but reused; the explode is the query's map-side cost).
    val ex = shingleDocs(spark, dir)
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .localCheckpoint(true)
    val owner = ex.groupBy(col("shingle")).agg(min(col("doc_id")).as("owner"))
    ex.join(owner, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("n_novel * 1000000L div n_shingles").as("novelty_ppm"))
  }

  private val ngramNoveltySql = Oracles("dedup", "ngramNovelty")

  /** q170 — LSH CALIBRATION curve: mean exact Jaccard of candidate pairs
    * grouped by how many of the 4 LSH bands they collide in — the
    * empirical "bands shared → expected similarity" table that validates
    * the (numHashes, rowsPerBand) choice (more shared bands should mean
    * monotonically higher true similarity; a flat curve means the bands
    * aren't discriminating and the thresholds need retuning).
    *
    * Scale shape: band-collision counts come from the same single
    * hash-aggregate + capped in-task expansion as q37 (pairs, not
    * corpus); the exact Jaccard joins the memoized shingle arrays on the
    * pair's own keys; the final agg is 4 rows. Jaccards are rounded(4)
    * (the q38 scale) BEFORE the DECIMAL mean (Exact.dsum rule).
    */
  def lshCalibration(spark: SparkSession, dir: String): DataFrame = {
    val d = shingleDocs(spark, dir)
    bandPairCounts(spark, dir)
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("jr",
        round(Dedup.jaccard(col("sa"), col("sb")), 4).cast("decimal(18,4)"))
      .groupBy(col("n_pair"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("jr")).as("sj"))
      .select(col("n_pair").as("n_bands"), col("n_pairs"),
        round(col("sj").cast("double") / col("n_pairs"), 6).as("mean_jaccard"))
  }

  private val lshCalibrationSql = Oracles("dedup", "lshCalibration",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q173 — train/test SPLIT LEAKAGE audit: how many q114-split TEST
    * documents share at least one 3-gram shingle with the TRAIN split —
    * the self-contamination readout for a corpus release (q83
    * decontaminates against an EXTERNAL eval set; this audits the
    * corpus's own held-out split, where near-identical members of a
    * duplicate cluster routinely land on both sides of a random split).
    * Split assignment reuses q114's salted-hash thresholds verbatim, so
    * this audits exactly the split that q114 ships. Scope is shingleable
    * documents (≥3 words), the same universe the dedup family uses.
    *
    * Scale shape: the memoized shingle table + a map-side split tag; one
    * distinct on train shingles, one LEFT SEMI join on the shingle key,
    * one distinct on leaked test doc ids — all shingle/doc-keyed (the
    * decontamination discipline), final output a 1-row broadcast
    * combine.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val v = conv(substring(md5(concat_ws("|", lit("split"),
      col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
    val s = shingleDocs(spark, dir)
      .withColumn("split",
        when(v < 3435973836L, lit("train"))        // floor(0.8 * 2^32)
          .when(v < 3865470566L, lit("val"))       // floor(0.9 * 2^32)
          .otherwise(lit("test")))
    val ex = s.select(col("doc_id"), col("split"), explode(col("sh")).as("shingle"))
    val trainSh = ex.filter(col("split") === "train").select(col("shingle")).distinct()
    val leaked = ex.filter(col("split") === "test")
      .join(trainSh, Seq("shingle"), "left_semi")
      .select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n_leaked_test_docs"))
    val totals = s.agg(
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train_docs"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test_docs"))
    totals.crossJoin(broadcast(leaked))
      .select(col("n_train_docs"), col("n_test_docs"), col("n_leaked_test_docs"),
        expr("n_leaked_test_docs * 1000000L div n_test_docs").as("leak_ppm"))
  }

  private val splitLeakageSql = Oracles("dedup", "splitLeakage")

  /** q178 — near-dup cluster SOURCE PURITY: of the multi-document
    * near-dup clusters (q76's components), how many span more than one
    * source — the syndication-vs-boilerplate discriminator at CLUSTER
    * granularity (q166 counts cross-source PAIRS; a single 10-doc
    * mirror cluster contributes 45 pairs there but one cluster here,
    * so this is the de-skewed view). Per-cluster rows for the spanning
    * clusters plus their member/source counts.
    *
    * Scale shape: the memoized component table joins (doc_id, source)
    * on its own key; one component-keyed agg (cluster-sized output);
    * the multi-source filter is a HAVING on that agg.
    */
  def clusterSourcePurity(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val src = t.documents.select(col("doc_id").as("id"), col("source"))
    neardupComponents(spark, dir)
      .join(src, Seq("id"))
      .groupBy(col("component"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= 2)
      .select(col("component"), col("n_docs"), col("n_sources"),
        (col("n_sources") > 1).as("cross_source"))
  }

  private val clusterSourcePuritySql = Oracles("dedup", "clusterSourcePurity",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q182 — HASH-COLLISION integrity audit: distinct documents (by full
    * md5) that collide on the engine's 60-bit content hash
    * ([[Dedup.hash60]]) — the birthday-bound check behind every
    * hash-keyed operator in this engine (exact dedup, sampling, splits,
    * sharding). At 2⁶⁰ the expected collision count stays ~0 below ~10⁹
    * documents; a nonzero row at small scale means a broken hash, and
    * the expected-regime audit at 100 TB is THIS query on the real
    * corpus (where a handful of collisions is the birthday bound, not a
    * bug). Reports group sizes so a pathological many-way collision is
    * distinguishable from a 2-way birthday hit.
    *
    * Scale shape: one (hash60, md5) two-level aggregate — the second
    * level is collision-group-sized; a 1-row summary plus per-collision
    * rows (empty at healthy small scale, and the oracle proves EMPTY
    * exactly rather than assuming it).
    */
  def hashCollisionAudit(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pre = t.documents
      .groupBy(Dedup.hash60(col("text")).as("hv"), md5(col("text")).as("tm"))
      .agg(count(lit(1)).as("c"))
    val per = pre.groupBy(col("hv"))
      .agg(countDistinct(col("tm")).as("n_texts"), sum(col("c")).as("n_docs"))
    per.agg(
      count(lit(1)).as("n_hashes"),
      sum(when(col("n_texts") > 1, 1L).otherwise(0L)).as("n_colliding_hashes"),
      max(col("n_texts")).as("max_group_texts"),
      sum(col("n_docs")).as("n_docs_total"))
  }

  private val hashCollisionAuditSql = Oracles("dedup", "hashCollisionAudit")

  /** q202 — Bloom-filter decontamination with a false-positive audit: the
    * eval split's distinct 5-word shingles load a 2²⁰-bit Bloom filter
    * (32768 64-bit-storable words of 32 used bits; two salted 60-bit md5
    * hashes per shingle), and every TRAIN document is flagged when any of
    * its shingles has BOTH probe bits set. The exact shingle semi-join
    * (q83/q173's discipline) runs alongside as ground truth, so the output
    * quantifies the bloom's per-source false-positive cost — exact hits
    * are a subset of bloom flags by construction (no false negatives).
    *
    * Scale shape — the reason this exists: at 100 TB the corpus-side path
    * is scan → in-row shingles → TWO BROADCAST hash joins against the
    * 32768-row bloom table (map-side, no corpus shuffle) → a doc-id
    * distinct; the eval benchmark compresses to ~256 KiB of bits no
    * matter how many shingles it has. The exact semi-join twin — the only
    * shingle-keyed shuffle here — is the audit you run at small scale to
    * size the filter, then drop in production. 5-word shingles (vs the
    * family's 3) because contamination wants high-precision matches, not
    * near-dup recall. All hash math is the portable 60-bit md5
    * convention, so DuckDB rebuilds the identical filter bit-for-bit.
    */
  def bloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val M = 1048576L // bloom bits; 2^20 keeps doc-level FP rates sub-% here
    def splitCol(c: Column): Column = {
      val v = conv(substring(md5(concat_ws("|", lit("split"),
        c.cast("string"))), 1, 8), 16, 10).cast("long")
      when(v < 3435973836L, lit("train"))        // floor(0.8 * 2^32)
        .when(v < 3865470566L, lit("val"))       // floor(0.9 * 2^32)
        .otherwise(lit("test"))
    }
    val docs = t.documents.select(col("doc_id"), col("source"),
      splitCol(col("doc_id")).as("split"))
    // ONE tokenize base (r19): split is a pure function of doc_id, so it
    // computes in-row on the shingle side — the old shape joined the doc
    // table back just to read `split`, and because each consumer branch
    // re-planned the un-persisted subtree, the FULL-corpus shingle
    // explode ran three times (ev once, tr twice via the separate
    // bloom/exact flags). Each split now explodes once, off a spread
    // scan (the 1-row-group testdata plans one task; guide §2.5 — the
    // explode+md5 stages ran single-threaded, 1.5/1.1 s stage-log).
    val base = Tables.spread(t.documents.select(col("doc_id"), col("text")))
      .select(col("doc_id"), splitCol(col("doc_id")).as("split"),
        Dedup.words(col("text")).as("w"))
      .filter(size(col("w")) >= 5)
    def shOf(split: String) = base.filter(col("split") === split)
      .select(col("doc_id"), explode(Dedup.wordShingles("w", 5)).as("shingle"))
    // eval shingle set feeds the bloom build AND the exact audit join
    val ev = shOf("test").select(col("shingle")).distinct().localCheckpoint(true)
    def idx(saltN: Int): Column = pmod(Dedup.hash60(col("shingle"), s"bf$saltN"), lit(M))
    val bloom = ev.select(idx(1).as("i")).unionAll(ev.select(idx(2).as("i")))
      .select(expr("i div 32").as("w"),
        expr("shiftleft(1L, cast(i % 32 as int))").as("bv"))
      .groupBy(col("w")).agg(expr("bit_or(bv)").as("bits"))
    val tr = shOf("train")
      .withColumn("i1", idx(1)).withColumn("i2", idx(2))
    // Both flags in ONE pass over the train shingles (was: two passes +
    // two doc-id distincts): the bloom test is a map-side broadcast
    // predicate carried as 0/1, the exact audit is the one shingle-keyed
    // exchange (projected to (doc_id, shingle, bfp) first, guide §2.3),
    // and `max` per doc_id reproduces the old "any shingle hit" distinct
    // semantics exactly.
    val flags = tr
      .join(broadcast(bloom.select(col("w").as("w1"), col("bits").as("bits1"))),
        expr("i1 div 32") === col("w1"), "left")
      .join(broadcast(bloom.select(col("w").as("w2"), col("bits").as("bits2"))),
        expr("i2 div 32") === col("w2"), "left")
      .select(col("doc_id"), col("shingle"),
        (expr("coalesce(bits1, 0L) & shiftleft(1L, cast(i1 % 32 as int))") =!= 0 &&
         expr("coalesce(bits2, 0L) & shiftleft(1L, cast(i2 % 32 as int))") =!= 0)
          .cast("long").as("bfp"))
      .join(ev.withColumn("ex", lit(1L)), Seq("shingle"), "left")
      .groupBy(col("doc_id"))
      .agg(max(col("bfp")).as("bf"),
        max(coalesce(col("ex"), lit(0L))).as("ex"))
    docs.filter(col("split") === "train")
      .join(flags, Seq("doc_id"), "left")
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_train_docs"),
        sum(coalesce(col("bf"), lit(0L))).as("bloom_flagged"),
        sum(coalesce(col("ex"), lit(0L))).as("exact_hits"))
      .withColumn("fp_docs", col("bloom_flagged") - col("exact_hits"))
      .withColumn("fp_ppm", expr("fp_docs * 1000000 div n_train_docs"))
  }

  private val bloomDecontamSql = Oracles("dedup", "bloomDecontam")

  /** q211 — near-dup edit-distance profile: normalized character-level
    * Levenshtein distance across the MinHash candidate pairs, as a
    * percent-of-length histogram. Shingle Jaccard (q38/q170) measures
    * SET overlap; edit distance measures SEQUENCE closeness — templated
    * rewrites (same vocabulary, reshuffled order) sit low on Jaccard
    * distance but high on edit distance, so the two histograms together
    * say WHAT KIND of near-duplication the corpus carries (copy-edits
    * vs template stamping), which picks the right dedup family.
    *
    * Scale shape: the quadratic-looking work rides the TINY memoized
    * capped pair set — never corpus×corpus; both texts clamp to their
    * first 2000 chars (mirrored in the oracle) so the O(L²) DP per pair
    * is bounded ~4M cells regardless of document length. Output is a
    * 5-row histogram.
    */
  def neardupEditDist(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val txt = t.documents.select(col("doc_id"),
      substring(col("text"), 1, 2000).as("t2k"))
    // spread the STREAM-side text projection only: both joins are
    // broadcast builds (pairs, then the doc_b texts) streaming over the
    // 1-split documents scan, so the O(L²) levenshtein per pair otherwise
    // runs single-task (r19 census: 1.0 s serial solo). The doc_b side
    // stays unspread so its broadcast build pays no extra exchange.
    // Identity at production split counts (q190/q217 rule).
    minhashPairs(spark, dir)
      .join(Tables.spread(txt)
        .select(col("doc_id").as("doc_a"), col("t2k").as("ta")), Seq("doc_a"))
      .join(txt.select(col("doc_id").as("doc_b"), col("t2k").as("tb")), Seq("doc_b"))
      .select((expr("levenshtein(ta, tb)").cast("long") * 100L).as("raw"),
        greatest(greatest(length(col("ta")), length(col("tb"))), lit(1))
          .cast("long").as("mx"))
      .select(expr("raw div mx").as("pct"))
      .groupBy(
        when(col("pct") <= 5, "00-05").when(col("pct") <= 10, "06-10")
          .when(col("pct") <= 25, "11-25").when(col("pct") <= 50, "26-50")
          .otherwise("51+").as("edit_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private def neardupEditDistSql: String =
    s"""$minhashCtes,
       |txt AS (SELECT doc_id, substr(text, 1, 2000) AS t2k FROM documents),
       |pd AS (
       |  SELECT CAST(levenshtein(a.t2k, b.t2k) * 100 AS BIGINT)
       |      // greatest(greatest(length(a.t2k), length(b.t2k)), 1) AS pct
       |  FROM pairs p
       |  JOIN txt a ON a.doc_id = p.doc_a
       |  JOIN txt b ON b.doc_id = p.doc_b)
       |SELECT CASE WHEN pct <= 5 THEN '00-05' WHEN pct <= 10 THEN '06-10'
       |            WHEN pct <= 25 THEN '11-25' WHEN pct <= 50 THEN '26-50'
       |            ELSE '51+' END AS edit_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM pd GROUP BY 1""".stripMargin

  /** q208 — quality-band × near-dup calibration: for each of q183's four
    * exact logit bands, the share of documents that participate in at
    * least one MinHash near-dup pair. This is the "do low-quality docs
    * duplicate more" audit behind the curation ordering decision —
    * if dup rates skew into the drop bands, dedup-then-filter and
    * filter-then-dedup give materially different corpora (q150's
    * composition), and this table says which order pays.
    * Near-dup membership is pair-set membership (a doc is in a q76
    * component iff it appears in a q37 pair — same semantics, no
    * recursive closure needed in the oracle).
    *
    * Scale shape: scoring is the q122/q183 map-side literal-folded
    * logit; the dup-id set is two projections of the TINY memoized pair
    * set; one broadcast-ready left join + a 4-row band agg.
    */
  def qualityDupCalibration(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the per-token md5 logit map otherwise runs single-task on
    // the 1-split scan (r19 census: 1.6 s serial solo; q122/q190 rule)
    val scored = Tables.spread(t.documents).select(col("doc_id"),
      graft.ops.QualityScorer.logitMicro(col("text"),
        graft.ops.QualityScorer.md5Weights(256)).as("logit_u"))
      .withColumn("band",
        when(col("logit_u") < -500000L, lit("strong_drop"))
          .when(col("logit_u") < 0L, lit("drop"))
          .when(col("logit_u") < 500000L, lit("keep"))
          .otherwise(lit("strong_keep")))
    val pairs = minhashPairs(spark, dir)
    val dup = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("isdup", lit(1L))
    scored.join(broadcast(dup), Seq("doc_id"), "left")
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("isdup"), lit(0L))).as("n_dup_docs"))
      .withColumn("dup_ppm", expr("n_dup_docs * 1000000 div n_docs"))
  }

  private def qualityDupCalibrationSql: String =
    s"""$minhashCtes,
       |dup AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM pairs
       |    UNION ALL SELECT doc_b FROM pairs)),
       |toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
       |  FROM documents
       |), per AS (
       |  SELECT doc_id,
       |    SUM(('0x' || substr(md5('w:' ||
       |          (('0x' || substr(md5(tok), 1, 15))::BIGINT % 256)), 1, 15))::BIGINT
       |        % 1000001 - 500000) AS wsum
       |  FROM toks GROUP BY doc_id
       |), scored AS (
       |  SELECT d.doc_id,
       |    CASE WHEN per.wsum < -500000 THEN 'strong_drop'
       |         WHEN per.wsum < 0 THEN 'drop'
       |         WHEN per.wsum < 500000 THEN 'keep'
       |         ELSE 'strong_keep' END AS band
       |  FROM documents d JOIN per USING (doc_id))
       |SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_dup_docs,
       |  CAST(SUM(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
       |    // COUNT(*) AS BIGINT) AS dup_ppm
       |FROM scored LEFT JOIN dup ON dup.doc_id = scored.doc_id
       |GROUP BY band""".stripMargin

  /** q207 — SimHash Hamming-distance separation: the distance histogram
    * of the LSH CANDIDATE pairs (q37's band collisions) against a
    * deterministic hash-paired BASELINE of the same corpus (the q168
    * successor-pairing convention). This is the measurement that
    * justifies a SimHash cutoff: near-dup candidates should mass at low
    * Hamming distance while unrelated pairs center near 30 of 60 bits —
    * if the two histograms overlap, simhash carries no dedup signal on
    * this corpus and a bit-distance threshold is meaningless.
    *
    * Scale shape: signatures are the q39 build (token-level agg, never
    * doc×doc); the candidate side joins the TINY memoized pair set to
    * the signature table twice on doc keys; the baseline is linear
    * (64-bucket window, parallel lead); output is a ≤10-row histogram.
    * XOR + bit_count are identical integer ops on both engines.
    */
  def simhashDistance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sigs = simhashSigs(spark, dir)
    val sa = sigs.select(col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    val cand = minhashPairs(spark, dir)
      .join(sa, Seq("doc_a")).join(sb, Seq("doc_b"))
      .select(lit("candidate").as("pair_kind"),
        expr("bit_count(sig_a ^ sig_b)").as("d"))
    val v = sigs
      .withColumn("h", Dedup.hash60(col("doc_id").cast("string"), "shpair"))
      .withColumn("bucket", pmod(col("h"), lit(64L)))
    val w = Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id"))
    val base = v.withColumn("sig_b", lead(col("simhash"), 1).over(w))
      .filter(col("sig_b").isNotNull)
      .select(lit("baseline").as("pair_kind"),
        expr("bit_count(simhash ^ sig_b)").as("d"))
    cand.unionAll(base)
      .groupBy(col("pair_kind"),
        when(col("d") <= 4, "00-04").when(col("d") <= 8, "05-08")
          .when(col("d") <= 16, "09-16").when(col("d") <= 24, "17-24")
          .otherwise("25+").as("dist_bucket"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  private def simhashDistanceSql: String =
    s"""$minhashCtes,
       |sims AS (
       |$simhashSigsSql
       |),
       |cand AS (
       |  SELECT 'candidate' AS pair_kind,
       |    bit_count(xor(a.simhash, b.simhash)) AS d
       |  FROM pairs p
       |  JOIN sims a ON a.doc_id = p.doc_a
       |  JOIN sims b ON b.doc_id = p.doc_b),
       |hv AS (
       |  SELECT simhash,
       |    ('0x' || substr(md5('shpair:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
       |      AS h, doc_id
       |  FROM sims),
       |bl AS (
       |  SELECT 'baseline' AS pair_kind,
       |    bit_count(xor(simhash, lead(simhash) OVER w)) AS d
       |  FROM (SELECT *, h % 64 AS bucket FROM hv)
       |  WINDOW w AS (PARTITION BY bucket ORDER BY h, doc_id)),
       |alld AS (
       |  SELECT * FROM cand UNION ALL SELECT * FROM bl WHERE d IS NOT NULL)
       |SELECT pair_kind,
       |  CASE WHEN d <= 4 THEN '00-04' WHEN d <= 8 THEN '05-08'
       |       WHEN d <= 16 THEN '09-16' WHEN d <= 24 THEN '17-24'
       |       ELSE '25+' END AS dist_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs
       |FROM alld GROUP BY 1, 2""".stripMargin

  /** q203 — content-defined chunking (CDC) dedup: chunk boundaries are
    * placed where the rolling 4-word-window hash ≡ 0 (mod 16) — the
    * Rabin/FastCDC idea at word granularity — so an insertion or deletion
    * early in a document shifts chunk CONTENT for at most one chunk
    * instead of re-aligning every fixed-width window (the property
    * fixed-size chunking, q164, fundamentally lacks). Duplicate chunks
    * across the corpus are then exact-hash groups; reported per
    * chunk-size bucket: chunks, distinct chunks, max copies, dup ppm.
    *
    * Scale shape: boundary detection, chunk assembly, and chunk hashing
    * are ALL in-row HOFs over the word array — zero shuffles until the
    * (bucket, md5) hash agg, and only the 16-byte digest crosses the
    * wire, never chunk text (the raw-tokens-never-shuffle rule). The
    * two-level agg keeps the distinct count Expand-free (the q15
    * lesson). Expected chunk length is the 16-window modulus; both
    * engines rebuild identical boundaries from the portable 60-bit md5.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the per-window md5 boundary scan + chunk assembly HOFs are
    // the query's whole CPU cost and otherwise run as ONE task on the
    // 1-split gate-scale scan (identity at production split counts)
    val chunks = Tables.spread(t.documents)
      .select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .withColumn("cuts", expr(
        """CASE WHEN size(w) >= 5 THEN
          |  filter(transform(sequence(4, size(w) - 1), i ->
          |    IF(CAST(conv(substring(md5(concat('cdc:',
          |         concat_ws(' ', element_at(w, i-3), element_at(w, i-2),
          |                        element_at(w, i-1), element_at(w, i)))),
          |         1, 15), 16, 10) AS BIGINT) % 16 = 0, i, CAST(NULL AS INT))),
          |    x -> x IS NOT NULL)
          |ELSE CAST(array() AS array<int>) END""".stripMargin))
      .withColumn("bounds",
        expr("concat(array(0), cuts, array(size(w)))"))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(2, size(bounds)), j ->
          |  concat_ws(' ', slice(w, element_at(bounds, j-1) + 1,
          |    element_at(bounds, j) - element_at(bounds, j-1))))""".stripMargin))
        .as("txt"))
    val perHash = chunks
      .select(
        when(expr("size(split(txt, ' '))") <= 8, "01-08")
          .when(expr("size(split(txt, ' '))") <= 16, "09-16")
          .when(expr("size(split(txt, ' '))") <= 32, "17-32")
          .otherwise("33+").as("bucket"),
        md5(col("txt")).as("h"))
      .groupBy(col("bucket"), col("h")).agg(count(lit(1)).as("c"))
    perHash.groupBy(col("bucket")).agg(
        sum(col("c")).as("n_chunks"),
        count(lit(1)).as("n_distinct_chunks"),
        max(col("c")).as("max_copies"))
      .withColumn("dup_ppm",
        expr("(n_chunks - n_distinct_chunks) * 1000000 div n_chunks"))
  }

  private val cdcChunksSql = Oracles("dedup", "cdcChunks")

  /** q217 — WINNOWING fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
    * 2003 — the MOSS algorithm): hash every 3-word k-gram, slide a
    * 4-gram window over the hash sequence, and keep each window's
    * MINIMUM — the guarantee the simpler q33/q56 fingerprints lack: any
    * shared run of ≥ k+w−1 words between two documents shares ≥1
    * selected fingerprint, at an expected density of only 2/(w+1) of
    * the grams. Per source: eligible docs, gram count, selected
    * fingerprint count, selection density ppm, and the count/share of
    * fingerprints also seen in ≥2 documents (the local-plagiarism /
    * near-dup overlap signal).
    *
    * Determinism: gram hashes are the portable 60-bit md5
    * ([[graft.ops.Dedup.hash60]] formulation inline in SQL); window
    * minima, distinct-per-doc selection, and all ratios are exact
    * integer ops. Docs shorter than k+w−1 = 6 words cannot fill one
    * window and are excluded in BOTH engines.
    *
    * Scale shape: gram hashing AND window-min selection run per-row in
    * ONE `mapPartitions` pass (monotonic-deque sliding min, O(grams)
    * per doc) — raw grams never leave the row (the PLANS no-raw-shuffle
    * invariant); only the SELECTED fingerprints (≈2/(w+1) ≈ 40% of
    * grams as 64-bit ints) explode into the (fp → doc-frequency) hash
    * agg and the fp-keyed dup join — the q37 bucket shape. The oracle
    * mirrors selection with a per-doc ordered window at sf0.01 scale.
    *
    * Why `mapPartitions` and not a HOF chain (the one place the repo's
    * native-Column preference loses): with `kh` as a column,
    * `transform(…, j -> array_min(slice(kh, j, 4)))` gets kh INLINED
    * into the lambda by CollapseProject, and the full md5 gram array is
    * then re-evaluated for EVERY window — O(grams²) digests per doc,
    * measured 1260 s at sf0.1 vs ~17 s for this formulation.
    * Tokenization stays in Column land ([[Dedup.words]]) so the split
    * semantics are bit-identical to every other dedup query.
    */
  def winnowing(spark: SparkSession, dir: String): DataFrame = {
    val selected = winnowSelected(spark, dir)
    val perDoc = selected.select(col("doc_id"), col("source"), col("g"),
      size(col("sel")).cast("long").as("s"))
    val ex = selected.select(col("doc_id"), col("source"),
      explode(col("sel")).as("fp"))
    val dfreq = ex.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    val dup = ex.join(dfreq, Seq("fp"))
      .filter(col("df") >= 2L)
      .groupBy(col("source")).agg(count(lit(1)).as("dup_fp"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("g")).as("n_grams"),
        sum(col("s")).as("n_fps"))
      .join(dup, Seq("source"), "left")
      .na.fill(0L, Seq("dup_fp"))
      .select(col("source"), col("n_docs"), col("n_grams"), col("n_fps"),
        expr("n_fps * 1000000L div n_grams").as("density_ppm"),
        col("dup_fp"),
        expr("dup_fp * 1000000L div n_fps").as("dup_ppm"))
  }

  /** (doc_id, source, gram count, selected winnowing fingerprints) —
    * memoized because the selection pass feeds two consumers (per-doc
    * stats and the fingerprint explode) and repeated bench invocations;
    * same pattern as [[shingleDocs]].
    */
  private def winnowSelected(spark: SparkSession, dir: String): DataFrame =
    graft.core.Memo.cached(spark, s"q217-winnow:$dir") {
    val t = Tables(spark, dir)
    import spark.implicits._
    // spread: the per-doc MD5 gram hashing below is the query's whole
    // CPU cost and otherwise runs as ONE task on the 1-split gate-scale
    // scan (identity at production split counts — per-site rule, r19)
    val eligible = Tables.spread(t.documents)
      .select(col("doc_id"), col("source"), Dedup.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 6)
      .as[(Long, String, Seq[String])]
    eligible.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { case (id, src, ws) =>
        val g = ws.length - 2
        val kh = new Array[Long](g)
        var i = 0
        while (i < g) {
          md.reset()
          val d = md.digest(
            (ws(i) + " " + ws(i + 1) + " " + ws(i + 2)).getBytes("UTF-8"))
          // first 15 hex chars of the digest = bytes 0-6 plus the high
          // nibble of byte 7 — the exact hash60 / ('0x'||substr(md5,1,15))
          // bit window
          var v = 0L
          var b = 0
          while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
          kh(i) = (v << 4) | ((d(7) & 0xf0L) >> 4)
          i += 1
        }
        val out = new java.util.LinkedHashSet[Long]()
        val deque = new java.util.ArrayDeque[Int]()
        var j = 0
        while (j < g) {
          while (!deque.isEmpty && kh(deque.peekLast) >= kh(j))
            deque.pollLast()
          deque.addLast(j)
          if (deque.peekFirst <= j - 4) deque.pollFirst()
          if (j >= 3) out.add(kh(deque.peekFirst))
          j += 1
        }
        val sel = new Array[Long](out.size)
        val oit = out.iterator(); var k = 0
        while (oit.hasNext) { sel(k) = oit.next(); k += 1 }
        (id, src, g.toLong, sel)
      }
    }.toDF("doc_id", "source", "g", "sel")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  private val winnowingSql = Oracles("dedup", "winnowing")

  /** q219 — CONTAINMENT profile over the MinHash candidate pairs:
    * Jaccard (q38) is symmetric and misses SUBSET duplication — a short
    * document wholly quoted inside a long one scores low Jaccard but
    * containment |A∩B|/min(|A|,|B|) ≈ 1. The 2-D (containment band ×
    * Jaccard band) histogram separates copy-edits (both high) from
    * quote/subset dups (containment high, Jaccard low — the
    * `n_subset_dups` column), which picks between whole-doc dedup and
    * span-level dedup (q89/q123) as the remediation.
    *
    * Determinism: shingle sets are exact distinct arrays, intersection
    * sizes are integers, both ratios are integer-ppm floor divisions of
    * non-negative counts (`div` ≡ `//`) — no float anywhere.
    *
    * Scale shape: rides the memoized capped candidate-pair set and the
    * memoized shingle table (never corpus×corpus); per-pair work is one
    * in-row `array_intersect` of two distinct-shingle arrays; output is
    * a ≤25-cell histogram.
    */
  def containmentProfile(spark: SparkSession, dir: String): DataFrame = {
    val d = shingleDocs(spark, dir)
    minhashPairs(spark, dir)
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sa")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sb")), Seq("doc_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("na", size(col("sa")).cast("long"))
      .withColumn("nb", size(col("sb")).cast("long"))
      .withColumn("cont_ppm", expr("inter * 1000000L div least(na, nb)"))
      .withColumn("jac_ppm", expr("inter * 1000000L div (na + nb - inter)"))
      .withColumn("cont_band", expr("cont_ppm div 250000"))
      .withColumn("jac_band", expr("jac_ppm div 250000"))
      .groupBy(col("cont_band"), col("jac_band"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cont_ppm") >= 900000L && col("jac_ppm") < 500000L, 1L)
          .otherwise(0L)).as("n_subset_dups"))
  }

  private val containmentProfileSql = Oracles("dedup", "containmentProfile",
    "minhashCtes" -> String.valueOf(minhashCtes))

  /** q221 — SOFT dedup via loss weighting: instead of dropping near-dup
    * documents (q136's survivor selection), keep every document but
    * weight it 1/|cluster| — total loss mass per duplicated content
    * stays constant (the "count-based down-weighting" alternative that
    * preserves coverage when near-dups carry complementary context).
    * Per source: docs, docs inside near-dup clusters, the EFFECTIVE
    * dataset size Σ 10⁶/|cluster| (ppm-docs), and the effective ratio —
    * the number that replaces "docs removed" in the soft regime.
    *
    * Determinism: cluster ids/sizes ride the q76 fixed-point closure
    * (independently oracle-checked vs a RECURSIVE CTE); weights are
    * integer-ppm floor divisions.
    *
    * Scale shape: rides the memoized component table (one size agg +
    * one component-keyed join, both cluster-table-sized), then one
    * doc-keyed hash join against the corpus projection and a source
    * agg. Nothing quadratic, nothing data-sized after the join.
    */
  def softDedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val comp = neardupComponents(spark, dir)
    val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("csize"))
    val withSize = comp.join(sizes, Seq("component"))
      .select(col("id").as("doc_id"), col("csize"))
    t.documents.select(col("doc_id"), col("source"))
      .join(withSize, Seq("doc_id"), "left")
      .na.fill(1L, Seq("csize"))
      .withColumn("w_ppm", expr("1000000L div csize"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1L, 1L).otherwise(0L)).as("n_in_clusters"),
        sum(col("w_ppm")).as("eff_docs_ppm"))
      .withColumn("eff_ratio_ppm", expr("eff_docs_ppm div n_docs"))
  }

  private val softDedupWeightsSql = Oracles("dedup", "softDedupWeights",
    "minhashCtes" -> String.valueOf(minhashCtes))

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q217_winnowing", winnowing, Some(winnowingSql)),
    QueryDef("q221_soft_dedup_weights", softDedupWeights, Some(softDedupWeightsSql)),
    QueryDef("q219_containment", containmentProfile, Some(containmentProfileSql)),
    QueryDef("q207_simhash_distance", simhashDistance, Some(simhashDistanceSql)),
    QueryDef("q208_quality_dup_calibration", qualityDupCalibration,
      Some(qualityDupCalibrationSql)),
    QueryDef("q211_neardup_editdist", neardupEditDist, Some(neardupEditDistSql)),
    QueryDef("q203_cdc_chunks", cdcChunks, Some(cdcChunksSql)),
    QueryDef("q202_bloom_decontam", bloomDecontam, Some(bloomDecontamSql)),
    QueryDef("q182_hash_collision_audit", hashCollisionAudit, Some(hashCollisionAuditSql)),
    QueryDef("q178_cluster_source_purity", clusterSourcePurity, Some(clusterSourcePuritySql)),
    QueryDef("q173_split_leakage", splitLeakage, Some(splitLeakageSql)),
    QueryDef("q167_ngram_novelty", ngramNovelty, Some(ngramNoveltySql)),
    QueryDef("q170_lsh_calibration", lshCalibration, Some(lshCalibrationSql)),
    QueryDef("q166_cross_source_dups", crossSourceDups, Some(crossSourceDupsSql)),
    QueryDef("q156_cluster_sizes", clusterSizes, Some(clusterSizesSql)),
    QueryDef("q150_curate_v2", curateV2, Some(curateV2Sql)),
    QueryDef("q100_curate_pack", curateAndPack, Some(curateAndPackSql)),
    QueryDef("q83_decontamination", decontamination, Some(decontaminationSql)),
    QueryDef("q52_fuzzy_part_names", fuzzyPartNames, Some(fuzzyPartNamesSql)),
    QueryDef("q36_dedup_exact", dedupExact, Some(dedupExactSql)),
    QueryDef("q37_minhash_pairs", minhashPairs, Some(minhashPairsSql)),
    QueryDef("q38_ngram_jaccard", ngramJaccardPairs, Some(ngramJaccardPairsSql)),
    QueryDef("q39_simhash", simhashSigs, Some(simhashSigsSql)),
    QueryDef("q76_neardup_components", neardupComponents, Some(neardupComponentsSql)),
    QueryDef("q120_incremental_dedup", incrementalDedup, Some(minhashPairsSql)),
    QueryDef("q136_quality_survivor", qualitySurvivor, Some(qualitySurvivorSql)),
    QueryDef("q188_dedup_impact", dedupImpact, Some(dedupImpactSql)),
  )
}
