package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** End-to-end corpus curation for training-data pipelines: quality gating →
  * exact dedup → MinHash/Jaccard near-dup removal → transitive
  * connected-component clustering with one canonical survivor per cluster.
  *
  * NOTE: `curate` is EAGER (the component step is an iterative driver
  * loop), and the gate→exact-dedup prefix is localCheckpointed so the
  * final anti-join reads the materialized blocks instead of recomputing
  * the subtree — see [[Dedup.connectedComponents]] for the cluster caveat.
  *
  * Deterministic keep policy: for any duplicate group/pair, the LOWEST id
  * survives — reproducible under any partitioning, and idempotent (running
  * curate twice changes nothing).
  *
  * Scale shape: two hash-aggregate shuffles (stats+exact-dedup, signatures),
  * one band-bucket join for candidates, one Jaccard verify over candidates
  * only, two left_anti joins to apply the drop sets. Nothing is quadratic in
  * the corpus; everything is keyed.
  */
object Corpus {

  final case class CurationConfig(
      idCol: String = "doc_id",
      textCol: String = "text",
      langCol: String = "lang",
      keepLangs: Set[String] = Set.empty, // empty = all
      minTokens: Int = 5,
      maxTokens: Int = 100000,
      maxStopwordRatio: Double = 0.9,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.8)

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")
    .map(s => s"'$s'").mkString(", ")

  /** Returns the curated corpus (original columns + quality stats). */
  def curate(docs: DataFrame, cfg: CurationConfig = CurationConfig()): DataFrame = {
    val id = col(cfg.idCol)

    // 1. quality gate — single projection + filter (null/empty text never
    // survives: at corpus scale null payloads are a certainty)
    val withStats = docs
      .filter(col(cfg.textCol).isNotNull && length(trim(col(cfg.textCol))) > 0)
      .withColumn("__toks", Dedup.words(col(cfg.textCol)))
      .withColumn("n_tokens", size(col("__toks")))
      .withColumn("stopword_ratio",
        expr(s"size(filter(__toks, x -> x IN ($stopEn)))").cast("double") /
          col("n_tokens"))
    val gated = withStats
      .filter(col("n_tokens") >= cfg.minTokens && col("n_tokens") <= cfg.maxTokens)
      .filter(col("stopword_ratio") <= cfg.maxStopwordRatio)
      .filter(if (cfg.keepLangs.isEmpty) lit(true)
        else col(cfg.langCol).isin(cfg.keepLangs.toSeq: _*))

    // 2. exact dedup — keep lowest id per content hash. Checkpointed: the
    // connected-components step below is EAGER (driver loop), and without
    // truncation the final anti-join would recompute the whole
    // gate→dedup subtree from the raw input a second time.
    val exactKeep = gated
      .groupBy(md5(col(cfg.textCol)).as("__h"))
      .agg(min(id).as(cfg.idCol))
      .drop("__h")
    val exactDeduped = gated.join(exactKeep, Seq(cfg.idCol), "left_semi")
      .localCheckpoint(true)

    // 3. near-dup removal — MinHash bands → candidate pairs → Jaccard verify
    val withWords = exactDeduped
      .select(id, array_distinct(col("__toks")).as("__wd"), col("__toks"))
      .filter(size(col("__toks")) >= 3)
    val shingled = withWords.select(id,
      explode(Dedup.wordShingles("__toks", 3)).as("__shingle"))
    val sigs = Dedup.minhashSignatures(shingled, cfg.idCol, "__shingle", cfg.numHashes)
    val bands = Dedup.lshBands(sigs, cfg.idCol, cfg.numHashes, cfg.rowsPerBand)
    val candidates = Dedup.candidatePairs(bands, cfg.idCol)
    val confirmed = candidates
      .join(withWords.select(id.as("doc_a"), col("__wd").as("__wa")), Seq("doc_a"))
      .join(withWords.select(id.as("doc_b"), col("__wd").as("__wb")), Seq("doc_b"))
      .filter(Dedup.jaccard(col("__wa"), col("__wb")) >= cfg.jaccardThreshold)
    // TRANSITIVE keep policy: connected components over the confirmed pair
    // graph; only each component's min id survives. Dropping pairwise
    // doc_b's alone can keep TWO survivors from one transitive cluster
    // (e.g. pairs (3,5),(2,5) leave both 2 and 3), which violates the
    // one-canonical-doc-per-cluster contract.
    val comps = Dedup.connectedComponents(confirmed, "doc_a", "doc_b")
    val drops = comps.filter(col("id") =!= col("component"))
      .select(col("id").as(cfg.idCol))

    exactDeduped.join(drops, Seq(cfg.idCol), "left_anti").drop("__toks")
  }
}
