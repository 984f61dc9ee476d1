package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Text transforms + analysis (SURVEY.md §2.8–§2.9 U1–U6 and the
  * training-data-pipeline text operators: quality scoring, token counting,
  * language-ID heuristics, fingerprinting).
  *
  * The reference implements U1–U5 as Python UDFs (serialization break per
  * row, `go-transform-elt.py:105-157`); here every transform is a native
  * Column expression — whole-stage-codegen'd, no UDFs anywhere. Regex
  * patterns are restricted to the dialect shared by Java regex (Spark) and
  * RE2 (DuckDB oracle): `\\s \\S \\b`, character classes, alternation,
  * `(?i)`.
  */
object TextQ {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is")

  private def sqlList(xs: Seq[String]): String = xs.map(x => s"'$x'").mkString(", ")

  /** U1/U4 analog — text cleaning chain: strip URLs (`http\S+`, the
    * reference's INTENDED pattern — its raw-string double-backslash makes it
    * a no-op, SURVEY.md §2.9 U1 quirk), strip backticks, drop the word "the"
    * (intended `\bthe\b`, U4 quirk), collapse whitespace, trim, truncate to
    * 30 chars (`go-transform-elt.py:105-157`).
    */
  def cleanText(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cleaned =
      substring(
        trim(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(col("text")), "http\\S+", ""),
                "`", ""),
              "\\bthe\\b", ""),
            "\\s+", " ")),
        1, 30)
    t.documents.select(col("doc_id"), cleaned.as("clean_text"))
  }

  private val cleanTextSql = Oracles("text", "cleanText")

  /** U2/U3 analog — first-match regex classification as a folded
    * when-chain (the YAML→when-chain plan of SURVEY.md §2.9: stays in
    * codegen instead of a 28-branch Python UDF,
    * `go-transform-elt.py:115-136`).
    */
  private val categoryRules: Seq[(String, String)] = Seq(
    "(?i)widget" -> "widgets",
    "(?i)gizmo|gadget" -> "gadgets",
    "(?i)bolt|nut|screw" -> "hardware",
    "(?i)ring|band" -> "jewelry",
    "(?i)gear|cog" -> "mechanical")

  def classifyCategory(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // native first-match rule loop (graft.functions.FirstMatchLabel): same
    // rlike/find semantics and first-match order as a when-chain, one
    // input conversion per row instead of one per branch
    val chain = coalesce(
      graft.functions.GraftFunctions.first_match_label(col("p_name"), categoryRules),
      lower(col("p_type")))
    t.part.select(col("p_partkey"), col("p_name"), chain.as("category"))
  }

  private val classifyCategorySql = {
    val cases = categoryRules.map { case (rx, label) =>
      s"WHEN regexp_matches(p_name, '$rx') THEN '$label'"
    }.mkString("\n    ")
    s"""SELECT p_partkey, p_name,
       |  CASE
       |    $cases
       |    ELSE lower(p_type) END AS category
       |FROM part""".stripMargin
  }

  /** U6 analog — size-token extraction with an assembled alternation regex,
    * then removal from the base name (`go-transform-elt.py:86-98,212-218`).
    */
  def sizeExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rx = "(?i)(small|large|big|mini|red|blue|hot)"
    t.part.select(
      col("p_partkey"),
      regexp_extract(col("p_name"), rx, 0).as("size_token"),
      trim(regexp_replace(regexp_replace(col("p_name"), rx, ""), "\\s+", " ")).as("base_name"))
  }

  private val sizeExtractSql = Oracles("text", "sizeExtract")

  /** P2 analog applied to a full table — string-value normalization
    * (`go-quality-elt.py:96-103`) via [[graft.ops.SchemaOps]].
    */
  def stringNormalize(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SchemaOps.normalizeStringValues(Tables(spark, dir).part)

  private val stringNormalizeSql = Oracles("text", "stringNormalize")

  /** Token statistics — token count (whitespace tokenization), average token
    * length, punctuation count, stopword ratio. The text-quality scoring
    * block of the training-data pipeline surface.
    */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // stopword predicate bound ONCE so count and ratio cannot drift apart
    val stopwordCount =
      expr(s"size(filter(toks, x -> lower(x) IN (${sqlList(stopEn)})))")
    t.documents
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("n_tokens", size(col("toks")))
      .select(
        col("doc_id"),
        col("n_tokens"),
        length(col("text")).as("n_chars_measured"),
        (length(regexp_replace(col("text"), "\\s+", "")).cast("double") / col("n_tokens"))
          .as("avg_token_len"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .as("punct_count"),
        stopwordCount.as("stopword_count"),
        (stopwordCount.cast("double") / col("n_tokens")).as("stopword_ratio"))
  }

  private val tokenStatsSql = Oracles("text", "tokenStats",
    "e1" -> String.valueOf(sqlList(stopEn)))

  /** Language-ID heuristic — per-language stopword hit counts, argmax via a
    * deterministic when-chain (n-gram/stopword heuristic from the
    * training-data pipeline surface; no model, fully reproducible).
    */
  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of"),
    "es" -> Seq("el", "la", "de", "los"),
    "fr" -> Seq("le", "les", "des", "une"),
    "de" -> Seq("der", "die", "das", "und"))

  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // NO spread here (A/B-rejected, r19): the census showed a 1.4–1.7 s
    // single-task classification stage SOLO, but that is cold-JIT
    // inflation, not row work — warm in-suite the stage is small, and a
    // spread variant measured neutral-to-worse twice (q191 +0.08/+0.54,
    // q205 +0.02/−0.12, q32 ±0.05 vs the calm pre-change pass; warm
    // medians identical). The tokenize+4×IN-filter map is too cheap per
    // row to buy back the round-robin exchange of the text column —
    // unlike the md5-weight logit sites (q122/q190/q208/...), which keep
    // their spreads.
    val base = t.documents.withColumn("toks", split(lower(trim(col("text"))), "\\s+"))
    val withCounts = langStops.foldLeft(base) { case (df, (lang, stops)) =>
      df.withColumn(s"hits_$lang",
        expr(s"size(filter(toks, x -> x IN (${sqlList(stops)})))"))
    }
    val Seq(en, es, fr, de) = langStops.map { case (l, _) => col(s"hits_$l") }
    withCounts.select(
      col("doc_id"), col("lang").as("labeled_lang"),
      en.as("hits_en"), es.as("hits_es"), fr.as("hits_fr"), de.as("hits_de"),
      when(en >= es && en >= fr && en >= de && en > 0, "en")
        .when(es >= fr && es >= de && es > 0, "es")
        .when(fr >= de && fr > 0, "fr")
        .when(de > 0, "de")
        .otherwise("unk").as("guessed_lang"))
  }

  private val langIdSql = {
    val hitExpr = langStops.map { case (l, stops) =>
      s"CAST(len(list_filter(toks, x -> x IN (${sqlList(stops)}))) AS INT) AS hits_$l"
    }.mkString(",\n    ")
    s"""WITH base AS (
       |  SELECT doc_id, lang,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       |  FROM documents
       |), counts AS (
       |  SELECT doc_id, lang,
       |    $hitExpr
       |  FROM base
       |)
       |SELECT doc_id, lang AS labeled_lang, hits_en, hits_es, hits_fr, hits_de,
       |  CASE WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
       |       WHEN hits_es >= hits_fr AND hits_es >= hits_de AND hits_es > 0 THEN 'es'
       |       WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
       |       WHEN hits_de > 0 THEN 'de'
       |       ELSE 'unk' END AS guessed_lang
       |FROM counts""".stripMargin
  }

  /** Document fingerprint — md5 of whitespace-normalized lowercase text (the
    * deterministic rolling-hash fingerprint of the training-data surface;
    * doubles as the exact-dedup key).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
  }

  private val fingerprintSql = Oracles("text", "fingerprint")

  /** JSON extraction — typed field pull from the event `props` JSON column
    * (scalar-function family; the engine's path expression surface).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // NO spread (A/B-rejected twice, r19): the per-row get_json_object
    // parse IS serial on the 1-split events scan, but the partial agg
    // collapses the scan output map-side — pre-exchanging the full props
    // column costs more than the parallel parse saves (warm medians
    // 0.41 → 0.60/0.53 s spread; the q14/q15 partial-agg-collapse class,
    // unlike the doc-grain-output md5-logit sites of ch.24).
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"))
  }

  private val jsonExtractSql = Oracles("text", "jsonExtract")

  /** Multimodal metadata — treat text payloads as opaque bytes: byte length +
    * content hash. The Spark-side plumbing (binary columns with typed
    * metadata) that the multimodal decode operators in
    * [[graft.ops.Multimodal]] build on.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents.select(
      col("doc_id"),
      octet_length(col("text")).as("byte_len"),
      sha2(col("text"), 256).as("content_sha256"))
  }

  private val multimodalMetaSql = Oracles("text", "multimodalMeta")

  /** BPE-style regex tokenization (the GPT-2 pre-tokenizer shape:
    * contractions, letter runs, digit runs, punctuation runs, space
    * prefixes) — the token-counting surface of the training-data pipeline.
    * Pattern restricted to the Java-regex ∩ RE2 dialect (`\p{L}`, `\p{N}`).
    */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    t.documents
      .withColumn("bpe_toks", regexp_extract_all(col("text"), lit(pat), lit(0)))
      .select(
        col("doc_id"),
        size(col("bpe_toks")).as("n_bpe_tokens"),
        expr("size(filter(bpe_toks, x -> x rlike '^ ?\\\\p{N}+$'))").as("n_number_tokens"),
        (length(col("text")).cast("double") / size(col("bpe_toks"))).as("chars_per_token"))
  }

  private val bpeTokensSql = Oracles("text", "bpeTokens")

  /** Polynomial rolling hash over code points (base 31 mod 1e9+7) — the
    * deterministic document fingerprint, computed by the native
    * [[graft.functions.RollingHash]] codegen expression (single pass; the
    * SQL-composable `sequence`+`aggregate` fold is quadratic in document
    * length because each `substring` re-seeks). Seeded with the first code
    * point to mirror DuckDB's `list_reduce` semantics so the oracle is
    * exact.
    */
  def rollingHash(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"),
        graft.functions.GraftFunctions.rolling_hash(col("text")).as("rolling_hash"))
  }

  private val rollingHashSql = Oracles("text", "rollingHash")

  /** Generator surface — explode words, global frequency top-20 via
    * TakeOrderedAndProject (count desc, word tiebreak).
    */
  def wordFrequencies(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)
  }

  private val wordFrequenciesSql = Oracles("text", "wordFrequencies")

  /** q81 — PII redaction (email / phone / IPv4 → placeholder tokens), the
    * scrubbing pass a training corpus gets before packing. The synthetic
    * corpus carries no natural PII, so the feed INJECTS deterministic PII
    * derived from doc_id into a subset of documents (the PipelineQ feed
    * pattern: both engines construct identical text, so redaction counts
    * and the redacted text itself are exactly assertable). Patterns are
    * RE2-safe (no lookarounds — run identically on Java regex and RE2);
    * emails are redacted FIRST so the phone pattern can't match digit runs
    * inside addresses; placeholders carry no digits, so passes compose.
    * Entirely map-side — one scan, zero exchanges.
    */
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+?\\d{1,2}-\\d{3}-\\d{4}"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val seeded = t.documents.select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit(" call +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(lit(" from 10."), pmod(col("doc_id"), lit(200)),
            lit(".0."), pmod(col("doc_id"), lit(250))))
          .otherwise(lit(""))).as("text"))
    seeded.select(
      col("doc_id"),
      regexp_count(col("text"), lit(emailRe)).as("n_emails"),
      regexp_count(col("text"), lit(phoneRe)).as("n_phones"),
      regexp_count(col("text"), lit(ipRe)).as("n_ips"),
      regexp_replace(regexp_replace(regexp_replace(col("text"),
        emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>").as("redacted"))
  }

  private val piiRedactSql = Oracles("text", "piiRedact")

  /** q82 — intra-document repetition ratio (share of duplicate word
    * trigrams), the Gopher-style quality signal that catches boilerplate
    * and degenerate repetition. Trigram construction is 1-based
    * `element_at` on BOTH engines; the ratio is a rounded double (QueryDef
    * determinism rules). Map-side work over one scan; the only exchange
    * is the gate-scale round-robin spread below (identity at production
    * split counts).
    */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the trigram transform + array_distinct per doc is the whole
    // cost and otherwise runs single-task on the 1-split scan (r19
    // census: 0.8 s serial solo); identity at production split counts
    Tables.spread(t.documents)
      .withColumn("toks", split(trim(col("text")), "\\s+"))
      .withColumn("tris", expr(
        """CASE WHEN size(toks) >= 3 THEN
          |  transform(sequence(1, size(toks) - 2), i ->
          |    concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
          |      element_at(toks, i + 2)))
          |ELSE array() END""".stripMargin))
      .select(
        col("doc_id"),
        size(col("tris")).as("n_trigrams"),
        size(array_distinct(col("tris"))).as("n_distinct"),
        when(size(col("tris")) > 0,
          round(lit(1.0) - size(array_distinct(col("tris")))
            .cast("double") / size(col("tris")), 6))
          .otherwise(lit(0.0)).as("rep_ratio"))
  }

  private val repetitionRatioSql = Oracles("text", "repetitionRatio")

  /** q122 — linear text-quality classifier gate
    * ([[graft.ops.QualityScorer]]): hashed bag-of-words features into 256
    * buckets, md5-derived micro-unit integer weights folded into the plan
    * as a literal array, exact BIGINT logit per document, keep = logit > 0.
    * Map-only scoring (no data-keyed shuffle; the gate-scale round-robin
    * spread below is the lone exchange, identity at production splits);
    * the oracle re-derives the identical hashed
    * buckets, weights and integer sum in SQL, so scores are bit-equal.
    * This is the model-scoring step between the heuristic text filters
    * (q31/q32) and corpus curation (q100) in a real training-data
    * pipeline; a production model swaps in its own quantized weights.
    */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val dim = 256
    // spread: per-token md5 logit is the whole cost and otherwise runs
    // single-task on the 1-split scan (q190's A/B'd rule; identity at
    // production split counts)
    Tables.spread(t.documents).select(
      col("doc_id"),
      size(graft.ops.Dedup.words(col("text"))).as("n_tokens"),
      graft.ops.QualityScorer.logitMicro(col("text"),
        graft.ops.QualityScorer.md5Weights(dim)).as("logit_u"))
      .withColumn("keep", col("logit_u") > 0L)
  }

  private val qualityClassifierSql = Oracles("text", "qualityClassifier")

  /** q153 — quality-filter FUNNEL with per-rule attrition: the accounting
    * view every training-data pipeline publishes next to its filters
    * ("raw 4.1B docs → length 3.8B → lang 2.9B → …"). Rules run in a
    * fixed order and a document is charged to the FIRST rule it fails
    * (the way chained filters actually drop it), so per-stage drops sum
    * to total attrition — double-counting-free, unlike the per-rule-flag
    * view q04 gives. Rules are integer-exact (char counts, token counts,
    * cross-multiplied ratio compares — no float thresholds to drift).
    *
    * Scale shape: ONE map pass classifies every document (the when-chain
    * is a single projection over the scan), ONE 1-row aggregate holding
    * all four drop counts plus the total, and the cumulative in/out
    * arithmetic is a map-side `stack` over that row — one scan, one
    * all-to-one agg, no cache, no window.
    */
  def filterFunnel(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = split(lower(trim(col("text"))), "\\s+")
    val d = t.documents.select(
      col("n_chars"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"))
    val classified = d.select(
      when(col("n_chars") < 100, 1)
        .when(col("n_tokens") < 15, 2)
        .when(col("n_chars") > col("n_tokens") * 12, 3)      // avg word len > 12
        .when(col("n_distinct") * 10 < col("n_tokens") * 3, 4) // diversity < 0.3
        .otherwise(0).as("first_fail"))
    def dropped(i: Int) =
      sum(when(col("first_fail") === i, 1L).otherwise(0L)).as(s"d$i")
    classified
      .agg(count(lit(1)).as("n_total"), dropped(1), dropped(2), dropped(3), dropped(4))
      .select(expr(
        """stack(4,
          |  1, 'too_short',      n_total,            d1,
          |  2, 'too_few_tokens', n_total-d1,         d2,
          |  3, 'long_words',     n_total-d1-d2,      d3,
          |  4, 'low_diversity',  n_total-d1-d2-d3,   d4
          |) as (stage, rule, n_in, n_dropped)""".stripMargin))
      .select(col("stage"), col("rule"), col("n_in"), col("n_dropped"),
        (col("n_in") - col("n_dropped")).as("n_out"))
  }

  private val filterFunnelSql = Oracles("text", "filterFunnel")

  /** q160 — quality-threshold SWEEP: the retention curve a curation team
    * reads before pinning a min-length cutoff — for each candidate
    * min-token-count threshold, how many documents and how many tokens
    * survive. The q153 funnel answers "what does the CHOSEN rule chain
    * drop"; this answers "what WOULD each cutoff drop" (the
    * hyperparameter sweep that precedes it).
    *
    * Scale shape: one map pass computes each document's token count,
    * then a 5-literal `explode` fans every doc into the 5 candidate
    * groups MAP-SIDE (the q158 convention — never a join), and ONE
    * 5-group hash aggregate carries kept/total docs and tokens, so the
    * retention ppm needs no separate totals pass: every group sees the
    * whole corpus by construction. Rates are exact integer ppm.
    */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val d = t.documents.select(
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_tokens"))
    d.select(explode(expr("array(20, 40, 60, 80, 100)")).as("min_tokens"),
        col("n_tokens"))
      .groupBy(col("min_tokens"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= col("min_tokens"), 1L).otherwise(0L))
          .as("docs_kept"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("n_tokens") >= col("min_tokens"), col("n_tokens"))
          .otherwise(0L)).as("tokens_kept"))
      .select(col("min_tokens"), col("docs_kept"),
        expr("docs_kept * 1000000L div n_docs").as("docs_ppm"),
        col("tokens_kept"),
        expr("tokens_kept * 1000000L div tokens_total").as("tokens_ppm"))
  }

  private val thresholdSweepSql = Oracles("text", "thresholdSweep")

  /** q161 — tokenizer FERTILITY by language: BPE-ish tokens per
    * whitespace word and characters per token, per language — the
    * standard multilingual-tokenizer audit (a tokenizer trained on
    * English "explodes" other scripts into more tokens per word; the
    * fertility ratio is the number that quantifies it, and it directly
    * prices each language's share of a fixed token budget).
    *
    * Scale shape: ONE map pass tokenizes each document twice (whitespace
    * words + the q55 GPT-2-style pre-tokenizer regex — both inside one
    * projection, raw tokens never leave the map side), then one
    * language-keyed hash aggregate (5 groups). Ratios are exact integer
    * ppm off BIGINT sums.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
    t.documents
      .select(col("lang"), col("n_chars"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_words"),
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
          .as("n_bpe"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe")).as("n_bpe_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe_tokens"),
        expr("n_bpe_tokens * 1000000L div n_words").as("fertility_ppm"),
        expr("n_chars * 1000000L div n_bpe_tokens").as("chars_per_token_ppm"))
  }

  private val tokenFertilitySql = Oracles("text", "tokenFertility")

  /** q169 — CURRICULUM phase assignment: order the corpus by a
    * lexical-diversity score (distinct-token ratio, exact ppm) and cut
    * it into 4 equal-count phases with `ntile` — the
    * easy-to-hard schedule a curriculum-training run feeds from (phase 1
    * = most repetitive/simplest text first). Output is the per-phase
    * summary (docs, tokens, score range) that validates the cut points.
    *
    * Determinism: the score is integer ppm and the ntile ordering
    * carries a doc_id tie-break, so phase boundaries are exact on both
    * engines (ntile's unequal-remainder rule — earlier tiles get the
    * extra rows — is the same in Spark and DuckDB).
    *
    * Scale note: a single global ntile is a total sort into one window
    * partition — fine at the gate, but the 100-TB path computes the 3
    * phase-boundary scores once (approx_percentile, the q130 bounds
    * pattern) and assigns phases map-side by comparison; the output
    * contract is unchanged. Documented trade, same as q130.
    */
  def curriculumPhases(spark: SparkSession, dir: String): DataFrame = {
    // Window form KEPT after a measured round-15 A/B (VERDICT r14 item 4,
    // BASELINE round 15): the unpartitioned ntile(4) sorts the corpus in
    // ONE task — the worst ceiling shape in the registry — but the sorted
    // rows are 3 small columns and the q248-pattern rewrite (two-phase
    // rank + the closed ntile form: b = n div 4, r = n mod 4, first r
    // tiles take b+1 rows) measured 2.0–2.7× SLOWER at sf0.1/10×/100×.
    // At a true 100-TB corpus the swap is mechanical and REQUIRED; the
    // closed form was gate-validated against the unchanged oracle before
    // reverting (BASELINE round 15 records the A/B).
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val toks = split(lower(trim(col("text"))), "\\s+")
    t.documents
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("score_ppm", expr("n_distinct * 1000000L div n_tokens"))
      .withColumn("phase",
        ntile(4).over(Window.orderBy(col("score_ppm"), col("doc_id"))))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("score_ppm")).as("min_score_ppm"),
        max(col("score_ppm")).as("max_score_ppm"))
  }

  private val curriculumPhasesSql = Oracles("text", "curriculumPhases")

  /** q250 — q169's SCALE sibling (the q248 pattern): the same
    * curriculum-phase aggregates through the two-phase distributed
    * ranking instead of the UNPARTITIONED ntile window (ONE task — the
    * worst ceiling shape in the registry). The order (score_ppm, doc_id)
    * is strict, so ntile(k) has an exact closed form over the global
    * row_number: with b = n div k and r = n mod k the first r tiles take
    * b+1 rows —
    *   phase(rn) = (rn-1) div (b+1) + 1          if rn <= r·(b+1)
    *             = r + (rn-1-r·(b+1)) div b + 1   otherwise
    * (n < k degenerates to phase = rn, matching both engines; integral
    * `div`, never `/` — Spark's / is IEEE division even on LONGs and a
    * rounded quotient cast can land one off). Oracle is q169's VERBATIM.
    * Slower at gate scale (A/B, BASELINE round 15); at 100 TB the
    * single-task window is a wall and this is the production form.
    */
  def curriculumPhasesDistributed(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = split(lower(trim(col("text"))), "\\s+")
    val scored = t.documents
      .select(col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"))
      .withColumn("score_ppm", expr("n_distinct * 1000000L div n_tokens"))
    val ranked = graft.ops.Ranking.rowNumber(scored,
      Seq(lit(1)), Seq(col("score_ppm"), col("doc_id")), "rn", 32)
    val n = scored.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("__b", expr("__n div 4"))
      .withColumn("__r", col("__n") % lit(4L))
      .withColumn("phase",
        when(col("rn") <= col("__r") * (col("__b") + 1),
          expr("(rn - 1) div (__b + 1) + 1").cast("int"))
          .otherwise(
            // __b = 0 only when n < 4, and then the when-branch covers every
            // rn — but don't lean on If short-circuiting (or on non-ANSI
            // div-by-zero → NULL): greatest(__b, 1) makes the expression
            // total regardless of evaluation order and ANSI mode
            expr("__r + (rn - 1 - __r * (__b + 1)) div greatest(__b, 1L) + 1")
              .cast("int")))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        min(col("score_ppm")).as("min_score_ppm"),
        max(col("score_ppm")).as("max_score_ppm"))
  }

  /** q180 — BOILERPLATE PREFIX families: documents sharing an identical
    * leading 4-word prefix (the q123 segment width), grouped into
    * families — the cheap template/boilerplate detector (scraped pages
    * sharing a header, generated docs sharing a preamble) that catches
    * repetition too LOCAL for whole-document dedup: two docs can share a
    * template prefix at near-zero global Jaccard. Families report their
    * size, how many sources they span, and their lowest doc_id as the
    * canonical example.
    *
    * Scale shape: map-side prefix projection (raw text never shuffles —
    * only the ≤4-word prefix), ONE prefix-keyed hash agg with map-side
    * combine, HAVING on the aggregate. Family count is bounded by
    * distinct prefixes, not documents.
    */
  def boilerplatePrefixes(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val toks = split(lower(trim(col("text"))), "\\s+")
    t.documents
      .select(col("doc_id"), col("source"),
        array_join(slice(toks, 1, 4), " ").as("prefix"))
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("example_doc_id"))
      .filter(col("n_docs") >= 2)
  }

  private val boilerplatePrefixesSql = Oracles("text", "boilerplatePrefixes")

  /** q183 — SOURCE × QUALITY-BAND matrix: q122's exact integer logit
    * bucketed into four bands and cross-tabbed by source — the "which
    * subsets are junk" readout that decides per-source filtering
    * thresholds (a source whose mass sits in `strong_drop` gets cut
    * wholesale; one straddling the boundary gets a tuned threshold).
    * Band edges are exact MICRO-unit integers on the q122 logit, so the
    * matrix is bit-stable across engines.
    *
    * Scale shape: the logit is q122's map-only expression (model
    * gating at scan cost); one (source, band) hash agg; the
    * within-source share is a window over the source×band table (≤4
    * rows per source by construction).
    */
  def sourceQualityMatrix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val dim = 256
    // spread: same per-token md5 logit hot map as q122/q190 (single-task
    // on the 1-split scan otherwise; identity at production split counts)
    val scored = Tables.spread(t.documents).select(
      col("source"),
      size(graft.ops.Dedup.words(col("text"))).cast("long").as("n_tokens"),
      graft.ops.QualityScorer.logitMicro(col("text"),
        graft.ops.QualityScorer.md5Weights(dim)).as("logit_u"))
      .withColumn("band",
        when(col("logit_u") < -500000L, lit("strong_drop"))
          .when(col("logit_u") < 0L, lit("drop"))
          .when(col("logit_u") < 500000L, lit("keep"))
          .otherwise(lit("strong_keep")))
    scored.groupBy(col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("src_total",
        sum(col("n_docs")).over(Window.partitionBy(col("source"))))
      .select(col("source"), col("band"), col("n_docs"), col("n_tokens"),
        expr("n_docs * 1000000L div src_total").as("share_ppm"))
  }

  private val sourceQualityMatrixSql = Oracles("text", "sourceQualityMatrix")

  /** q187 — Gopher-style repetition audit per source: for every document,
    * the token share covered by its single most frequent 2-gram and
    * 3-gram (the published Gopher repetition rules use 0.20 / 0.18 as the
    * removal thresholds), rolled up per source as flagged-document counts
    * and mean coverage ppm. Complements q82 (distinct-trigram ratio) and
    * q89 (cross-doc dup spans): this is the "one phrase stamped over and
    * over" detector that catches templated spam whose trigram DIVERSITY
    * still looks fine.
    *
    * Scale shape: ONE scan — both gram sizes materialize inside the row
    * (two `transform`s concatenated, tagged with n) and `explode_outer`
    * keeps gram-less short docs alive for the per-source doc counts; the
    * only wide ops are the (doc, n, gram) count (map-side combine; raw
    * text never shuffles) and the nested per-doc / per-source rollups
    * over collapsed aggregates. Coverage is exact integer ppm
    * (`div`, positive operands — both engines truncate identically).
    */
  def gopherRepetition(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // Per-doc max-repeated-gram counting is embarrassingly parallel, so it
    // runs as ONE encoder mapPartitions pass (a per-doc open-addressing of
    // grams in a task-local HashMap) — the q217 winnowing pattern. The
    // previous formulation exploded 2- and 3-grams (~2× the token count in
    // rows) into a (doc, gram) groupBy: a shuffle of the whole corpus that
    // grows linearly with data and was q187's entire cost. Only the tiny
    // per-source rollup shuffles now. Tokenization stays the identical
    // `split(lower(trim(text)))` expression, so the oracle's token stream
    // is byte-for-byte the same.
    // spread BELOW the tokenize, not above it: Tables.spread used to wrap
    // this frame with the split already projected, which left the whole
    // corpus tokenize in the single upstream task of the round-robin
    // exchange (r19 census: a 1.6 s serial stage solo). Spreading the raw
    // projection and splitting after moves the tokenize 32-way too, and
    // the exchange carries the text column (fewer bytes than the token
    // array). Identity at production split counts, as everywhere.
    val base = Tables.spread(
        t.documents.select(col("doc_id"), col("source"), col("text")))
      .select(col("doc_id"), col("source"),
        split(lower(trim(col("text"))), "\\s+").as("tk"))
    val perDocSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("frac2_ppm",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("frac3_ppm",
        org.apache.spark.sql.types.LongType)))
    val perDoc = base.mapPartitions { rows =>
      // Task-resident state is BOUNDED: a document with more than
      // `passTarget` grams is counted in ceil(grams/passTarget)
      // hash-partitioned passes (a gram lands in exactly one pass, so the
      // max over passes IS the global max — exact, not approximate). A
      // normal doc takes one pass and skips the hash test entirely; only a
      // pathological multi-million-token doc pays the extra scans, instead
      // of building a multi-GB unspillable HashMap in one task.
      val passTarget = 1 << 19
      val counts = new java.util.HashMap[String, Int]()
      rows.map { r =>
        // null text → null tk: the old explode_outer/coalesce path scored
        // such docs 0 ppm; preserve that (and dodge the 0-division)
        val tk0 = r.getSeq[String](2)
        val tk = if (tk0 == null) Seq.empty[String] else tk0
        val nToks = math.max(1L, tk.length.toLong)
        def maxRep(n: Int): Long = {
          if (tk.length < n) return 0L
          val nGrams = tk.length - n + 1
          val k = 1 + (nGrams - 1) / passTarget
          var mx = 0
          var pass = 0
          val sb = new java.lang.StringBuilder
          while (pass < k) {
            counts.clear()
            var i = 0
            while (i + n <= tk.length) {
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(tk(i + j)); j += 1
              }
              val mine = k == 1 || {
                // 64-bit FNV-1a over the builder chars, no allocation. NOT
                // String.hashCode: its base-31 algebra makes equal-hash
                // token families trivially constructible ("Aa"/"BB"), which
                // would funnel every gram of an adversarial doc into ONE
                // pass and defeat the memory bound. FNV collisions across a
                // 2^64 space are not a practical corpus property, so the
                // bound is probabilistic but real. Exactness is unaffected
                // either way — each gram still lands in exactly one pass.
                var h = -3750763034362895579L // FNV offset basis
                var x = 0
                while (x < sb.length) {
                  h = (h ^ sb.charAt(x)) * 1099511628211L // FNV prime
                  x += 1
                }
                ((h >>> 1) % k).toInt == pass
              }
              if (mine) {
                val c = counts.merge(sb.toString, 1, (a, b) => a + b)
                if (c > mx) mx = c
              }
              i += 1
            }
            pass += 1
          }
          mx.toLong
        }
        org.apache.spark.sql.Row(r.getLong(0), r.getString(1),
          1000000L * 2 * maxRep(2) / nToks, 1000000L * 3 * maxRep(3) / nToks)
      }
    }(org.apache.spark.sql.Encoders.row(perDocSchema))
    perDoc
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("frac2_ppm") > 200000L, 1L).otherwise(0L)).as("flagged_2g"),
        sum(when(col("frac3_ppm") > 180000L, 1L).otherwise(0L)).as("flagged_3g"),
        expr("sum(frac2_ppm) div count(1)").as("mean_frac2_ppm"),
        expr("sum(frac3_ppm) div count(1)").as("mean_frac3_ppm"))
  }

  private val gopherRepetitionSql = Oracles("text", "gopherRepetition")

  /** q190 — "is the quality classifier just a length detector?" — the
    * standard sanity check before gating a corpus on a learned score:
    * per-source Spearman rank correlation between the q122 logit and
    * document length. A |ρ| near 1 means the expensive classifier is
    * reproducing `n_chars` and the curation threshold is secretly a
    * length filter. Ranks use the q98 recipe (row_number with doc_id as
    * the unique tiebreaker, d² summed as exact BIGINT, one final double
    * expression over exact integers — deterministic across engines).
    *
    * Scale shape: the logit is map-side (q122's literal-folded weights);
    * the two rank windows partition BY SOURCE (never a global window);
    * the result is one tiny per-source agg.
    */
  def qualityLengthCorr(spark: SparkSession, dir: String): DataFrame = {
    // Window form KEPT after a measured round-15 A/B (VERDICT r14 item 4,
    // BASELINE round 15): q98's exact shape — two rank windows over a
    // 20-value key (source) — but per-source volumes stay 3 orders below
    // q98's crossover and the q248-pattern rewrite (two Ranking.rowNumber
    // passes + a doc_id join) measured 2.3–4.4× SLOWER at sf0.1/10×/100×,
    // dominated by re-ranking overhead against 25k-row sorts. The swap is
    // mechanical when a profile justifies it (it was gate-validated before
    // reverting). Σd² follows the q98 round-15 gate convention regardless:
    // DECIMAL(38,0) accumulation (a LONG Σd² overflows past ~3M
    // rows/group), STRING at the gate (int128 decimals hash
    // engine-differently under the driver's canonicalization).
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    // spread before the logit projection (guide §2.5): the 256-weight
    // logit is the CPU cost here and the 1-row-group testdata plans the
    // scan as ONE task — measured 1.4 s single-task map stage feeding the
    // rank windows (r19); identity at production split counts
    val scored = Tables.spread(
      t.documents.select(col("doc_id"), col("source"), col("n_chars"), col("text")))
      .select(col("doc_id"), col("source"), col("n_chars"),
        graft.ops.QualityScorer.logitMicro(col("text"),
          graft.ops.QualityScorer.md5Weights(256)).as("logit_u"))
    val wq = Window.partitionBy(col("source"))
      .orderBy(col("logit_u"), col("doc_id"))
    val wl = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    scored
      .withColumn("rx", row_number().over(wq))
      .withColumn("ry", row_number().over(wl))
      .withColumn("d", col("rx").cast("long") - col("ry"))
      .withColumn("d2",
        col("d").cast("decimal(38,0)") * col("d").cast("decimal(38,0)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("d2")).cast("decimal(38,0)").as("sum_d2"))
      .withColumn("rho",
        lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
          (col("n").cast("double") *
            (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
      .withColumn("sum_d2", col("sum_d2").cast("string"))
  }

  private val qualityLengthCorrSql = Oracles("text", "qualityLengthCorr")

  /** q191 — language-ID confusion matrix: the q32 stopword-hit classifier
    * judged against the corpus's declared `lang` labels, as (labeled ×
    * guessed) counts with each row's share of its labeled language in
    * exact ppm. The per-language recall lives on the diagonal; "unk" mass
    * shows where the stopword lists have no coverage. This is the audit
    * that decides whether the cheap classifier is good enough to gate a
    * language-filtered training mix.
    *
    * Scale shape: q32's per-doc classification is map-side (stopword sets
    * fold in as literals); the matrix is one tiny (labeled, guessed) agg
    * and the row totals a window over ≤ |langs|² rows.
    */
  def langidConfusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(spark, dir)
      .groupBy(col("labeled_lang"), col("guessed_lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("labeled_lang"))))
      .select(col("labeled_lang"), col("guessed_lang"), col("n"),
        expr("n * 1000000 div row_total").as("share_ppm"))
  }

  private def langidConfusionSql: String =
    s"""WITH li AS ($langIdSql)
       |SELECT labeled_lang, guessed_lang, CAST(COUNT(*) AS BIGINT) AS n,
       |  CAST(CAST(COUNT(*) * 1000000 AS BIGINT) //
       |    CAST(SUM(COUNT(*)) OVER (PARTITION BY labeled_lang) AS BIGINT)
       |    AS BIGINT) AS share_ppm
       |FROM li GROUP BY 1, 2""".stripMargin

  /** q205 — Cohen's kappa for the lang-id classifier vs the declared
    * labels: chance-corrected agreement over the q191 confusion matrix,
    * the single-number companion to q191's per-cell view (raw accuracy
    * flatters any classifier on a label-skewed corpus — this corpus is
    * ~44% 'en' — kappa subtracts the agreement a label-marginal guesser
    * would get for free). κ = (N·Σdiag − Σᵢrᵢcᵢ) / (N² − Σᵢrᵢcᵢ),
    * computed entirely in BIGINT and emitted as micro-units via the
    * shift-by-one trick (κ ≥ −1 always, so κ+1 is a nonneg dividend and
    * Spark's truncating `div` ≡ DuckDB's flooring `//` — the q164 rule).
    * int64 headroom to ~10⁹ docs; past that the marginal products move
    * to DECIMAL(38,0) (the q147 recipe).
    *
    * Scale shape: q32's classification is map-side; everything after is
    * aggs over the ≤|langs|² matrix and its two marginal vectors —
    * control-plane sized regardless of corpus size.
    */
  def kappaLangid(spark: SparkSession, dir: String): DataFrame = {
    // cells feeds three readers (totals, row margins, column margins) —
    // un-persisted, the full langId classification pass executed per
    // reader (r19 runtime plan audit: documents scanned 3×). Checkpoint:
    // |langs|²-grain, bounded at any data scale.
    val cells = langId(spark, dir)
      .groupBy(col("labeled_lang").as("a"), col("guessed_lang").as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val totals = cells.agg(
      sum(col("c")).as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("diag"))
    val rows = cells.groupBy(col("a")).agg(sum(col("c")).as("r"))
    val cols = cells.groupBy(col("b")).agg(sum(col("c")).as("g"))
    val src = rows.join(cols, rows("a") === cols("b"))
      .agg(coalesce(sum(col("r") * col("g")), lit(0L)).as("src"))
    totals.crossJoin(broadcast(src))
      .select(
        col("n").as("n_docs"), col("diag").as("n_agree"),
        expr("diag * 1000000 div n").as("po_ppm"),
        expr("src * 1000000 div (n * n)").as("pe_ppm"),
        expr("((n * diag - src) + (n * n - src)) * 1000000 div (n * n - src) - 1000000")
          .as("kappa_u"))
  }

  private def kappaLangidSql: String =
    s"""WITH li AS ($langIdSql),
       |cells AS (
       |  SELECT labeled_lang AS a, guessed_lang AS b, COUNT(*) AS c
       |  FROM li GROUP BY 1, 2),
       |t AS (
       |  SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS diag
       |  FROM cells),
       |r AS (SELECT a, CAST(SUM(c) AS BIGINT) AS r FROM cells GROUP BY 1),
       |g AS (SELECT b, CAST(SUM(c) AS BIGINT) AS g FROM cells GROUP BY 1),
       |s AS (
       |  SELECT CAST(COALESCE(SUM(r.r * g.g), 0) AS BIGINT) AS src
       |  FROM r JOIN g ON r.a = g.b)
       |SELECT n AS n_docs, diag AS n_agree,
       |  CAST(diag * 1000000 // n AS BIGINT) AS po_ppm,
       |  CAST(src * 1000000 // (n * n) AS BIGINT) AS pe_ppm,
       |  CAST(((n * diag - src) + (n * n - src)) * 1000000 // (n * n - src)
       |    - 1000000 AS BIGINT) AS kappa_u
       |FROM t, s""".stripMargin

  /** q194 — sentence-segmentation statistics per source: document counts,
    * total sentences, mean sentences per document and mean tokens per
    * sentence (exact centi-units). Sentence-level structure is the
    * granularity real pipelines filter and chunk at (too-long sentences
    * break context packing; one-sentence "docs" are usually titles or
    * spam), and the per-source means expose which feeds are prose vs
    * fragments. Segmentation is the shared-dialect regex `[.!?]+` with
    * trimmed-empty removal, identical on both engines.
    *
    * Scale shape: entirely map-side per row (split → trim-filter → HOF
    * token fold, no explode); one per-source agg of four counters. The
    * raw text never leaves the scan projection.
    */
  def sentenceStats(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.documents
      .select(col("source"), expr(
        """filter(transform(split(text, '[.!?]+'), s -> trim(s)),
          |  s -> s != '')""".stripMargin).as("sents"))
      .select(col("source"), size(col("sents")).cast("long").as("n_sents"),
        // NB double-escape: Spark SQL string literals CONSUME unknown
        // escapes ('\s' → 's'), so the literal must carry \\s to reach
        // the regex engine as \s (NOTES.md round-6 lesson)
        expr("aggregate(sents, 0L, (acc, s) -> acc + size(split(s, '\\\\s+')))")
          .as("n_toks"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_sents")).as("n_sents"),
        sum(col("n_toks")).as("n_sent_toks"))
      .select(col("source"), col("n_docs"), col("n_sents"),
        col("n_sent_toks"),
        expr("n_sents * 100 div n_docs").as("mean_sents_per_doc_c"),
        when(col("n_sents") > 0,
          expr("n_sent_toks * 100 div n_sents")).otherwise(lit(0L))
          .as("mean_toks_per_sent_c"))
  }

  private val sentenceStatsSql = Oracles("text", "sentenceStats")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q194_sentence_stats", sentenceStats, Some(sentenceStatsSql)),
    QueryDef("q187_gopher_repetition", gopherRepetition, Some(gopherRepetitionSql)),
    QueryDef("q190_quality_length_corr", qualityLengthCorr, Some(qualityLengthCorrSql)),
    QueryDef("q191_langid_confusion", langidConfusion, Some(langidConfusionSql)),
    QueryDef("q205_kappa_langid", kappaLangid, Some(kappaLangidSql)),
    QueryDef("q183_source_quality_matrix", sourceQualityMatrix, Some(sourceQualityMatrixSql)),
    QueryDef("q122_quality_classifier", qualityClassifier, Some(qualityClassifierSql)),
    QueryDef("q153_filter_funnel", filterFunnel, Some(filterFunnelSql)),
    QueryDef("q180_boilerplate_prefixes", boilerplatePrefixes, Some(boilerplatePrefixesSql)),
    QueryDef("q160_threshold_sweep", thresholdSweep, Some(thresholdSweepSql)),
    QueryDef("q161_token_fertility", tokenFertility, Some(tokenFertilitySql)),
    QueryDef("q169_curriculum_phases", curriculumPhases, Some(curriculumPhasesSql)),
    QueryDef("q250_curriculum_phases_distributed", curriculumPhasesDistributed,
      Some(curriculumPhasesSql)), // q169's oracle VERBATIM — the closed ntile form must hash-match
    QueryDef("q61_word_frequencies", wordFrequencies, Some(wordFrequenciesSql)),
    QueryDef("q81_pii_redact", piiRedact, Some(piiRedactSql)),
    QueryDef("q82_repetition_ratio", repetitionRatio, Some(repetitionRatioSql)),
    QueryDef("q55_bpe_tokens", bpeTokens, Some(bpeTokensSql)),
    QueryDef("q56_rolling_hash", rollingHash, Some(rollingHashSql)),
    QueryDef("q27_string_normalize", stringNormalize, Some(stringNormalizeSql)),
    QueryDef("q28_clean_text", cleanText, Some(cleanTextSql)),
    QueryDef("q29_classify_category", classifyCategory, Some(classifyCategorySql)),
    QueryDef("q30_size_extract", sizeExtract, Some(sizeExtractSql)),
    QueryDef("q31_token_stats", tokenStats, Some(tokenStatsSql)),
    QueryDef("q32_lang_id", langId, Some(langIdSql)),
    QueryDef("q33_fingerprint", fingerprint, Some(fingerprintSql)),
    QueryDef("q34_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q35_multimodal_meta", multimodalMeta, Some(multimodalMetaSql)),
  )
}
