package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Linear text-quality classifier scorer — the fasttext-style gate real
  * curation pipelines run between heuristic filters ([[graft.queries.TextQ]]
  * q31/q32 length/stopword/lang-ID) and corpus assembly ([[Corpus.curate]]):
  * a model scores every document and a threshold keeps the top slice.
  *
  * Inference shape, built for 100 TB: hashed bag-of-words features (token →
  * 60-bit md5 hash → `dim` buckets — no vocabulary table, no OOV problem),
  * a FIXED weight vector folded into the plan as an array literal (the
  * "broadcast" is the closed-form literal: every executor gets the weights
  * with the serialized plan, no join, no shuffle, no driver state), and the
  * dot product as a codegen'd `transform`/`aggregate` HOF over the token
  * array — strictly map-only, so the cost at scale is the scan itself.
  *
  * Fixed-point arithmetic end to end: weights and bias are integer
  * MICRO-units, the logit is an exact BIGINT sum — bit-identical across
  * engines and partitionings (no float summation order), so a DuckDB oracle
  * can re-derive scores exactly. Callers with a float model quantize to
  * micro-units once at load time (the standard int8/int32 inference trick —
  * same policy as [[Gramian]] and q80's quantization).
  *
  * Training is out of scope by design: gates are trained offline on labeled
  * samples; the ENGINE's job is cheap exact inference over everything.
  */
object QualityScorer {

  /** Deterministic demo weights: micro-unit integers in [-500000, 500000]
    * derived from md5("w:bucket") — the same engine-portable derivation as
    * [[Similarity.hyperplaneSignature]]'s planes, reproducible in SQL as
    * `('0x' || substr(md5('w:' || j), 1, 15))::BIGINT % 1000001 - 500000`.
    */
  def md5Weights(dim: Int): Seq[Long] = (0 until dim).map { j =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"w:$j".getBytes("UTF-8"))
    val hex = d.take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 1000001L - 500000L
  }

  /** Feature bucket of one token: `hash60(tok) % dim` (hash60 is
    * non-negative, so `%` and `pmod` agree — and match SQL's `%`).
    */
  def bucket(tok: Column, dim: Int): Column = Dedup.hash60(tok) % dim

  /** Exact integer logit for a whitespace-tokenized text column:
    * `biasMicro + Σ_tokens weightsMicro[bucket(token)]`. One codegen'd
    * expression — no explode, no shuffle; duplicate tokens count once per
    * occurrence (bag of words, not set).
    */
  def logitMicro(textCol: Column, weightsMicro: Seq[Long],
      biasMicro: Long = 0L): Column = {
    require(weightsMicro.nonEmpty, "empty weight vector")
    val w = typedLit(weightsMicro)
    val toks = Dedup.words(textCol)
    aggregate(
      transform(toks, t =>
        element_at(w, (bucket(t, weightsMicro.size) + 1).cast("int"))),
      lit(biasMicro),
      (acc, x) => acc + x)
  }
}
