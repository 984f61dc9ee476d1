package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Train/eval decontamination — detect evaluation documents whose content
  * leaks into the training corpus via word n-gram overlap (the test-set
  * contamination check every serious training pipeline runs before a data
  * release; same shingle machinery as [[Dedup]]).
  *
  * Scale shape: one shuffle on the shingle key joins the two corpora;
  * boilerplate shingles are dropped FIRST by a document-frequency cap
  * (`maxShingleDf`, computed over both sides together), which is what keeps
  * the shingle join from going quadratic on stop-phrases — the same
  * hot-bucket discipline as the LSH candidate cap, and mirrored in the q83
  * oracle. Containment denominators use POST-cap eval shingle counts, so
  * dropped boilerplate neither dilutes nor inflates the score.
  */
object Decontaminate {

  /** @param eval        evaluation corpus: (idCol, textCol)
    * @param train       training corpus: (idCol, textCol)
    * @param n           shingle width in words
    * @param maxShingleDf drop shingles occurring in more than this many
    *                    documents across BOTH corpora
    * @param minContainment keep pairs where at least this share of the eval
    *                    doc's surviving shingles appears in the train doc
    * @return (eval_id, train_id, shared, n_eval, containment) per flagged pair
    */
  def overlap(eval: DataFrame, train: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxShingleDf: Long = 50, minContainment: Double = 0.5): DataFrame = {

    // spread: the tokenize + shingle explode below materializes through
    // localCheckpoint, and on a 1-split gate-scale scan that whole chain
    // runs as ONE task (r19 stage log: 1.8 s single-task checkpoint
    // stages). Identity at production split counts — per-site rule.
    def shingles(df: DataFrame, outId: String): DataFrame =
      graft.core.Tables.spread(df)
        .select(col(idCol).as(outId), Dedup.words(col(textCol)).as("__w"))
        .filter(size(col("__w")) >= n)
        .select(col(outId), explode(Dedup.wordShingles("__w", n)).as("shingle"))

    // each shingle table feeds THREE consumers (df count, capped join side,
    // and for eval the denominator count) — localCheckpoint materializes the
    // tokenize+explode once per corpus instead of re-scanning the input for
    // every consumer (same lineage-truncation precedent as Corpus.curate;
    // blocks are freed when the plan is GC'd)
    val ev = shingles(eval, "eval_id").localCheckpoint(true)
    val tr = shingles(train, "train_id").localCheckpoint(true)

    // document frequency over both corpora; keep sub-cap shingles only
    val freq = ev.select(col("shingle"))
      .unionAll(tr.select(col("shingle")))
      .groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxShingleDf)
      .select(col("shingle"))
    val evKept = ev.join(freq, Seq("shingle"))
    val trKept = tr.join(freq, Seq("shingle"))

    val nEval = evKept.groupBy(col("eval_id")).agg(count(lit(1)).as("n_eval"))
    evKept.join(trKept, Seq("shingle"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("shared"))
      .join(nEval, Seq("eval_id"))
      .filter(col("shared").cast("double") / col("n_eval") >= minContainment)
      .select(col("eval_id"), col("train_id"), col("shared"), col("n_eval"),
        round(col("shared").cast("double") / col("n_eval"), 6).as("containment"))
  }
}
