package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Concat-and-chunk sequence packing — the training-batch assembly step
  * after curation/dedup: documents are laid head-to-tail in a deterministic
  * order and cut into fixed-token-budget packs (GPT-style packing; a doc
  * can straddle two packs, `pack_offset` is where it starts inside its
  * pack).
  *
  * Scale shape: packing is SHARD-LOCAL — the cumulative-sum window
  * partitions by (group, id % shards), never globally, so a 1000-executor
  * run packs shards independently and no global sort exists at any scale.
  * Shard count should scale with the corpus; the `id`-derived shard is
  * deterministic on any engine/partitioning.
  *
  * Exactness: with a power-of-two `budget`, `cum / budget` is exact in
  * doubles, so the floor-division pack boundary cannot straddle an ulp
  * across engines (the q79 oracle relies on this).
  */
object Pack {

  /** @param docs     corpus with a unique numeric id, a text column, and a
    *                 grouping column (packs never span groups)
    * @param tokens   token-count expression for one document (defaults to
    *                 whitespace tokenization, matching q31/q79)
    * @return input columns + n_tokens, shard, pack_id, pack_offset
    */
  def concatAndChunk(docs: DataFrame, idCol: String, groupCol: String,
      budget: Int = 2048, shards: Int = 8,
      tokens: Column => Column = c => size(split(trim(c), "\\s+")),
      textCol: String = "text"): DataFrame = {
    require(budget > 0 && (budget & (budget - 1)) == 0,
      s"budget ($budget) must be a power of two — exact floor division in " +
        "doubles is what keeps pack boundaries engine-independent")
    val w = Window.partitionBy(col(groupCol), col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", tokens(col(textCol)))
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)).cast("int"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / lit(budget.toDouble)))
      .withColumn("pack_offset", pmod(col("cum_before"), lit(budget.toLong)))
      .drop("cum_before")
  }
}
