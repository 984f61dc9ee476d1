package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance merges — the write-side operators a lakehouse pipeline
  * needs around the reference's layered parquet stores: SCD-1 upsert
  * (latest version of each key wins) and SCD-2 history (validity-interval
  * change tracking).
  *
  * Reference behavior target: the incremental leg
  * (`/root/reference/glue/go-incremental-ingest-elt.py:162-212`) reads a
  * bookmark slice and OVERWRITES per-key latest state; `upsert` is that
  * semantics expressed against an existing base table, `scd2` is the
  * history-preserving variant of the same change feed.
  *
  * Scale shape (the part that matters at 100 TB): `upsert` NEVER sorts or
  * windows the base side. The delta is deduped per key on its own (a window
  * over the small side only), then applied with a key anti-join — which
  * Catalyst turns into a BroadcastHashJoin when the delta fits, so the base
  * table streams map-side with ZERO shuffle. A window-over-union
  * formulation (the naive MERGE) would shuffle + sort the full base every
  * run; this one touches it linearly. With a delta too big to broadcast,
  * AQE falls back to a shuffled hash join on the key — still no sort.
  */
object Merge {

  private def requireColumns(df: DataFrame, cols: Seq[String], what: String): Unit = {
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"$what missing columns: ${missing.mkString(", ")}")
  }

  /** SCD-1 upsert: rows in `updates` replace base rows with the same key;
    * unmatched update rows are inserts. When `updates` carries several rows
    * per key, the greatest `tiebreak` tuple wins; equal tiebreak tuples are
    * resolved by a content hash (xxhash64 over the full row), so the result
    * is deterministic under any partitioning — never a
    * whichever-partition-finished-last winner.
    *
    * With `tiebreak = Nil` the delta is applied AS IS (no per-key dedupe
    * window at all — the plan-shape fast path): the CALLER asserts the
    * delta is per-key unique, and a violation surfaces as duplicate keys in
    * the output rather than a silent arbitrary pick.
    *
    * `updates` must contain every base column (extra columns are dropped) —
    * partial-column updates belong upstream, where the caller joins the
    * delta against base to fill the gaps.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    requireColumns(base, keys, "base")
    requireColumns(updates, base.columns.toSeq, "updates")

    val aligned = updates.select(base.columns.map(col).toIndexedSeq: _*)
    val deduped =
      if (tiebreak.isEmpty) aligned
      else {
        val contentHash = xxhash64(aligned.columns.map(col).toIndexedSeq: _*)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(tiebreak.map(col(_).desc) :+ contentHash.desc: _*)
        aligned.withColumn("__graft_rn", row_number().over(w))
          .filter(col("__graft_rn") === 1).drop("__graft_rn")
      }
    base.join(deduped.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(deduped)
  }

  /** SCD-2 history: collapse a change log into validity intervals. Each run
    * of equal `stateCol` values per key (ordered by `tsCol`, ties broken by
    * `tieCol`) becomes one row `[valid_from, valid_to)`; the open interval
    * has `valid_to` null and `is_current` true.
    *
    * One hash shuffle on `keys`; both windows share the partitioning, so the
    * exchange is planned once (the second sort is partition-local).
    * State comparison is null-safe — a null state is a state, not a gap.
    */
  def scd2(log: DataFrame, keys: Seq[String], stateCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    requireColumns(log, keys :+ stateCol :+ tsCol :+ tieCol, "log")
    val keyCols = keys.map(col)
    val wLag = Window.partitionBy(keyCols: _*)
      .orderBy(col(tsCol), col(tieCol))
    val changes = log
      .withColumn("__graft_prev", lag(col(stateCol), 1).over(wLag))
      // row_number==1 can't mark the first row here: lag handles it (prev is
      // null) AND a genuinely-null first state still compares distinct-safe
      .filter(!(col(stateCol) <=> col("__graft_prev")))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wLag))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__graft_prev")
  }
}
