package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for joins and aggregations (the 100-TB toolbox).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in our sessions). These
  * operators cover the cases AQE can't fix:
  *  - a shuffle hash/sort-merge join where one key holds a large fraction of
  *    all rows → [[saltedJoin]] splits each hot key into `saltFactor`
  *    subkeys, replicating the (small-ish) right side per salt;
  *  - a `groupBy` on a hot key → [[twoPhaseAgg]]-style pre-aggregation:
  *    partial aggregate on (key, salt), then final aggregate on key —
  *    turning one giant reducer into `saltFactor` + 1 small ones.
  *
  * Salts are deterministic (hash-mod of stable columns), so results are
  * reproducible and unit-testable — not `rand()`.
  */
object Skew {

  /** Deterministic salt in [0, saltFactor) from stable columns.
    *
    * Deliberately NOT mixed with physical row position
    * (`monotonically_increasing_id`) — a partition-layout-dependent shuffle
    * key re-evaluates differently under stage retry and can double-count or
    * drop rows in partial aggregations (the SPARK-23207 class of hazard).
    * The tradeoff: rows that are fully identical on the salt basis land on
    * one salt; widen the basis (more columns) rather than adding
    * nondeterminism. An empty basis falls back to salt 0 (no spreading).
    */
  def salt(saltFactor: Int, cols: Column*): Column =
    if (cols.isEmpty) lit(0) else pmod(hash(cols: _*), lit(saltFactor))

  /** Skew-resistant inner equi-join: left side gets a spreading salt; right
    * side is exploded `saltFactor`× so every (key, salt) pair finds its
    * match. Use when `right` is too big to broadcast but small enough to
    * replicate `saltFactor` times; pick `saltFactor` ≈ (hot-key rows /
    * target partition rows).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int): DataFrame = {
    val saltBasis = left.columns.filterNot(_ == key).map(col).toIndexedSeq
    val saltedLeft = left.withColumn("__salt", salt(saltFactor, saltBasis: _*))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase aggregation for skewed groupBy keys: caller supplies the
    * partial and final aggregate expressions (they must compose, e.g.
    * partial sum → final sum, partial count → final sum).
    *
    * {{{
    * Skew.twoPhaseAgg(df, Seq("hot_key"), 16,
    *   partial = Seq(sum("v").as("pv"), count(lit(1)).as("pc")),
    *   final_ = Seq(sum("pv").as("total"), sum("pc").as("n")))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
      partial: Seq[Column], final_ : Seq[Column]): DataFrame = {
    val saltBasis = df.columns.filterNot(keys.contains).map(col).toIndexedSeq
    df.withColumn("__salt", salt(saltFactor, saltBasis: _*))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(final_.head, final_.tail: _*)
  }
}
