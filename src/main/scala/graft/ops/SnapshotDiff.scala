package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-snapshot diff — the change-data-feed primitive (Delta CDF /
  * iceberg changelog shape) a warehouse needs for replication checks,
  * incremental consumers, and audit: given two snapshots of one keyed
  * table, classify every key as added / removed / changed / unchanged and
  * name the changed columns.
  *
  * Scale shape: ONE full-outer shuffle join on the key (both sides
  * shuffle once, map-side classification after), no window, no sort, no
  * driver state. Column comparison is null-safe (`<=>` negated — NULL→x
  * and x→NULL both count as changes), generic over the schema, and
  * codegen'd (plain expressions over two structs).
  *
  * Complements [[Merge]]: `Merge.scd1/scd2` APPLY a delta; `diff` RECOVERS
  * the delta between two materialized states.
  */
object SnapshotDiff {

  /** Row-level diff of two snapshots sharing a schema. Output: the key
    * columns (coalesced), `change_type` ∈ added|removed|changed|unchanged,
    * and `changed_cols` — the sorted names of differing non-key columns
    * (empty unless changed).
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"schema mismatch: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val dataCols = a.columns.filterNot(keys.contains).toSeq
    val aa = a.select(keys.map(col) :+ struct(dataCols.map(col): _*).as("__a"): _*)
    val bb = b.select(keys.map(k => col(k).as(s"__k_$k")) :+
      struct(dataCols.map(col): _*).as("__b"): _*)
    val joinCond = keys.map(k => col(k) === col(s"__k_$k")).reduce(_ && _)
    val changed = dataCols.map(c =>
      when(!(col(s"__a.$c") <=> col(s"__b.$c")), lit(c)))
    aa.join(bb, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(k), col(s"__k_$k")).as(k)) ++ Seq(
          when(col("__a").isNull, lit("added"))
            .when(col("__b").isNull, lit("removed"))
            .when(!(col("__a") <=> col("__b")), lit("changed"))
            .otherwise(lit("unchanged")).as("change_type"),
          when(col("__a").isNotNull && col("__b").isNotNull,
            sort_array(filter(array(changed: _*), _.isNotNull)))
            .otherwise(array().cast("array<string>")).as("changed_cols")): _*)
  }
}
