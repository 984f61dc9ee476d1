package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Merge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle gates for [[graft.ops.Merge]] — the SCD-1 / SCD-2 table-maintenance
  * operators around the reference's layered parquet stores.
  */
object MergeQ {

  /** q85 — SCD-1 upsert of a deterministic delta into `orders`: every 7th
    * key is an update (status 'U', repriced), keys ≡3 (mod 7) arrive re-keyed
    * negative as inserts (guaranteed disjoint from the non-negative base
    * keys). The delta is applied with the broadcast-anti-join shape — the
    * base table is never sorted or windowed (see [[Merge.upsert]]).
    *
    * Determinism: the reprice is one IEEE double multiply (same bits in both
    * engines); timestamps cross as unix_micros.
    */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val base = t.orders
    val updates = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
      .unionByName(
        base.filter(col("o_orderkey") % 7 === 3)
          .withColumn("o_orderkey", -col("o_orderkey") - 1)
          .withColumn("o_orderstatus", lit("N")))
    Merge.upsert(base, updates, keys = Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // orders timestamps infer as TIMESTAMP_NTZ — cast under the UTC
        // session so unix_micros matches DuckDB's epoch_us
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
        col("o_orderpriority"))
  }

  private val mergeUpsertSql = Oracles("merge", "mergeUpsert")

  /** q86 — SCD-2 history over the events change log: per user, each run of
    * equal `event_type` becomes one `[valid_from, valid_to)` interval, the
    * open one flagged current. One shuffle on user_id (see [[Merge.scd2]]).
    */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Merge.scd2(t.events, keys = Seq("user_id"), stateCol = "event_type",
      tsCol = "ts", tieCol = "event_id")
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("is_current"))
  }

  private val scd2HistorySql = Oracles("merge", "scd2History")

  /** q127 — snapshot diff / change-data-feed recovery
    * ([[graft.ops.SnapshotDiff]]): snapshot B evolves `orders`
    * deterministically (keys ≡0 mod 97 deleted; surviving keys ≡0 mod 13
    * repriced +1.0 and re-prioritized; keys ≡0 mod 101 re-inserted under
    * key+10⁸), then `diff` recovers the change feed with ONE full-outer
    * key join. Output is the audit summary: row counts per change type
    * plus per-column change counts (`col:<name>` rows) — the
    * replication-check shape, constant-size regardless of table size.
    * The +1.0 reprice is one IEEE double add — identical bits in both
    * engines; each engine compares its own A/B values, so flags agree.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val a = t.orders
    val b = a.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .withColumn("o_orderpriority",
        when(col("o_orderkey") % 13 === 0, lit("9-REPRICED"))
          .otherwise(col("o_orderpriority")))
      .unionByName(a.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
    // the diff feeds BOTH rollups — un-persisted, the full-outer diff
    // (a 3-scan join of the two snapshots) executed twice (r19 runtime
    // plan audit: orders scanned 6×). Project to the two rollup columns
    // and checkpoint: one diff pass, and the materialized frame carries
    // none of the wide snapshot payload (guide §5 — data-sized but
    // reused and expensive to recompute).
    val d = graft.ops.SnapshotDiff.diff(a, b, keys = Seq("o_orderkey"))
      .select(col("change_type"), col("changed_cols"))
      .localCheckpoint(true)
    val byType = d.groupBy(col("change_type").as("kind"))
      .agg(count(lit(1)).as("n"))
    val byCol = d.select(explode(col("changed_cols")).as("c"))
      .groupBy(concat(lit("col:"), col("c")).as("kind"))
      .agg(count(lit(1)).as("n"))
    byType.unionByName(byCol)
  }

  private val snapshotDiffSql = Oracles("merge", "snapshotDiff")

  /** q133 — POINT-IN-TIME (temporal) join against the SCD-2 history: for
    * every purchase event, the user's state one hour BEFORE the purchase
    * ("what was the user doing before buying" — the attribution /
    * feature-backfill question that motivates SCD-2 in the first place;
    * joining a fact to the dimension version valid AT the fact's
    * timestamp is the temporal-correctness contract training-data
    * backfills must honor to avoid leakage). Probes before a user's
    * first interval stay NULL — they had no state yet, and fabricating
    * one would be the leakage.
    *
    * Scale shape: ONE equi-join on user_id with the `[from, to)`
    * interval predicate evaluated in-join (intervals partition each
    * user's timeline, so at most one matches — row count = probe count);
    * per-user histories are bounded, and a history too hot for one key
    * would move to the bucketed [[graft.ops.RangeJoin]] shape. Interval
    * semantics are half-open ([from, to)), so a probe exactly on a
    * boundary belongs to the LATER interval in both engines.
    */
  def pointInTimeJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val hist = Merge.scd2(t.events, keys = Seq("user_id"),
      stateCol = "event_type", tsCol = "ts", tieCol = "event_id")
      .select(col("user_id"), col("event_type").as("state"),
        unix_micros(col("valid_from")).as("vf_us"),
        unix_micros(col("valid_to")).as("vt_us"))
    val probes = t.events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - lit(3600000000L)).as("pt_us"))
    probes.join(hist,
        probes("user_id") === hist("user_id") &&
          col("vf_us") <= col("pt_us") &&
          (col("vt_us").isNull || col("pt_us") < col("vt_us")),
        "left")
      .select(probes("event_id"), probes("user_id"), col("pt_us"),
        col("state"), col("vf_us").as("state_since_us"))
  }

  private val pointInTimeJoinSql = Oracles("merge", "pointInTimeJoin")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q85_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QueryDef("q86_scd2_history", scd2History, Some(scd2HistorySql)),
    QueryDef("q127_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("q133_pointintime_join", pointInTimeJoin, Some(pointInTimeJoinSql)),
  )
}
