package graft.queries

import graft.QueryDef
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

  private val mergeUpsertSql =
    """WITH updates AS (
      |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
      |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
      |         o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1, o_custkey, 'N', o_totalprice,
      |         o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 7 = 3)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |       epoch_us(o_orderdate) AS o_orderdate_us, o_orderpriority
      |FROM (
      |  SELECT * FROM orders
      |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      |  UNION ALL SELECT * FROM updates)""".stripMargin

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

  private val scd2HistorySql =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id FROM ordered
      |  WHERE event_type IS DISTINCT FROM prev)
      |SELECT user_id, event_type AS state,
      |  epoch_us(ts) AS valid_from_us,
      |  epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |    AS valid_to_us,
      |  (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) IS NULL
      |    AS is_current
      |FROM chg""".stripMargin

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
    val d = graft.ops.SnapshotDiff.diff(a, b, keys = Seq("o_orderkey"))
    val byType = d.groupBy(col("change_type").as("kind"))
      .agg(count(lit(1)).as("n"))
    val byCol = d.select(explode(col("changed_cols")).as("c"))
      .groupBy(concat(lit("col:"), col("c")).as("kind"))
      .agg(count(lit(1)).as("n"))
    byType.unionByName(byCol)
  }

  private val snapshotDiffSql =
    """WITH b AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate,
      |    CASE WHEN o_orderkey % 13 = 0 THEN '9-REPRICED'
      |         ELSE o_orderpriority END AS o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
      |    o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |j AS (
      |  SELECT a.o_orderkey AS ak, b.o_orderkey AS bk,
      |    a.o_custkey IS DISTINCT FROM b.o_custkey AS d_custkey,
      |    a.o_orderstatus IS DISTINCT FROM b.o_orderstatus AS d_status,
      |    a.o_totalprice IS DISTINCT FROM b.o_totalprice AS d_price,
      |    a.o_orderdate IS DISTINCT FROM b.o_orderdate AS d_date,
      |    a.o_orderpriority IS DISTINCT FROM b.o_orderpriority AS d_prio
      |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
      |typed AS (
      |  SELECT CASE WHEN ak IS NULL THEN 'added'
      |              WHEN bk IS NULL THEN 'removed'
      |              WHEN d_custkey OR d_status OR d_price OR d_date OR d_prio
      |                THEN 'changed'
      |              ELSE 'unchanged' END AS kind,
      |    d_custkey, d_status, d_price, d_date, d_prio,
      |    (ak IS NOT NULL AND bk IS NOT NULL) AS both_sides
      |  FROM j)
      |SELECT kind, COUNT(*) AS n FROM typed GROUP BY kind
      |UNION ALL
      |SELECT kind, n FROM (
      |  SELECT 'col:o_custkey' AS kind,
      |    COUNT(*) FILTER (WHERE both_sides AND d_custkey) AS n FROM typed
      |  UNION ALL SELECT 'col:o_orderstatus',
      |    COUNT(*) FILTER (WHERE both_sides AND d_status) FROM typed
      |  UNION ALL SELECT 'col:o_totalprice',
      |    COUNT(*) FILTER (WHERE both_sides AND d_price) FROM typed
      |  UNION ALL SELECT 'col:o_orderdate',
      |    COUNT(*) FILTER (WHERE both_sides AND d_date) FROM typed
      |  UNION ALL SELECT 'col:o_orderpriority',
      |    COUNT(*) FILTER (WHERE both_sides AND d_prio) FROM typed)
      |WHERE n > 0""".stripMargin

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

  private val pointInTimeJoinSql =
    """WITH ordered AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS prev
      |  FROM events),
      |chg AS (
      |  SELECT user_id, event_type, ts, event_id FROM ordered
      |  WHERE event_type IS DISTINCT FROM prev),
      |hist AS (
      |  SELECT user_id, event_type AS state,
      |    epoch_us(ts) AS vf_us,
      |    epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
      |      AS vt_us
      |  FROM chg),
      |probes AS (
      |  SELECT event_id, user_id, epoch_us(ts) - 3600000000 AS pt_us
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, p.pt_us, h.state,
      |  h.vf_us AS state_since_us
      |FROM probes p LEFT JOIN hist h
      |  ON h.user_id = p.user_id AND h.vf_us <= p.pt_us
      | AND (h.vt_us IS NULL OR p.pt_us < h.vt_us)""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q85_merge_upsert", mergeUpsert, Some(mergeUpsertSql)),
    QueryDef("q86_scd2_history", scd2History, Some(scd2HistorySql)),
    QueryDef("q127_snapshot_diff", snapshotDiff, Some(snapshotDiffSql)),
    QueryDef("q133_pointintime_join", pointInTimeJoin, Some(pointInTimeJoinSql)),
  )
}
