package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracle-gated skew-toolbox query: a salted equi-join over a DELIBERATELY
  * skewed key. ~75% of lineitem rows are funneled onto one hot key (key 0),
  * the hostile shape for a shuffle join — one reducer would receive 75% of
  * the table. [[graft.ops.Skew.saltedJoin]] splits the hot key into
  * `saltFactor` deterministic subkeys (right side replicated per salt), so
  * the hot key's rows spread across `saltFactor` reducers.
  *
  * The salt is pure execution strategy — semantically invisible — so the
  * DuckDB oracle is the PLAIN unsalted join: any drift (dropped salt
  * replica, double-matched row, nondeterministic salt) breaks the hash
  * match. This is the same relationship AQE skew-split has to a normal
  * join, expressed as an explicit operator for engines/plans where AQE
  * can't see the skew (e.g. a first-shuffle join straight off a scan).
  */
object SkewQ {

  /** Skewed key: 3 of 4 partkey residues collapse to 0, the rest spread
    * over 97 buckets — so key 0 holds ~75% of all rows.
    */
  private def skewedKey(c: org.apache.spark.sql.Column) =
    when(pmod(c, lit(4)) < 3, lit(0L)).otherwise(pmod(c, lit(97)))

  def saltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val left = t.lineitem.select(
      col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
      skewedKey(col("l_partkey")).as("sk"))
    // small keyed dim (≤97 rows) derived from part — too simple to need the
    // salt in real life (it would broadcast), but the POINT is the salted
    // shuffle shape, asserted by SkewSpec on the physical plan
    val right = t.part
      .groupBy(skewedKey(col("p_partkey")).as("sk"))
      .agg(count(lit(1)).as("n_parts"))
    Skew.saltedJoin(left, right, "sk", saltFactor = 8)
      .select(col("l_orderkey"), col("l_linenumber"), col("sk"),
        col("l_quantity"), col("n_parts"))
  }

  private val saltedSkewJoinSql = Oracles("skew", "saltedSkewJoin")

  /** q101 — two-phase aggregation over the same deliberately skewed key
    * (~75% of rows on key 0): partial aggregate on (key, salt) spreads the
    * hot reducer into `saltFactor` small ones, the final aggregate merges
    * per key ([[Skew.twoPhaseAgg]]). The salt is execution strategy only —
    * the oracle is the PLAIN GROUP BY, and the decimal partial/final sums
    * make the two-phase total bit-equal to the one-phase one (Exact rules;
    * a double partial sum would make the salt semantically VISIBLE via
    * summation order).
    */
  def twoPhaseSkewAgg(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val rows = t.lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      skewedKey(col("l_partkey")).as("sk"), col("l_quantity"))
    Skew.twoPhaseAgg(rows, keys = Seq("sk"), saltFactor = 8,
      partial = Seq(
        sum(col("l_quantity").cast("decimal(18,2)")).as("pq"),
        count(lit(1)).as("pc")),
      final_ = Seq(
        sum(col("pq")).cast("double").as("total_qty"),
        sum(col("pc")).as("n_items")))
  }

  private val twoPhaseSkewAggSql = Oracles("skew", "twoPhaseSkewAgg")

  /** q212 — join-key skew report: per keyspace the engine actually joins
    * or groups on (lineitem order/part/supp keys, orders customer key,
    * events user key), the per-key row-count profile that DECIDES the
    * skew strategy — top-1 key share (broadcast/salt trigger), p99 key
    * size (reducer sizing), and max/mean ratio in ppm (the "is AQE skew
    * split enough" number q78's salting and the two-phase agg q101 are
    * the answers to). On healthy TPC-H keys all ratios sit near 1× —
    * the report proves it rather than assuming it.
    *
    * Scale shape: one hash agg per keyspace (map-side combine) over the
    * key, then a 1-row stats agg of the per-key counts; five such pairs
    * unioned. Never wider than the key cardinality. p99 is exact
    * `percentile` ≡ `quantile_cont` (the suite's pinned pair), emitted
    * as round(…, 6) DOUBLE — never CAST double→int, whose rounding
    * direction differs between engines. int64 note: the max·keys·1e6
    * product needs DECIMAL(38,0) past ~10⁹ distinct keys (q147 recipe).
    */
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    def one(name: String, df: DataFrame,
        key: org.apache.spark.sql.Column): DataFrame =
      df.groupBy(key.as("k")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_keys"), sum(col("c")).as("n_rows"),
          max(col("c")).as("max_key_rows"),
          round(expr("percentile(c, 0.99d)"), 6).as("p99_key_rows"))
        .select(lit(name).as("keyspace"), col("n_rows"), col("n_keys"),
          col("max_key_rows"), col("p99_key_rows"),
          expr("max_key_rows * 1000000 div n_rows").as("top_share_ppm"),
          expr("max_key_rows * n_keys * 1000000 div n_rows").as("skew_x_ppm"))
    one("lineitem.l_orderkey", t.lineitem, col("l_orderkey"))
      .unionByName(one("lineitem.l_partkey", t.lineitem, col("l_partkey")))
      .unionByName(one("lineitem.l_suppkey", t.lineitem, col("l_suppkey")))
      .unionByName(one("orders.o_custkey", t.orders, col("o_custkey")))
      .unionByName(one("events.user_id", t.events, col("user_id")))
  }

  private val skewReportSql = {
    def one(name: String, table: String, key: String) =
      s"""SELECT '$name' AS keyspace,
         |  CAST(SUM(c) AS BIGINT) AS n_rows,
         |  CAST(COUNT(*) AS BIGINT) AS n_keys,
         |  CAST(MAX(c) AS BIGINT) AS max_key_rows,
         |  round(quantile_cont(c, 0.99), 6) AS p99_key_rows,
         |  CAST(MAX(c) * 1000000 // SUM(c) AS BIGINT) AS top_share_ppm,
         |  CAST(MAX(c) * COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS skew_x_ppm
         |FROM (SELECT $key AS k, COUNT(*) AS c FROM $table GROUP BY 1)""".stripMargin
    Seq(
      one("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      one("lineitem.l_partkey", "lineitem", "l_partkey"),
      one("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      one("orders.o_custkey", "orders", "o_custkey"),
      one("events.user_id", "events", "user_id")).mkString("\nUNION ALL\n")
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q212_skew_report", skewReport, Some(skewReportSql)),
    QueryDef("q78_salted_skew_join", saltedSkewJoin, Some(saltedSkewJoinSql)),
    QueryDef("q101_two_phase_skew_agg", twoPhaseSkewAgg, Some(twoPhaseSkewAggSql)),
  )
}
