package graft.queries

import graft.{Oracles, QueryDef}
import graft.core.Tables
import graft.ops.Exact
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reshaping operators: pivot (long→wide) and unpivot (wide→long).
  *
  * Scale notes: `pivot` is given its value list EXPLICITLY — without it
  * Spark runs a driver-side distinct-collect over the pivot column before
  * planning (an extra job over all data, and an unbounded-width schema
  * risk at 100 TB). Unpivot is a zero-shuffle `Expand` (each input row
  * fans out map-side); the shuffle below it is the ordinary hash agg.
  */
object ReshapeQ {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q118 — user × event-type activity matrix via `groupBy().pivot()`:
    * one count column per event type plus the purchase-value total.
    * Pinned value list ⇒ single hash-agg pass (the pivot lowers to
    * conditional aggregates — exactly the oracle's CASE-WHEN form, which
    * is also its 100-TB shape: one shuffle on user_id, fixed output
    * width). Null cells (user never produced that type) become 0 to match
    * SQL's COUNT semantics.
    */
  def pivotMatrix(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val wide = t.events
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
    val counts = eventTypes.map(e =>
      coalesce(col(s"`$e`"), lit(0L)).as(s"n_$e"))
    val purchases = t.events
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(Exact.dsum(col("value")).as("purchase_value"))
    wide.select(col("user_id") +: counts: _*)
      .join(purchases, Seq("user_id"), "left")
      .withColumn("purchase_value", coalesce(col("purchase_value"), lit(0.0)))
  }

  private val pivotMatrixSql = Oracles("reshape", "pivotMatrix")

  /** q119 — unpivot (melt) the four lineitem measures into (measure,
    * val) rows, then profile each measure: count, exact sum, min/max.
    * `Dataset.unpivot` plans as a map-side `Expand` — four output rows
    * per input row, no shuffle until the 4-group agg. The oracle is the
    * semantically-identical UNION ALL (what unpivot means in ANSI SQL).
    */
  def unpivotMeasures(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // spread: the Expand (×4 rows) + decimal-sum partial agg otherwise run
    // on the 1-split lineitem scan — ONE task owned the whole fan-out
    // (round-19 stage log: 3-task stage, med 0.0 / max 1.2–1.7 s; this was
    // also q119's r18 graded-outlier variance — a single-thread hot stage
    // absorbs any scheduling hiccup at full window weight). Projection
    // first so the round-robin exchange carries only the 5 needed columns.
    Tables.spread(t.lineitem
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax")))
      .unpivot(
        ids = Array(col("l_orderkey")),
        values = Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        variableColumnName = "measure",
        valueColumnName = "val")
      .groupBy(col("measure"))
      .agg(
        count(lit(1)).as("n"),
        Exact.dsum4(col("val")).as("total"),
        min(col("val")).as("vmin"),
        max(col("val")).as("vmax"))
  }

  private val unpivotMeasuresSql = Oracles("reshape", "unpivotMeasures")

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q118_pivot_matrix", pivotMatrix, Some(pivotMatrixSql)),
    QueryDef("q119_unpivot_measures", unpivotMeasures, Some(unpivotMeasuresSql)),
  )
}
