package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.{Exact, OracleSql => O}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream batch queries — the batch twins of the Structured Streaming
  * pipelines in [[graft.streaming.EventStreams]] (SURVEY.md §2.10: the
  * reference's "streaming" is incremental batch; we provide both). Tumbling
  * windows here use the same `window()` semantics the streaming job uses, so
  * batch and streaming results are directly comparable.
  */
object EventsQ {

  /** Tumbling 1-hour window aggregate (streaming-parity shape:
    * `readStream.groupBy(window($"ts", "1 hour"), ...)`).
    */
  def hourlyWindow(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Exact.dsum(col("value")).as("total_value"))
      .select(unix_micros(col("window.start")).as("hour_start_us"),
        col("event_type"), col("n_events"), col("total_value"))
  }

  private val hourlyWindowSql =
    s"""SELECT epoch_us(date_trunc('hour', ts)) AS hour_start_us, event_type,
       |  COUNT(*) AS n_events, ${O.dsum("value")} AS total_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** Per-user running totals over the stream — frame-spec window (running
    * sum), the batch shape of stateful per-key streaming aggregation.
    */
  def runningValue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = Tables(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("running_value",
        sum(col("value").cast("decimal(18,2)")).over(w).cast("double"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"), col("running_value"))
  }

  private val runningValueSql =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
      |FROM events""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q42_hourly_window", hourlyWindow, Some(hourlyWindowSql)),
    QueryDef("q43_running_value", runningValue, Some(runningValueSql)),
  )
}
