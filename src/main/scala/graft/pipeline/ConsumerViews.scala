package graft.pipeline

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query facade over the written metrics layers — re-expresses the
  * dashboard consumer's views (`streamlit/go_streamlit.py`: partitioned
  * reads `:37-55`, top-k `:163-177,232,602-603`, RFM×CLV / RFM×profile
  * merges `:259-264,340`) as engine queries, so reporting reads the
  * partitioned parquet directly (partition pruning on `restaurant_id`)
  * instead of pandas-concatenating files (SURVEY.md §7.1 step 9).
  */
final class ConsumerViews(spark: SparkSession, metricsRoot: String) {

  private def metric(subject: String): DataFrame =
    spark.read.parquet(s"$metricsRoot/$subject")

  /** Top-k restaurants by a metric column (TakeOrderedAndProject, the
    * scalable `sort_values().head(k)`).
    */
  def topRestaurants(k: Int = 10, by: String = "total_revenue"): DataFrame =
    metric("top_locations")
      .orderBy(col(by).desc, col("restaurant_id"))
      .limit(k)

  /** RFM × CLV-bucket inner merge on the customer key
    * (`go_streamlit.py:259-264`).
    */
  def rfmWithClv(): DataFrame =
    metric("rfm").join(
      metric("clv_buckets").select(col("restaurant_id"), col("customer_id"),
        col("clv"), col("clv_bucket")),
      Seq("restaurant_id", "customer_id"))

  /** RFM × activity-profile inner merge (`go_streamlit.py:340`). */
  def rfmWithActivity(): DataFrame =
    metric("rfm").join(
      metric("activity_profile").select(col("restaurant_id"), col("customer_id"),
        col("avg_order_gap"), col("activity_tag")),
      Seq("restaurant_id", "customer_id"))

  /** Single-restaurant drill-down — the filter lands on the partition
    * column, so only that restaurant's files are read.
    */
  def restaurantTrends(restaurantId: String, grain: String = "daily"): DataFrame =
    metric(s"sales_trends_$grain").filter(col("restaurant_id") === restaurantId)
}
