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

  /** Sidebar restaurant selector: sorted union of ids present in the RFM
    * and CLV layers (`go_streamlit.py:204-207` — the dashboard unions the
    * two pandas id sets so a restaurant appearing in either layer is
    * selectable). Distinct-union-distinct over two partition-column
    * projections: each side is a metadata-cheap scan of just the
    * partition values, and the union dedupes map-side before one tiny
    * shuffle.
    */
  def restaurantIds(): DataFrame =
    metric("rfm").select(col("restaurant_id").cast("string"))
      .union(metric("clv").select(col("restaurant_id").cast("string")))
      .where(col("restaurant_id").isNotNull)
      .distinct()
      .orderBy(col("restaurant_id"))

  /** One restaurant's RFM table sorted by recency ascending — the
    * dashboard's default customer list (`go_streamlit.py:244-246`:
    * most-recently-active customers first; recency = days since last
    * order, so ascending = freshest first). The restaurant filter prunes
    * to one partition; the sort orders only that restaurant's customers
    * (ties broken by customer_id so the listing is deterministic).
    */
  def customersByRecency(restaurantId: String): DataFrame =
    metric("rfm").filter(col("restaurant_id") === restaurantId)
      .orderBy(col("recency"), col("customer_id"))
}
