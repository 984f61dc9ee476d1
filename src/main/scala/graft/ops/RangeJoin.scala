package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Range (interval-proximity) join composed from bucketed equi-joins.
  *
  * Spark turns a plain `|a.t - b.t| <= delta` join condition into a
  * BroadcastNestedLoopJoin / cartesian — quadratic. The composition
  * quantizes time into `delta`-sized buckets, explodes ONE side into its
  * bucket and the two adjacent buckets, equi-joins on (key, bucket), and
  * re-applies the exact predicate. Every candidate pair falls in adjacent
  * buckets, so the equi-join is exhaustive; pair generation is bounded by
  * per-bucket density, and the bucket key is the shuffle key (AQE/salting
  * applies). Same preference-ladder reasoning as [[AsOf]]: composition
  * before custom plan nodes.
  */
object RangeJoin {

  /** Pairs of (left, right) rows sharing `key` with
    * `|leftTime - rightTime| <= delta` (time unit = the columns' unit).
    */
  def withinDelta(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, delta: Long): DataFrame = {
    val l = left.withColumn("__b",
      explode(array(
        (col(leftTime) / delta).cast("long") - 1,
        (col(leftTime) / delta).cast("long"),
        (col(leftTime) / delta).cast("long") + 1)))
    val r = right.withColumn("__b", (col(rightTime) / delta).cast("long"))
    l.join(r, Seq(key, "__b"))
      .filter(abs(col(leftTime) - col(rightTime)) <= delta)
      .drop("__b")
  }
}
