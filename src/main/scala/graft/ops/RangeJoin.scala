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
    * Time columns are internally disambiguated, so `leftTime` and
    * `rightTime` may share a name (e.g. both `ts`).
    */
  def withinDelta(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, delta: Long): DataFrame = {
    // reserved internal working columns — refuse rather than silently
    // replace a caller column of the same name
    for (c <- Seq("__b", "__lt", "__rt"); side <- Seq(left, right))
      require(!side.columns.contains(c),
        s"input column '$c' collides with a RangeJoin internal working column")
    val l = left
      .withColumn("__lt", col(leftTime))
      .withColumn("__b",
        explode(array(
          (col(leftTime) / delta).cast("long") - 1,
          (col(leftTime) / delta).cast("long"),
          (col(leftTime) / delta).cast("long") + 1)))
    val r0 = right.withColumn("__rt", col(rightTime))
    // right-side columns whose names collide with the left side come out
    // prefixed `right_` (nothing is silently dropped)
    val collisions = r0.columns.toSet.intersect(l.columns.toSet) - key - "__rt"
    val r = collisions.foldLeft(r0)((df, c) => df.withColumnRenamed(c, s"right_$c"))
      .withColumn("__b", (col("__rt") / delta).cast("long"))
    l.join(r, Seq(key, "__b"))
      .filter(abs(col("__lt") - col("__rt")) <= delta)
      .drop("__b", "__lt", "__rt")
  }
}
