package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (point-in-time) join — for each left row, the latest right row with
  * `rightTime <= leftTime` on the same key.
  *
  * Spark lacks this operator; per the preference ladder (compose > custom
  * Expression > custom plan node) it composes from existing ops: tag both
  * sides, UNION, and run one `last(_, ignoreNulls)` window ordered by
  * (time, side, tiebreak) carrying right-side values forward. This is the
  * scalable formulation — one shuffle on the key, sequential scan within
  * partitions, no range-explosion crossJoin, and it inherits AQE/skew
  * handling like any window. A custom `SparkPlan` would only add value if
  * the sort could be avoided (it can't — as-of is inherently ordered).
  *
  * Right side must be unique per (key, time) — pre-dedupe with
  * latest-per-key if needed (ties are otherwise ambiguous in ANY engine).
  */
object AsOf {

  /** @param left       probe rows; all columns preserved
    * @param right      state rows; `valueCols` are carried to the output
    *                   (nulled when no right row precedes the probe)
    * @param key        equi-join key column present on both sides
    * @param leftTime   ordering column on left (e.g. epoch micros)
    * @param rightTime  ordering column on right, same unit
    * @param valueCols  right-side columns to attach
    */
  /** Internal working columns — reserved: `withColumn` would silently
    * REPLACE a caller column of the same name and corrupt the result.
    */
  private val reserved = Seq("__t", "__side", "__v", "__c")

  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, valueCols: Seq[String]): DataFrame = {
    for (c <- reserved; side <- Seq(left, right))
      require(!side.columns.contains(c),
        s"input column '$c' collides with an AsOf internal working column")
    val lCols = left.columns
    // right-side values travel as ONE struct that is non-null exactly for
    // right rows — so `last(_, ignoreNulls)` skips left rows but still
    // carries a right row whose individual value columns are null (a
    // legitimately-null state value must NOT fall back to older state)
    val vstruct = struct(valueCols.map(col): _*)
    // side 0 sorts before side 1 at equal times ⇒ right rows at t are
    // visible to left rows at t (ASOF's `>=` semantics)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        lCols.filterNot(_ == key).map(col) :+
        lit(null).cast(right.select(vstruct).schema.head.dataType).as("__v"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col("__t"), col("__side")) ++
        lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        vstruct.as("__v"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__c", last(col("__v"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(lCols.toIndexedSeq.map(col) ++
        valueCols.map(c => col(s"__c.$c").as(s"asof_$c")): _*)
  }
}
