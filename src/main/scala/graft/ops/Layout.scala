package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

/** Write-side data layout operators: sorted/Z-ordered parquet for row-group
  * skipping, and small-file compaction (VERDICT r01 item 10 — the 100-TB
  * write-side story).
  *
  * Why this matters at scale: parquet footers carry per-row-group min/max
  * stats. A scan with a pushed predicate skips any row group whose range
  * can't match — but only if the write CLUSTERED the data so ranges are
  * narrow. `sortedWrite` (range-partition + in-partition sort on the filter
  * columns) yields near-disjoint ranges per file; `zorderWrite` interleaves
  * two dimensions onto a Morton curve so BOTH columns prune, at modest cost
  * to each. Both are one extra shuffle at write time, bought back on every
  * subsequent scan.
  */
object Layout {

  /** Range-cluster + sort + write: rows land in `files` parquet files with
    * near-disjoint `sortCols` ranges (maximal row-group skipping for
    * predicates on those columns).
    */
  def sortedWrite(df: DataFrame, path: String, sortCols: Seq[String],
      files: Int): Unit = {
    val cols = sortCols.map(col)
    df.repartitionByRange(files, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Morton (Z-order) interleave of two non-negative long columns at `bits`
    * bits each — a pure codegen bit-fold, no UDF: bit i of x lands at 2i,
    * bit i of y at 2i+1.
    */
  def morton(x: Column, y: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Scale a numeric column to [0, 2^bits) rank space using global min/max
    * attached via a 1-row broadcast (the A6 snapshot pattern — no driver
    * collect in the plan).
    */
  private def scaled(c: Column, minC: Column, maxC: Column, bits: Int): Column = {
    val span = maxC.cast("double") - minC.cast("double")
    val unit = when(span > 0.0, (c.cast("double") - minC.cast("double")) / span)
      .otherwise(lit(0.0))
    least(floor(unit * ((1L << bits) - 1)).cast("long"), lit((1L << bits) - 1))
  }

  /** Z-order write on two numeric columns: scale each to 16-bit rank space
    * (min/max from one broadcast aggregate), Morton-interleave, then
    * range-cluster + sort on the Z value. Predicates on EITHER column skip
    * row groups, unlike a single-column sort.
    */
  def zorderWrite(df: DataFrame, path: String, c1: String, c2: String,
      files: Int, bits: Int = 16): Unit = {
    // reserved internal working columns — refuse rather than silently
    // replace/ambiguate a caller column (same guard as AsOf/RangeJoin)
    for (c <- Seq("__z", "__min1", "__max1", "__min2", "__max2"))
      require(!df.columns.contains(c),
        s"input column '$c' collides with a zorderWrite internal working column")
    val stats = df.agg(
      min(col(c1)).as("__min1"), max(col(c1)).as("__max1"),
      min(col(c2)).as("__min2"), max(col(c2)).as("__max2"))
    val z = morton(
      scaled(col(c1), col("__min1"), col("__max1"), bits),
      scaled(col(c2), col("__min2"), col("__max2"), bits), bits)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__min1", "__max1", "__min2", "__max2")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction (S7 at rest): rewrite a parquet directory into
    * `targetFiles` files via an atomic-per-file directory swap — read to a
    * side directory, then replace. Preserves an optional sort layout.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int,
      sortCols: Seq[String] = Nil): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = path.stripSuffix("/") + "__compacting"
    val old = path.stripSuffix("/") + "__precompact"
    val df = spark.read.parquet(path)
    if (sortCols.nonEmpty) sortedWrite(df, tmp, sortCols, targetFiles)
    else df.repartition(targetFiles).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Swap with the original parked ASIDE, never deleted first: a crash
    // between steps leaves either the original or both copies on disk —
    // at no instant is `path`'s data unrecoverable. Delete-then-rename
    // would lose the dataset if the rename failed or the JVM died between.
    fs.delete(new Path(old), true) // leftover from a previous failed swap
    if (!fs.rename(new Path(path), new Path(old)))
      throw new java.io.IOException(s"compaction park failed: $path -> $old")
    if (!fs.rename(new Path(tmp), new Path(path))) {
      val rolledBack = fs.rename(new Path(old), new Path(path))
      throw new java.io.IOException(
        s"compaction swap failed: $tmp -> $path" + (
          if (rolledBack) " (original restored)"
          else s"; ROLLBACK ALSO FAILED — data is parked at $old"))
    }
    fs.delete(new Path(old), true)
  }

  /** Rows the parquet reader actually surfaced for `df`'s scan (after
    * row-group pruning) — the observable the layout exists to minimize.
    * Materializes `df`'s OWN executedPlan by draining its RDD with a
    * no-op foreach — a write, `count()`, or even `foreachPartition`
    * would each spawn a separate QueryExecution whose metrics `df`
    * never sees, and `collect()` (the previous implementation) ships
    * every row to the driver, which would OOM on real data. SQL metric
    * accumulators flow back on task completion regardless, so nothing
    * needs to reach the driver — then reads the scan leaves'
    * numOutputRows, descending through AQE wrappers.
    */
  def scanRowsAfterPruning(df: DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    def leaves(p: SparkPlan): Seq[SparkPlan] = p.collectLeaves().flatMap {
      case a: AdaptiveSparkPlanExec => leaves(a.executedPlan)
      case l => Seq(l)
    }
    leaves(df.queryExecution.executedPlan)
      .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }
}
