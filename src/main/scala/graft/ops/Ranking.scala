package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

/** Distributed EXACT ranking — the scale path for per-group
  * `row_number()` when the grouping key has tiny cardinality.
  *
  * A window `PARTITION BY g ORDER BY k` ships every row of group g into
  * ONE task: with three groups (q98's l_returnflag) the rank sort runs
  * 3-way parallel no matter how many executors exist — the one
  * parallelism ceiling the round-14 whole-suite 10× pass surfaced
  * (BASELINE round 14: q98 grows ~n·log n with no fan-out to recover
  * it). At 100 TB that window is a hard wall.
  *
  * [[rowNumber]] computes the SAME rank (bit-identical: the order key
  * must be a strict total order per group, i.e. carry a unique
  * tiebreak) in two phases, classic distributed sort-rank:
  *
  *  1. range-repartition by (group ++ order) into `numParts` and sort
  *     within partitions — each task then holds a CONTIGUOUS span of
  *     each group's total order;
  *  2. one local pass assigns per-(partition, group) indexes; a
  *     partitions×groups-row aggregate (tiny: it never exceeds
  *     `numParts · |groups|`) yields each span's global OFFSET via a
  *     running sum, broadcast-joined back.
  *
  * Rank = offset + local index. Partition BOUNDARIES come from range
  * sampling and are not run-stable, but the final rank is the row's
  * position in a strict total order — boundary-independent, therefore
  * deterministic (the q99-class reproducibility contract).
  *
  * Cost shape: one range shuffle + one tiny agg + one broadcast join,
  * all `numParts`-way parallel — versus the window's one hash shuffle
  * into |groups| tasks. Slower at toy scale, unbounded fan-out at
  * 100 TB. The reference has no ranking surface (SURVEY §2.11 —
  * beyond-reference, like Percentiles' Exact/Approx/Auto knob).
  */
object Ranking {

  /** Self-delimiting field encoding for the composite group key:
    * `n:` for NULL, `v<len>:<value>` otherwise — injective for ANY
    * column values including nulls, empty strings, and strings
    * containing a would-be separator, so multi-column groups never
    * share a rank space.
    */
  private def encodeField(c: Column): Column = {
    val s = c.cast("string")
    when(s.isNull, lit("n:"))
      .otherwise(concat(lit("v"), length(s).cast("string"), lit(":"), s))
  }

  /** Append column `rnCol` = 1-based rank of each row within its
    * `group`, ordered by `order` (which MUST be a strict total order
    * within every group — duplicate keys would make ranks depend on
    * partition boundaries, so correctness REQUIRES a unique tiebreak).
    */
  def rowNumber(df: DataFrame, group: Seq[Column], order: Seq[Column],
      rnCol: String, numParts: Int): DataFrame = {
    require(group.nonEmpty && order.nonEmpty && numParts >= 1)
    // injective STRING group key (see encodeField): a bare concat would
    // collide for multi-column groups (("a","bc") vs ("ab","c")); a
    // separator-based concat_ws SKIPS nulls (("a", null) merges with
    // ("a")) and collides when values contain the separator
    val keyed = df
      .withColumn("__rk_g", concat(group.map(encodeField): _*))
    val sorted = keyed
      .repartitionByRange(numParts, (col("__rk_g") +: order): _*)
      .sortWithinPartitions((col("__rk_g") +: order): _*)
    val schema = StructType(sorted.schema.fields ++ Seq(
      StructField("__rk_pid", IntegerType, nullable = false),
      StructField("__rk_local", LongType, nullable = false)))
    val gIdx = sorted.schema.fieldIndex("__rk_g")
    // phase-1 local pass: per-(partition, group) running index — rows
    // arrive sorted, so one counter per group change suffices
    val local = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var curG: String = null
      var n = 0L
      it.map { r =>
        val g = r.getString(gIdx)
        if (g != curG) { curG = g; n = 0L }
        n += 1
        Row.fromSeq(r.toSeq ++ Seq[Any](pid, n)) // Seq(pid, n) would widen
      }
    }(org.apache.spark.sql.Encoders.row(schema))
      // MATERIALIZE before branching (round-15 fix, ADVICE r15 form):
      // `local` feeds BOTH the span aggregate and the final join, and
      // RangePartitioner samples its boundaries with a plan-instantiation-
      // dependent seed — if physical planning does NOT reuse the exchange
      // (observed under AQE + coalesce(1): Verify's exact write path), the
      // two branches range-partition DIFFERENTLY and the (group, pid) inner
      // join silently drops every row whose span moved (q143 kept 70 of 500
      // rows). persist() pins ONE cached RDD instance — hence ONE exchange
      // execution and ONE sampled boundary set — for both readers, and
      // unlike the round-15 localCheckpoint it stays FAULT-TOLERANT at
      // cluster scale: a lost executor recomputes the cached partition
      // through the same lineage (same shuffle dependency, same partitioner
      // instance, so identical boundaries) instead of failing the query.
      // The eager count below materializes it up front — the classic
      // distributed sort-rank shape (TeraSort), one extra write of the
      // ranked table, still numParts-way parallel.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    local.count()
    // phase-2: span sizes -> per-(group, pid) global offsets. The agg is
    // partitions×groups rows; the running sum windows over THAT tiny
    // table, never the data
    val spans = local.groupBy(col("__rk_g"), col("__rk_pid"))
      .agg(max(col("__rk_local")).as("__rk_cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__rk_g")).orderBy(col("__rk_pid"))
      .rowsBetween(Long.MinValue, -1)
    val offsets = spans.withColumn("__rk_off",
      coalesce(sum(col("__rk_cnt")).over(w), lit(0L)))
      .drop("__rk_cnt")
    local
      .join(broadcast(offsets), Seq("__rk_g", "__rk_pid"))
      .withColumn(rnCol, col("__rk_off") + col("__rk_local"))
      .drop("__rk_g", "__rk_pid", "__rk_local", "__rk_off")
  }
}
