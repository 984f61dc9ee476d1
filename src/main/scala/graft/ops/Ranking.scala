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
  *  2. one local pass assigns per-(partition, group) indexes; the SAME
  *     job that materializes that pass into the cache returns each
  *     partition's (group, span size) run-lengths as its task RESULTS
  *     (exactly-once, unlike accumulators updated inside
  *     transformations), so the driver computes each span's global
  *     OFFSET with a running sum over a `numParts · |groups|`-sized
  *     array — no second read of the ranked table (VERDICT r16 item 2:
  *     the old span aggregate re-scanned the whole persisted frame) —
  *     and broadcast-joins the offsets back.
  *
  * Rank = offset + local index. Partition BOUNDARIES come from range
  * sampling and are not run-stable, but the final rank is the row's
  * position in a strict total order — boundary-independent, therefore
  * deterministic (the q99-class reproducibility contract).
  *
  * Driver footprint: the collected span list is `numParts · |groups|`
  * tuples — the same bound the offsets table always had (it was
  * broadcast, i.e. driver-sized, in every prior shape). The contract
  * stands: tiny group cardinality.
  *
  * Fault tolerance (VERDICT r16 item 4): the offsets are computed from
  * the FIRST materialization's partition boundaries, so they stay valid
  * across cache loss only if a recompute reproduces those boundaries.
  * It does — the final join's plan references the same cached RDD
  * lineage, whose shuffle dependency holds ONE RangePartitioner
  * instance: a lost (or wholly evicted — RankingSpec evicts every
  * cached block mid-query) partition recomputes through that same
  * partitioner, landing every row in its original span.
  *
  * Cost shape: one range shuffle + one cache-materializing pass +
  * one broadcast join, all `numParts`-way parallel — versus the
  * window's one hash shuffle into |groups| tasks. Slower at toy scale,
  * unbounded fan-out at 100 TB. The reference has no ranking surface
  * (SURVEY §2.11 — beyond-reference, like Percentiles' Exact/Approx/
  * Auto knob).
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
    // phase-1 local index, all codegen (r19): after the range shuffle +
    // in-partition sort, `monotonically_increasing_id()` is
    // (partition id << 33) + a 0-based per-row counter that follows the
    // sort order — so within every (partition, group) span,
    // `mid - min(mid over the span)` IS the local rank index. The former
    // shape computed the same index with a RowEncoder mapPartitions (every
    // row deserialized to an external Row and back) plus a second
    // RDD-based span scan; both passes are replaced by columnar codegen
    // and one numParts·|groups|-row aggregate. A partition would need
    // 2^33 rows to overflow the counter into the pid bits — 8.6 B rows
    // per task, far past any sane split sizing.
    val sorted = keyed
      .repartitionByRange(numParts, (col("__rk_g") +: order): _*)
      .sortWithinPartitions((col("__rk_g") +: order): _*)
      .withColumn("__rk_mid", monotonically_increasing_id())
      .withColumn("__rk_pid",
        shiftright(col("__rk_mid"), 33).cast(IntegerType))
      // MATERIALIZE before branching (round-15 fix, ADVICE r15 form):
      // `sorted` feeds BOTH the span-offset side and the final join, and
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
      // instance, so identical boundaries, and mid/pid re-derive from the
      // same in-partition positions) instead of failing the query.
      // RankingSpec's eviction case pins exactly that: clear every cached
      // block after the offsets are captured and the recompute still
      // matches the window oracle bit-for-bit.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase-2: per-(group, partition) span min-id and size via a pruned
    // columnar aggregate over the cache-materializing read (the action
    // that populates the persist), collected driver-side —
    // ≤ numParts·|groups| rows, the same driver bound as always.
    val spans: Array[(String, Int, Long, Long)] = sorted
      .groupBy(col("__rk_g"), col("__rk_pid"))
      .agg(min(col("__rk_mid")).as("__rk_mn"), count(lit(1)).as("__rk_cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // driver-side running sum over the spans → per-span global offset;
    // spans of one group are ordered by pid, which IS the group's total
    // order across partitions (range partitioning keeps keys contiguous)
    val offsetRows: Seq[Row] = spans.groupBy(_._1).toSeq.flatMap {
      case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._2).map { case (_, pid, mn, cnt) =>
          val off = acc; acc += cnt; Row(g, pid, mn, off)
        }
    }
    val offSchema = StructType(Seq(
      StructField("__rk_g", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("__rk_pid", IntegerType, nullable = false),
      StructField("__rk_mn", LongType, nullable = false),
      StructField("__rk_off", LongType, nullable = false)))
    val offsets = df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offsetRows).asJava, offSchema)
    sorted
      .join(broadcast(offsets), Seq("__rk_g", "__rk_pid"))
      .withColumn(rnCol,
        col("__rk_off") + (col("__rk_mid") - col("__rk_mn")) + lit(1L))
      .drop("__rk_g", "__rk_pid", "__rk_mid", "__rk_mn", "__rk_off")
  }
}
