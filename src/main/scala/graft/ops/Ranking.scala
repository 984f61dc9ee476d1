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
      // `local` feeds BOTH the span-offset side and the final join, and
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
      // RankingSpec's eviction case pins exactly that: clear every cached
      // block after the offsets are captured and the recompute still
      // matches the window oracle bit-for-bit.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // phase-2 (VERDICT r16 item 2): capture per-(group, partition) span
    // sizes in the SAME job that materializes the cache. Rows arrive
    // group-contiguous and __rk_local-increasing, so a span's size is the
    // run's last __rk_local; collect() returns task RESULTS, which Spark
    // applies exactly-once across retries (accumulators inside
    // transformations may double-count — this is the safe variant of the
    // "fold the counts into the materializing action" rework). The old
    // shape re-read the whole persisted frame for a groupBy/max + window.
    // project to the three meta columns BEFORE the RDD conversion: the
    // columnar cache serves a pruned read and the per-row Row
    // materialization carries 3 fields, not the full data width (the
    // cache itself still materializes complete batches — this action is
    // what populates it)
    val spans: Array[(String, Int, Long)] = local
      .select(col("__rk_g"), col("__rk_pid"), col("__rk_local"))
      .rdd.mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Long)]
        var curG: String = null
        var pid = Int.MinValue
        var last = 0L
        it.foreach { r =>
          val g = r.getString(0)
          val p = r.getInt(1)
          // break the run on a GROUP or PID change: one iterator is one
          // cached partition today (pid constant), but if a future Spark
          // version ever merges cached partitions under this read, a
          // group spanning two pids in one iterator must still emit BOTH
          // spans — collapsing them would drop the first span's offset
          // row and silently lose rows at the final join (the q143 class)
          if (g != curG || p != pid) {
            if (curG != null) out += ((curG, pid, last))
            curG = g
            pid = p
          }
          last = r.getLong(2)
        }
        if (curG != null) out += ((curG, pid, last))
        out.iterator
      }.collect()
    // driver-side running sum over ≤ numParts·|groups| spans → offsets
    val offsetRows: Seq[Row] = spans.groupBy(_._1).toSeq.flatMap {
      case (g, arr) =>
        var acc = 0L
        arr.sortBy(_._2).map { case (_, pid, cnt) =>
          val off = acc; acc += cnt; Row(g, pid, off)
        }
    }
    val offSchema = StructType(Seq(
      StructField("__rk_g", org.apache.spark.sql.types.StringType, nullable = false),
      StructField("__rk_pid", IntegerType, nullable = false),
      StructField("__rk_off", LongType, nullable = false)))
    val offsets = df.sparkSession.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(offsetRows).asJava, offSchema)
    local
      .join(broadcast(offsets), Seq("__rk_g", "__rk_pid"))
      .withColumn(rnCol, col("__rk_off") + col("__rk_local"))
      .drop("__rk_g", "__rk_pid", "__rk_local", "__rk_off")
  }
}
