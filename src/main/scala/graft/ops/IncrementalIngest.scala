package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** High-watermark incremental ingest (SURVEY.md §2.10, E1).
  *
  * Re-expresses `go-incremental-ingest-elt.py`: per-table bookmark →
  * watermark-filtered source read (predicate pushed into the scan, the
  * parquet analog of the reference's JDBC subquery pushdown, `:162-165`) →
  * latest-row-per-key dedupe (W1, `:207-212`) → lineage columns (`:201-205`)
  * → partitioned parquet write (`:224-233`) → bookmark advance ONLY after a
  * durable write (`:293-303` — the ordering that makes re-runs safe).
  *
  * The bookmark store is pluggable (local FS here; any shared KV/object
  * store in production). Watermarks are epoch-micros longs — total order,
  * timezone-free.
  */
trait BookmarkStore {
  def get(table: String): Option[Long]
  def put(table: String, watermark: Long): Unit
}

/** Atomic file-per-table bookmark store (write temp + move). */
final class FsBookmarkStore(dir: String) extends BookmarkStore {
  Files.createDirectories(Paths.get(dir))

  private def path(table: String) = Paths.get(dir, s"$table.bookmark")

  override def get(table: String): Option[Long] = {
    val p = path(table)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim.toLong)
    else None
  }

  override def put(table: String, watermark: Long): Unit = {
    val tmp = Paths.get(dir, s".${table}.tmp")
    Files.write(tmp, watermark.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

final case class IngestResult(table: String, rowsWritten: Long,
    previousWatermark: Option[Long], newWatermark: Option[Long])

object IncrementalIngest {

  /** Partition-level upsert: merge `updates` into the partitioned table at
    * `path`, keeping the latest row per business key, rewriting ONLY the
    * partitions the updates touch (dynamic partition overwrite). This is the
    * parquet-native MERGE for incremental pipelines: at 100 TB a nightly
    * batch touches a handful of date partitions — full-table rewrites are
    * not an option, and append-only leaves stale versions.
    *
    * INVARIANT: a business key's partition value is immutable (e.g. an
    * event date). An update that MOVES a pk to a different partition leaves
    * the old partition's version in place (only touched partitions are read
    * back and rewritten) — standard for partition-scoped merges; mutable
    * partition values need a full-key merge instead.
    *
    * @param partitionCol value-bearing partition column present in both
    *                     existing data and updates
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession,
      updates: DataFrame, path: String, partitionCol: String,
      pks: Seq[String], wmCol: String): Unit = {
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val touched = updates.select(col(partitionCol)).distinct()
      val existing =
        if (Files.exists(Paths.get(path)))
          // only the touched partitions are read back (broadcast semi join
          // prunes on the partition column) and merged; the partition column
          // is re-cast because read-back partition inference may widen it
          spark.read.parquet(path)
            .withColumn(partitionCol,
              col(partitionCol).cast(updates.schema(partitionCol).dataType))
            .join(broadcast(touched), Seq(partitionCol), "left_semi")
        else updates.limit(0)
      // tiebreak equal watermarks deterministically via a content hash of the
      // full row (pk columns alone are constant within the window partition)
      val w = Window.partitionBy(pks.map(col): _*)
        .orderBy(col(wmCol).desc_nulls_last,
          xxhash64(updates.columns.toIndexedSeq.map(col): _*).desc)
      val merged = existing.unionByName(updates.select(existing.columns.toIndexedSeq.map(col): _*))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__rn")
        // cut lineage so the write doesn't reference the path it overwrites
        .localCheckpoint(true)
      merged.write.mode(SaveMode.Overwrite)
        .partitionBy(partitionCol)
        .parquet(path)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  /** One incremental ingest round for `source`.
    *
    * Null-watermark rows ride along in the FIRST full load (no bookmark
    * yet) but are invisible to every later watermark-filtered round — and a
    * batch whose watermarks are ALL null skips the write entirely (no
    * watermark to advance). A null wm is an unresolvable position in the
    * change stream; feed such rows through a full-reload path instead.
    *
    * @param wmCol        watermark column, must be castable to epoch-micros
    *                     via `unix_micros` (timestamp) — strictly increasing
    *                     per new data batch
    * @param pks          business keys for the latest-row dedupe
    * @param partitionBy  output partition columns (e.g. ingest_date)
    */
  def ingest(source: DataFrame, table: String, wmCol: String, pks: Seq[String],
      store: BookmarkStore, outPath: String,
      partitionBy: Seq[String] = Seq("ingest_date"),
      outputFiles: Int = 8): IngestResult = {
    val prev = store.get(table)

    // watermark predicate — pushed to the source scan like the reference's
    // `WHERE wm > '<last>'` subquery
    val fresh = prev match {
      case Some(us) => source.filter(unix_micros(col(wmCol)) > us)
      case None => source
    }

    // W1: keep latest row per business key; equal watermarks tie-break on a
    // content hash of the full row (pk columns are constant within the
    // window partition, so they cannot break ties)
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy(col(wmCol).desc_nulls_last,
        xxhash64(source.columns.toIndexedSeq.map(col): _*).desc)
    val deduped = fresh
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")

    // lineage columns (ingest_ts is the batch watermark read time — pinned
    // per run, not per row, so outputs are reproducible)
    val withLineage = deduped
      .withColumn("source_table", lit(table))
      .withColumn("ingest_date", date_format(col(wmCol), "yyyy-MM-dd"))

    // cache the deduped batch: the watermark probe, the write, and the row
    // count all reuse one materialization instead of re-scanning the source
    // three times (at cluster scale this batch is the small increment, not
    // the full table — caching it is cheap)
    val batch = withLineage.cache()
    try {
      val newWmRow = batch.agg(max(unix_micros(col(wmCol)))).collect()(0)
      val newWm = if (newWmRow.isNullAt(0)) None else Some(newWmRow.getLong(0))

      val rows =
        if (newWm.isEmpty) 0L
        else {
          batch
            .coalesce(outputFiles)
            .write.mode(SaveMode.Append)
            .partitionBy(partitionBy: _*)
            .parquet(outPath)
          batch.count()
        }

      // bookmark advances ONLY after the write above returned durably
      newWm.foreach(store.put(table, _))
      IngestResult(table, rows, prev, newWm.orElse(prev))
    } finally batch.unpersist()
  }
}
