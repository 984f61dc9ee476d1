package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus maintenance: the continuously-ingesting twin of the
  * batch incremental-dedup operator (q120). Each micro-batch of documents
  * is paired against the fingerprint store accumulated by every PRIOR
  * batch ([[Dedup.incrementalPairs]] — new-new ∪ new-prior candidates,
  * prior-prior never re-expanded), then appends its own fingerprints to
  * the store. `foreachBatch` batches are sequential, so batch N always
  * sees the store state through batch N−1; with `Trigger.AvailableNow` +
  * a checkpoint, a re-run re-ingests nothing (source offsets live in the
  * checkpoint) and the at-least-once replay of an uncommitted batch is
  * IDEMPOTENT — both sinks partition by batch_id with dynamic overwrite,
  * so a replayed batch replaces its own partitions instead of appending
  * twice (the same design as [[EventStreams.incrementalParquetSink]]).
  *
  * Store layout note: the STREAMING store partitions by batch_id (the
  * idempotence key), not by band like the batch
  * [[Dedup.writeFingerprintStore]] — re-clustering by band is a periodic
  * compaction job ([[graft.ops.Layout]]'s park-aside swap), not a
  * per-batch cost. The end state is batch-count-invariant: the union of
  * per-batch incremental pairs equals the one-shot full-corpus pair set
  * (CorpusStreamsSpec proves 3-batch ≡ 1-shot ≡ q37's formulation).
  */
object CorpusStreams {

  /** Start the streaming incremental-dedup pipeline over a streaming
    * documents frame with (doc_id, text). Pairs land under `pairsPath`
    * partitioned by batch_id; fingerprints accumulate under `storePath`.
    */
  def incrementalDedup(docs: DataFrame, storePath: String, pairsPath: String,
      checkpoint: String, numHashes: Int = 8, rowsPerBand: Int = 2,
      maxBucketSize: Int = 4096): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val bands = Dedup.bandFingerprints(batch, "doc_id", "text",
          numHashes, rowsPerBand)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          // prior = every batch before this one; on replay, this batch's
          // own (possibly half-written) partition must be EXCLUDED or its
          // documents would pair against themselves as "prior".
          // Only the store's genuine ABSENCE (first batch) may fall back
          // to empty — an existence probe, not a broad catch: a corrupt
          // store, permission error, or transient FS failure must FAIL
          // the batch so Structured Streaming retries it. A blanket catch
          // here would silently commit a pair set missing all new-prior
          // pairs and advance the checkpoint past the loss permanently.
          val storeP = new org.apache.hadoop.fs.Path(storePath)
          val storeExists = storeP
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
            .exists(storeP)
          val prior =
            if (storeExists)
              spark.read.parquet(storePath)
                .filter(col("batch_id") =!= batchId).drop("batch_id")
            else
              spark.emptyDataset(org.apache.spark.sql.Encoders.product[
                (Long, Int, String)]).toDF("doc_id", "band", "band_key")
          Dedup.incrementalPairs(bands, prior, "doc_id", maxBucketSize)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairsPath)
          bands
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(storePath)
        } finally bands.unpersist()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming per-source DATA CARD maintenance — the continuously-
    * ingesting twin of the batch q159 card. Each micro-batch writes its
    * own (source, lang, text-hash) PARTIAL aggregate partitioned by
    * batch_id (dynamic overwrite ⇒ an at-least-once replay replaces its
    * own partition — idempotent, the store design above), and the card
    * itself is computed ON READ by merging partials
    * ([[readDatacard]]). This is the classic partial-agg log: the batch
    * never re-reads the corpus, the log is doc-VERSION-sized (not
    * event-sized), and periodic compaction of old batch partitions is
    * the same park-aside job as the fingerprint store's re-clustering.
    */
  def datacardPartials(docs: DataFrame, partialsPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .groupBy(col("source"), col("lang"),
            md5(col("text").cast("binary")).as("h"))
          .agg(count(lit(1)).as("c"), sum(col("n_chars")).as("chars"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(partialsPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Merge the partial-aggregate log back into the q159 card — the SAME
    * rollup code as the batch query (`CorpusStatsQ.datacardFromPre`), so
    * streaming and batch cards are definitionally identical
    * (CorpusStreamsSpec proves 3-batch ≡ one-shot).
    */
  def readDatacard(spark: org.apache.spark.sql.SparkSession,
      partialsPath: String): DataFrame = {
    val pre = spark.read.parquet(partialsPath)
      .groupBy(col("source"), col("lang"), col("h"))
      .agg(sum(col("c")).as("c"), sum(col("chars")).as("chars"))
    graft.queries.CorpusStatsQ.datacardFromPre(pre)
  }

  /** Streaming heavy hitters: each micro-batch folds its term stream into
    * ONE bounded Misra-Gries sketch ([[graft.ops.HeavyHitters.MGSketch]],
    * ≤ k counters regardless of batch size) and appends the sketch — k
    * rows, not a vocabulary — to a batch_id-partitioned log with dynamic
    * overwrite, so a replayed at-least-once batch replaces its own
    * partition (the datacardPartials idempotence design). Per-batch state
    * that crosses the wire is O(k); the vocabulary never accumulates
    * anywhere.
    */
  def heavyHitterPartials(rows: DataFrame, item: org.apache.spark.sql.Column,
      sketchPath: String, checkpoint: String, k: Int = 64): StreamingQuery =
    rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val sk = graft.ops.HeavyHitters.sketch(
          batch.select(item.as("term")), col("term"), k)
        // one row per surviving counter + the TRUE stream length n (the
        // merge needs n even when every counter decayed to zero)
        sk.counters.toSeq.toDF("term", "cnt")
          .unionByName(Seq((null: String, 0L)).toDF("term", "cnt"))
          .withColumn("n", lit(sk.n))
          .withColumn("batch_id", lit(batchId))
          .coalesce(1)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(sketchPath)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Merge the sketch log into one [[graft.ops.HeavyHitters.MGSketch]].
    * Mergeable-summaries property: summing counters per term across
    * sketches and applying ONE final reduction is a valid merge order, so
    * every item with true frequency > N/(k+1) over the WHOLE stream is
    * still present (the candidate set may be larger — callers run the
    * exact confirmation pass, the q90 discipline, over the full corpus).
    */
  def readMergedSketch(spark: org.apache.spark.sql.SparkSession,
      sketchPath: String, k: Int = 64): graft.ops.HeavyHitters.MGSketch = {
    val log = spark.read.parquet(sketchPath)
    val merged = new graft.ops.HeavyHitters.MGSketch(k)
    log.filter(col("term").isNotNull)
      .groupBy(col("term")).agg(sum(col("cnt")).as("cnt"))
      .collect()
      .foreach(r => merged.counters.update(r.getString(0), r.getLong(1)))
    merged.n = log.groupBy(col("batch_id")).agg(first(col("n")).as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    if (merged.counters.size > k) {
      val kth = merged.counters.values.toArray
        .sorted(Ordering[Long].reverse).apply(k)
      val dead = merged.counters.collect {
        case (t, c) if c - kth <= 0 => t
      }.toSeq
      merged.counters.mapValuesInPlace((_, c) => c - kth)
      dead.foreach(merged.counters.remove)
    }
    merged
  }
}
