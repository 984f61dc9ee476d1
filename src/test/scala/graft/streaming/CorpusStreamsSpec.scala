package graft.streaming

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class CorpusStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("3-batch streaming incremental dedup ≡ one-shot batch pair set, and replays are no-ops") {
    val root = graft.core.Scratch.dir("corpus-streams")
    val docsDir = s"$root/docs"
    // the real documents table, split into 3 deterministic files so the
    // file source (maxFilesPerTrigger=1) feeds 3 micro-batches
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    (0 until 3).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$docsDir/part$i")
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(docsDir)

    val (store, pairs, ckpt) = (s"$root/store", s"$root/pairs", s"$root/ckpt")
    CorpusStreams.incrementalDedup(stream, store, pairs, ckpt)
      .awaitTermination()

    val streamed = pairsOf(spark.read.parquet(pairs))
    val oneShot = pairsOf(Dedup.candidatePairs(
      Dedup.bandFingerprints(docs, "doc_id", "text", 8, 2), "doc_id"))
    assert(streamed == oneShot,
      s"streamed ∆ one-shot: ${(streamed diff oneShot) ++ (oneShot diff streamed)}")
    assert(spark.read.parquet(store).select("doc_id").distinct().count() ==
      Dedup.bandFingerprints(docs, "doc_id", "text", 8, 2)
        .select("doc_id").distinct().count(),
      "store must hold fingerprints for every shingleable document")

    // batches actually incremental: >1 batch, each pair appears exactly once
    val byBatch = spark.read.parquet(pairs).groupBy("batch_id").count().collect()
    assert(byBatch.length > 1, "maxFilesPerTrigger=1 should have produced multiple batches")
    assert(spark.read.parquet(pairs).count() == streamed.size,
      "no pair may be emitted by two batches")

    // re-run with the same checkpoint: AvailableNow finds no new offsets —
    // pairs and store must be byte-identical in content
    CorpusStreams.incrementalDedup(stream, store, pairs, ckpt)
      .awaitTermination()
    assert(pairsOf(spark.read.parquet(pairs)) == streamed, "replay must be a no-op")
  }

  test("3-batch streaming data card ≡ one-shot batch q159 card, and replays are no-ops") {
    val root = graft.core.Scratch.dir("datacard-stream")
    val docsDir = s"$root/docs"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    (0 until 3).foreach { i =>
      docs.filter(col("doc_id") % 3 === i).coalesce(1)
        .write.mode("overwrite").parquet(s"$docsDir/part$i")
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(docsDir)

    val (partials, ckpt) = (s"$root/partials", s"$root/ckpt")
    CorpusStreams.datacardPartials(stream, partials, ckpt).awaitTermination()

    def cardOf(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.mkString("|")).toSet

    val streamed = cardOf(CorpusStreams.readDatacard(spark, partials))
    val oneShot = cardOf(graft.queries.CorpusStatsQ.sourceDatacard(spark, sf))
    assert(streamed == oneShot,
      s"streamed ∆ one-shot: ${(streamed diff oneShot) ++ (oneShot diff streamed)}")

    // genuinely incremental (multiple partial partitions), and a replay
    // with the same checkpoint changes nothing
    assert(spark.read.parquet(partials).select("batch_id").distinct().count() > 1)
    CorpusStreams.datacardPartials(stream, partials, ckpt).awaitTermination()
    assert(cardOf(CorpusStreams.readDatacard(spark, partials)) == streamed,
      "replay must be a no-op")
  }
}
