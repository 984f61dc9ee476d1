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

  test("3-batch streaming MG sketch: merged candidates cover every exact heavy hitter; replay is a no-op") {
    val root = graft.core.Scratch.dir("hh-stream")
    val docsDir = s"$root/docs"
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

    // skewed item (the SkewQ convention): 'hot' carries ~75% of rows, the
    // remaining ~25% spread over ~97 cold keys — so with k=8 the sketch
    // MUST decay (≈98 distinct > k) and 'hot' is a genuine heavy hitter
    // (75% ≫ 1/(k+1) ≈ 11%)
    val item = when(col("doc_id") % 4 < 3, lit("hot"))
      .otherwise(concat(lit("k"), (col("doc_id") % 97).cast("string")))
    val k = 8
    val (log, ckpt) = (s"$root/sketches", s"$root/ckpt")
    CorpusStreams.heavyHitterPartials(stream, item, log, ckpt, k)
      .awaitTermination()

    // bounded state actually bounded: ≤ k counter rows + 1 n-row per batch
    val perBatch = spark.read.parquet(log).groupBy("batch_id").count().collect()
    assert(perBatch.length == 3, "3 files → 3 micro-batch sketches")
    perBatch.foreach(r => assert(r.getLong(1) <= k + 1,
      s"batch ${r.get(0)} wrote ${r.getLong(1)} rows — sketch must stay ≤ k+1"))

    val merged = CorpusStreams.readMergedSketch(spark, log, k)
    val items = docs.select(item.as("term"))
    val n = items.count()
    assert(merged.n == n, "merged n must be the true whole-stream length")

    // the MG guarantee, end to end across the merge: every item with true
    // frequency > N/(k+1) must survive in the merged candidate set
    val exactHeavy = items.groupBy("term").count()
      .filter(col("count") * (k + 1) > n)
      .collect().map(_.getString(0)).toSet
    assert(exactHeavy.nonEmpty, "test stream must actually have heavy items")
    val candidates = merged.counters.keySet
    assert(exactHeavy.subsetOf(candidates),
      s"lost heavy hitters: ${exactHeavy diff candidates}")
    assert(items.select(col("term")).distinct().count() > k,
      "stream must carry more distinct items than k, or decay is untested")

    // replay with the same checkpoint: no new offsets, log unchanged
    val before = spark.read.parquet(log).collect().toSet
    CorpusStreams.heavyHitterPartials(stream, item, log, ckpt, k)
      .awaitTermination()
    assert(spark.read.parquet(log).collect().toSet == before,
      "replay must be a no-op")
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
