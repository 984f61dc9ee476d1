package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "spark engines shuffle data between executors at scale"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "completely different content about databases and storage")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical content and keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    assert(out.length == 4) // 1&4 merge
    val dup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("hash60 is deterministic and non-negative") {
    val h = docs.select(Dedup.hash60(col("text")).as("h")).collect().map(_.getLong(0))
    assert(h.forall(_ >= 0))
    val h2 = docs.select(Dedup.hash60(col("text")).as("h")).collect().map(_.getLong(0))
    assert(h.sameElements(h2))
  }

  test("minhash LSH surfaces exact and near duplicates as candidate pairs") {
    val withWords = docs.select(col("doc_id"), Dedup.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
    val shingled = withWords.select(col("doc_id"),
      explode(Dedup.wordShingles("w", 3)).as("shingle"))
    val sigs = Dedup.minhashSignatures(shingled, "doc_id", "shingle", 8)
    val bands = Dedup.lshBands(sigs, "doc_id", 8, 2)
    val pairs = Dedup.candidatePairs(bands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)), "exact dup must collide in every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      "near-dup should collide in at least one band")
    assert(!pairs.contains((3L, 5L)), "unrelated docs must not pair")
  }

  test("connected components merge transitive near-dup chains") {
    import spark.implicits._
    // chain 1-2-3 must collapse into ONE component even though (1,3) is not
    // a pair; {7,8} is a separate component
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val rows = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.length == 5, s"one row per vertex, got ${rows.toSeq}")
    assert(rows.toSet == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("jaccard is exact on distinct word sets") {
    val d = docs.select(col("doc_id"), array_distinct(Dedup.words(col("text"))).as("wd"))
    val a = d.select(col("doc_id").as("ida"), col("wd").as("wa"))
    val b = d.select(col("doc_id").as("idb"), col("wd").as("wb"))
    val j = a.crossJoin(b).filter(col("ida") === 1 && col("idb") === 4)
      .select(Dedup.jaccard(col("wa"), col("wb"))).head().getDouble(0)
    assert(j == 1.0)
  }

  test("simhash: identical docs get identical signatures, near-dups small hamming") {
    val tokens = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.words(col("text")))).as("tok"))
    val sigs = Dedup.simhash(tokens, "doc_id", "tok")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)),
      "near-dup should be closer in hamming space than unrelated doc")
  }
}
