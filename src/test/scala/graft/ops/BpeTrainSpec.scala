package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE trainer: hand-computed merges on a tiny vocabulary (the Sennrich
  * worked example shape), the greedy-overlap rule, tie-breaking, and the
  * compression accounting.
  */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  test("learns the hand-computed merges on a toy vocabulary") {
    // vocab: low ×5, lowest ×2 — pair counts round 1:
    //   (l,o)=7 (o,w)=7 (w,e)=2 (e,s)=2 (s,t)=2
    // argmax ties (l,o) vs (o,w) at 7 → lexicographic lhs: (l,o) wins.
    // round 2: (lo,w)=7 wins; round 3: ties (low,e)/(e,s)/(s,t) at 2 →
    // (e,s) is lexicographically first on lhs.
    val freq = Seq(("low", 5L), ("lowest", 2L)).toDF("word", "n")
    val merges = BpeTrain.train(freq, 3)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.pair_count)) == Seq(
      (1, "l", "o", 7L),
      (2, "lo", "w", 7L),
      (3, "e", "s", 2L)))
    // units after round 2: low ×5 → ["low"], lowest ×2 → ["low","e","s","t"]
    // = 5·1 + 2·4 = 13; after round 3: ["low","es","t"] → 5 + 2·3 = 11
    assert(merges.map(_.units_after) == Seq(27L - 7L, 13L, 11L))
  }

  test("greedy left-to-right: aaaa under (a,a) becomes [aa, aa]") {
    val df = Seq(("aaaa", 1L)).toDF("word", "n")
      .select(BpeTrain.charUnits("word").as("units"))
      .select(BpeTrain.mergePair("units", "a", "a").as("m"))
    assert(df.as[Seq[String]].collect().head == Seq("aa", "aa"))
    // odd run: aaa → [aa, a]
    val odd = Seq(("aaa", 1L)).toDF("word", "n")
      .select(BpeTrain.charUnits("word").as("units"))
      .select(BpeTrain.mergePair("units", "a", "a").as("m"))
    assert(odd.as[Seq[String]].collect().head == Seq("aa", "a"))
  }

  test("merge only rewrites the targeted pair; quotes in units are safe") {
    val df = Seq(Seq("a", "b", "a", "'", "b")).toDF("units")
      .select(BpeTrain.mergePair("units", "a", "'").as("m"))
    assert(df.as[Seq[String]].collect().head == Seq("a", "b", "a'", "b"))
  }

  test("wordFrequencies collapses the corpus in one pass") {
    val docs = Seq("low low lowest", "Low").toDF("text")
    val wf = BpeTrain.wordFrequencies(docs, "text")
      .orderBy($"word").as[(String, Long)].collect().toSeq
    assert(wf == Seq(("low", 3L), ("lowest", 1L)))
  }

  test("applying learned merges in sequence tokenizes as hand-computed") {
    val freq = Seq(("low", 5L), ("lowest", 2L)).toDF("word", "n")
    val merges = BpeTrain.train(freq, 3) // (l,o) (lo,w) (e,s) — see above
    var v = Seq("low", "lowest", "slow").toDF("word")
      .withColumn("units", BpeTrain.charUnits("word"))
    merges.foreach(m => v = v.withColumn("units",
      BpeTrain.mergePair("units", m.lhs, m.rhs)))
    val out = v.select($"word", $"units").as[(String, Seq[String])]
      .collect().toMap
    assert(out("low") == Seq("low"))
    assert(out("lowest") == Seq("low", "es", "t"))
    // unseen word: merges still apply where they match
    assert(out("slow") == Seq("s", "low"))
  }

  test("exhausts cleanly when no pairs remain") {
    val freq = Seq(("ab", 1L)).toDF("word", "n")
    val merges = BpeTrain.train(freq, 5)
    assert(merges.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
  }
}
