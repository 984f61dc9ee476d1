package graft.ops

import graft.SparkTestBase

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  test("flags eval docs contained in train docs; df-cap suppresses boilerplate") {
    val boiler = "all rights reserved contact us for more information today"
    val evalDocs = Seq(
      // verbatim leak of train doc 10 (plus one token) → containment ~1.0
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa extra"),
      // half-overlap with train doc 11: first 7 of 12 words shared
      (2L, "one two three four five six seven only here onwards differs now"),
      // boilerplate-only doc: every shingle is over-df once boiler repeats
      (3L, boiler)
    ).toDF("doc_id", "text")
    val trainDocs = (Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "one two three four five six seven eight nine ten eleven twelve")
    ) ++ (20L to 45L).map(i => (i, boiler))).toDF("doc_id", "text")

    val out = Decontaminate.overlap(evalDocs, trainDocs, "doc_id", "text",
      n = 3, maxShingleDf = 20, minContainment = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4)))

    val byPair = out.map(t => (t._1, t._2) -> t).toMap
    // doc 1 vs 10: eval has 9 shingles, 8 shared (the "extra" tail breaks one)
    assert(byPair.contains((1L, 10L)), s"verbatim leak not flagged: ${out.mkString(";")}")
    val (_, _, sh1, n1, c1) = byPair((1L, 10L))
    assert(sh1 == 8 && n1 == 9 && c1 > 0.88 && c1 < 0.89)
    // doc 2 vs 11: 5 of 10 shingles shared -> exactly at the 0.5 threshold
    assert(byPair.contains((2L, 11L)))
    assert(byPair((2L, 11L))._5 == 0.5)
    // boilerplate doc: its shingles exceed the df cap (26 train copies + 1
    // eval > 20), so it pairs with NOTHING despite verbatim overlap
    assert(!out.exists(_._1 == 3L), "df-capped boilerplate must not pair")
    assert(out.length == 2)
  }
}
