package graft.tools

import graft.SparkTestBase

class ScaleUpSpec extends SparkTestBase {
  import spark.implicits._

  test("sign patterns: copy 0 is identity; other copies are ±1 and deterministic") {
    assert(ScaleUp.signPattern(0, 8).forall(_ == 1f))
    val p = ScaleUp.signPattern(3, 64)
    assert(p.forall(x => x == 1f || x == -1f))
    assert(p.sameElements(ScaleUp.signPattern(3, 64)), "must be reproducible")
    assert(p.exists(_ == -1f), "non-zero copies must actually flip signs")
  }

  test("affine alphabets: identity at 0, Caesar for k<26, all 312 distinct bijections") {
    assert(ScaleUp.affine(0) == "abcdefghijklmnopqrstuvwxyz")
    // copies 1..25 must stay the Caesar rotations rounds ≤10 generated,
    // so factor ≤26 scale dirs regenerate bit-for-bit
    assert(ScaleUp.affine(1) == "bcdefghijklmnopqrstuvwxyza")
    assert(ScaleUp.affine(25) == "zabcdefghijklmnopqrstuvwxy")
    val all = (0 until 312).map(ScaleUp.affine)
    all.foreach(a => assert(a.sorted == "abcdefghijklmnopqrstuvwxyz",
      s"$a is not a permutation of the alphabet"))
    assert(all.distinct.size == 312, "affine alphabets must be pairwise distinct")
    // the disjointness contract (scaladoc): same m-family ⇒ ZERO agreeing
    // letters (the exact Caesar guarantee for factor ≤ 26); across
    // families ⇒ at most 2 (gcd(Δm, 26) ≤ 2 congruence solutions)
    for (i <- 0 until 312; j <- (i + 1) until 312) {
      val agree = all(i).zip(all(j)).count { case (x, y) => x == y }
      if (i / 26 == j / 26)
        assert(agree == 0, s"copies $i,$j (same m) agree on $agree letters")
      else
        assert(agree <= 2, s"copies $i,$j agree on $agree letters")
    }
    intercept[IllegalArgumentException](ScaleUp.affine(312))
  }

  test("ragged embedding dimensions are rejected loudly, not null-padded") {
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      ScaleUp.assertUniformEmbeddingDim(ragged)
    }
    assert(e.getMessage.contains("ragged"), e.getMessage)

    val withNull = Seq(
      (1L, Some(Seq(1.0f, 2.0f))),
      (2L, None)
    ).toDF("vec_id", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      ScaleUp.assertUniformEmbeddingDim(withNull)
    }
    assert(e2.getMessage.contains("null"), e2.getMessage)

    val ok = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (2L, Seq(3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    assert(ScaleUp.assertUniformEmbeddingDim(ok) == 2)
  }
}
