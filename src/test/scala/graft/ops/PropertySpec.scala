package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests pinning the invariants SURVEY.md §5 item 4 calls for:
  * severity domain, quarantine ∪ final partitioning, single-row-per-key
  * dedupe, revenue null-safety, salted-join equivalence. Generators are
  * sampled over fixed seeds (the scalatest/scalacheck bridge artifact isn't
  * available offline, so sampling is explicit).
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rowsGen = Gen.listOfN(60,
    for {
      id <- Gen.choose(1L, 20L)
      wm <- Gen.choose(0L, 1000L)
      price <- Gen.option(Gen.choose(-5.0, 200.0))
      qty <- Gen.choose(0, 60)
    } yield (id, wm, price, qty))

  /** Run `body` against generated row sets for a spread of fixed seeds. */
  private def forAll(gen: Gen[List[(Long, Long, Option[Double], Int)]])(
      body: List[(Long, Long, Option[Double], Int)] => Unit): Unit =
    (1L to 5L).foreach { s =>
      body(gen.pureApply(Gen.Parameters.default, Seed(s)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  test("W1 dedupe keeps exactly one row per key, the max-watermark one") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "wm", "price", "qty")
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"id").orderBy($"wm".desc, $"qty".desc)
        val deduped = df.withColumn("rn", row_number().over(w))
          .filter($"rn" === 1).drop("rn").collect()
        val expected = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
        assert(deduped.length == expected.size)
        deduped.foreach(r => assert(r.getAs[Long]("wm") == expected(r.getAs[Long]("id"))))
      }
    }
  }

  test("quality rules partition the input exactly (quarantine ∪ kept = all)") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "wm", "price", "qty")
        val issue = col("price").isNull || col("price") <= 0.0 || col("price") > 100.0 ||
          col("qty") === 0 || col("qty") > 47
        val bad = df.filter(issue).count()
        val good = df.filter(!coalesce(issue, lit(true))).count()
        assert(bad + good == rows.length)
      }
    }
  }

  test("revenue formula is null-safe and non-null for all inputs") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "wm", "price", "qty")
        val rev = df.select(
          (coalesce($"price", lit(0.0)) * coalesce($"qty", lit(1))).as("revenue"))
        assert(rev.filter($"revenue".isNull).count() == 0)
      }
    }
  }

  test("severity is always in {none, low, high}") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("id", "wm", "price", "qty")
        val pv = when(coalesce($"price", lit(-1.0)) < 0.0, 1).otherwise(0)
        val qv = when($"qty" > 47, 1).otherwise(0)
        val sev = df.select(
          when(pv + qv === 2, "high").when(pv + qv === 1, "low")
            .otherwise("none").as("severity"))
        assert(sev.collect().map(_.getString(0)).toSet.subsetOf(Set("none", "low", "high")))
      }
    }
  }

  test("salted join equals plain join; two-phase agg equals plain agg") {
    val left = (1L to 200L).map(i => (i % 5, s"v$i")).toDF("k", "payload")
    val right = (0L to 4L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val plain = left.join(right, Seq("k")).select("k", "payload", "dim")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(left, right, "k", saltFactor = 8)
      .select("k", "payload", "dim").collect().map(_.toSeq).toSet
    assert(salted == plain)

    val df = (1L to 500L).map(i => (i % 3, i.toDouble)).toDF("k", "v")
    val expect = df.groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    val twoPhase = Skew.twoPhaseAgg(df, Seq("k"), 8,
      partial = Seq(sum($"v").as("pv"), count(lit(1)).as("pc")),
      final_ = Seq(sum($"pv").as("total"), sum($"pc").as("n")))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSet
    assert(twoPhase == expect)
  }

  private val docsGen = Gen.listOfN(40,
    for {
      id <- Gen.choose(1L, 30L)
      words <- Gen.listOfN(6, Gen.oneOf("red", "green", "blue", "fast",
        "slow", "table", "row", "key"))
    } yield (id, words.mkString(" ")))

  test("incremental dedup identity holds for random corpora and split points") {
    (1L to 5L).foreach { s =>
      val raw = docsGen.pureApply(Gen.Parameters.default, Seed(s))
        .groupBy(_._1).map { case (id, rs) => (id, rs.head._2) }.toSeq
      val corpus = raw.toDF("doc_id", "text")
      (2 to 3).foreach { m =>
        val prior = corpus.filter($"doc_id" % m =!= 0)
        val fresh = corpus.filter($"doc_id" % m === 0)
        def bands(df: org.apache.spark.sql.DataFrame) =
          Dedup.bandFingerprints(df, "doc_id", "text", 8, 2)
        def pairs(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val full = pairs(Dedup.candidatePairs(bands(corpus), "doc_id"))
        val priorRun = pairs(Dedup.candidatePairs(bands(prior), "doc_id"))
        val incr = pairs(Dedup.incrementalPairs(bands(fresh), bands(prior), "doc_id"))
        assert(priorRun ++ incr == full && (priorRun & incr).isEmpty,
          s"seed=$s mod=$m: prior=$priorRun incr=$incr full=$full")
      }
    }
  }

  test("straddle detector is exactly the identity precondition across caps") {
    // For random corpora, split points AND bucket caps: whenever
    // straddledBuckets is EMPTY, `full ≡ prior ∪ incremental` must hold
    // at that cap — i.e. the detector's all-clear really is the identity's
    // precondition, not just a heuristic. (When buckets do straddle, the
    // identity may legitimately break; the detector's job is to be
    // non-empty exactly then, which the DedupSpec fixture pins.)
    (1L to 4L).foreach { s =>
      val raw = docsGen.pureApply(Gen.Parameters.default, Seed(s))
        .groupBy(_._1).map { case (id, rs) => (id, rs.head._2) }.toSeq
      val corpus = raw.toDF("doc_id", "text")
      val prior = corpus.filter($"doc_id" % 2 =!= 0)
      val fresh = corpus.filter($"doc_id" % 2 === 0)
      def bands(df: org.apache.spark.sql.DataFrame) =
        Dedup.bandFingerprints(df, "doc_id", "text", 8, 2)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      Seq(2, 4, 4096).foreach { cap =>
        val straddled = Dedup.straddledBuckets(
          bands(fresh), bands(prior), "doc_id", cap).count()
        if (straddled == 0) {
          val full = pairs(Dedup.candidatePairs(bands(corpus), "doc_id", cap))
          val priorRun = pairs(Dedup.candidatePairs(bands(prior), "doc_id", cap))
          val incr = pairs(Dedup.incrementalPairs(
            bands(fresh), bands(prior), "doc_id", cap))
          assert(priorRun ++ incr == full,
            s"seed=$s cap=$cap: no straddle but identity broke")
        }
      }
    }
  }

  test("snapshot diff partitions keys and is symmetric under swap") {
    (1L to 5L).foreach { s =>
      val rows = docsGen.pureApply(Gen.Parameters.default, Seed(s))
        .groupBy(_._1).map { case (id, rs) => (id, rs.head._2) }.toSeq
      val a = rows.toDF("k", "s")
      val b = rows.filter(_._1 % 3 != 0)
        .map { case (k, v) => (k, if (k % 2 == 0) v + "!" else v) }
        .toDF("k", "s")
      val d = SnapshotDiff.diff(a, b, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val dSwap = SnapshotDiff.diff(b, a, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(d.keySet == dSwap.keySet)
      d.foreach { case (k, t) =>
        val expect = t match {
          case "added" => "removed"
          case "removed" => "added"
          case other => other
        }
        assert(dSwap(k) == expect, s"seed=$s key=$k: $t vs ${dSwap(k)}")
      }
    }
  }
}
