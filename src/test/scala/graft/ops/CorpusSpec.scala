package graft.ops

import graft.SparkTestBase

class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  test("curate: quality gate, exact dedup, near-dup removal, idempotence") {
    val base = spark.read.parquet(s"$sf/documents.parquet")
    // inject: an exact dup of doc 0, a near-dup of doc 1 (one word changed),
    // and a too-short doc
    val d0 = base.filter($"doc_id" === 0).head().getAs[String]("text")
    val d1 = base.filter($"doc_id" === 1).head().getAs[String]("text")
    val d1near = {
      val w = d1.split(" ")
      (w.dropRight(1) :+ "zzz").mkString(" ")
    }
    val injected = Seq(
      (100000L, d0, "en", "inj", d0.length.toLong),
      (100001L, d1near, "en", "inj", d1near.length.toLong),
      (100002L, "too short", "en", "inj", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val corpus = base.unionByName(injected)

    val curated = Corpus.curate(corpus,
      Corpus.CurationConfig(jaccardThreshold = 0.8, minTokens = 5))
    val ids = curated.select("doc_id").as[Long].collect().toSet

    assert(!ids.contains(100000L), "exact dup dropped (higher id loses)")
    assert(ids.contains(0L), "original of the exact-dup pair kept")
    assert(!ids.contains(100001L), "near-dup dropped via MinHash+Jaccard")
    assert(ids.contains(1L), "original of the near-dup pair kept")
    assert(!ids.contains(100002L), "below min token count dropped")
    assert(curated.columns.contains("n_tokens") &&
      curated.columns.contains("stopword_ratio"))

    // idempotent: curating the curated corpus drops nothing further
    val again = Corpus.curate(curated.drop("n_tokens", "stopword_ratio"),
      Corpus.CurationConfig(jaccardThreshold = 0.8, minTokens = 5))
    assert(again.count() == curated.count())
  }

  test("curate: null and empty text never survive") {
    val docs = Seq(
      (1L, "a perfectly normal document with enough tokens", "en", "s", 46L),
      (2L, null.asInstanceOf[String], "en", "s", 0L),
      (3L, "   ", "en", "s", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val ids = Corpus.curate(docs, Corpus.CurationConfig(minTokens = 3))
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L))
  }

  test("curate: language filter") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val en = Corpus.curate(docs, Corpus.CurationConfig(keepLangs = Set("en")))
    assert(en.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("curate -> pack composes: the full training-data chain holds its invariants") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val curated = Corpus.curate(docs).drop("stopword_ratio", "n_tokens")
    val budget = 256
    val packed = Pack.concatAndChunk(curated, idCol = "doc_id",
      groupCol = "source", budget = budget, shards = 4)

    val rows = packed.select("doc_id", "source", "shard", "n_tokens",
      "pack_id", "pack_offset")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length == curated.count())

    // every offset is inside the budget, pack ids are non-negative
    assert(rows.forall { case (_, _, _, _, p, off) => p >= 0 && off >= 0 && off < budget })

    // exact concat-and-chunk arithmetic per (source, shard), in doc_id order:
    // each doc starts where the previous cumulative token count left off
    rows.groupBy(r => (r._2, r._3)).foreach { case ((src, shard), g) =>
      var cum = 0L
      g.sortBy(_._1).foreach { case (id, _, _, n, p, off) =>
        assert(p == cum / budget && off == cum % budget,
          s"doc $id in ($src,$shard): expected pack ${cum / budget}@${cum % budget}, got $p@$off")
        cum += n
      }
    }

    // shard-locality: a shard's docs never share a (shard, pack) with
    // another shard — recomputing the packing is deterministic
    val again = Pack.concatAndChunk(curated, idCol = "doc_id",
      groupCol = "source", budget = budget, shards = 4)
      .select("doc_id", "pack_id", "pack_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.sameElements(rows.map(r => (r._1, r._5, r._6)).sortBy(_._1)))
  }
}
