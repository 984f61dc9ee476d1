package graft.core

import graft.SparkTestBase
import org.apache.spark.storage.StorageLevel

/** [[Memo.release]] contract: family-scoped unpersist + rebuild-on-next-
  * access, non-Dataset artifacts kept, never-built holders not forced.
  */
class MemoSpec extends SparkTestBase {
  import spark.implicits._

  test("release unpersists cached datasets (incl. tuple members) and forces rebuild") {
    var builds = 0
    def build() = {
      builds += 1
      Seq(1, 2, 3).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    }
    val df1 = Memo.cached(spark, "memospec-a") { build() }
    val (t1, t2) = Memo.cached(spark, "memospec-tup") { (build(), build()) }
    df1.count(); t1.count(); t2.count()
    assert(builds == 3)
    assert(df1.storageLevel != StorageLevel.NONE, "cached frame is persisted")

    Memo.release(spark, "memospec-")
    assert(df1.storageLevel == StorageLevel.NONE, "release must unpersist")
    assert(t1.storageLevel == StorageLevel.NONE && t2.storageLevel == StorageLevel.NONE,
      "release must walk tuple members")
    Memo.cached(spark, "memospec-a") { build() }.count()
    assert(builds == 4, "released key must rebuild on next access")
  }

  test("release keeps non-dataset artifacts and scopes by prefix") {
    var pathBuilds = 0
    def path() = { pathBuilds += 1; "/tmp/memospec-scratch" }
    assert(Memo.cached(spark, "memospec-path") { path() } == "/tmp/memospec-scratch")
    var otherBuilds = 0
    val other = Memo.cached(spark, "otherfam-df") {
      otherBuilds += 1
      Seq(1).toDF("x").persist(StorageLevel.MEMORY_AND_DISK)
    }
    other.count()

    Memo.release(spark, "memospec-")
    assert(other.storageLevel != StorageLevel.NONE,
      "prefix-scoped release must not touch other families")
    Memo.cached(spark, "memospec-path") { path() }
    assert(pathBuilds == 1, "path artifacts survive release — no file rewrite")

    Memo.release(spark) // full release for the other family
    assert(other.storageLevel == StorageLevel.NONE)
    assert(otherBuilds == 1)
  }

  test("dropKeptArtifacts removes non-dataset entries so a retry re-does " +
      "the declared work (r19 memo-ride fix)") {
    var pathBuilds = 0
    def path() = { pathBuilds += 1; s"/tmp/memospec-retry-$pathBuilds" }
    Memo.cached(spark, "memospec-retry-path") { path() }
    // plain release keeps it (the documented default)
    Memo.release(spark, "memospec-retry-")
    Memo.cached(spark, "memospec-retry-path") { path() }
    assert(pathBuilds == 1, "plain release keeps path artifacts")
    // the retry-loop release drops it: next access REBUILDS — without
    // this, a retried q73/q74/q195 rides the kept conn/path/merge-list
    // and measures ~nothing (0.04-0.15 s vs 1.1-2.6 s declared work)
    Memo.release(spark, "memospec-retry-", dropKeptArtifacts = true)
    Memo.cached(spark, "memospec-retry-path") { path() }
    assert(pathBuilds == 2, "dropKeptArtifacts must force a full rebuild")
  }
}
