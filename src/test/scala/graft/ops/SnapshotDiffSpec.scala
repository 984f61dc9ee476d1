package graft.ops

import graft.SparkTestBase

class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._

  test("classifies added/removed/changed/unchanged and names changed columns") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20.0), (3L, "z2", 31.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val rows = SnapshotDiff.diff(a, b, Seq("k")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getSeq[String](2).toList)).toMap
    assert(rows(1L) == ("removed", Nil))
    assert(rows(2L) == ("unchanged", Nil))
    assert(rows(3L) == ("changed", List("s", "v")))
    assert(rows(4L) == ("added", Nil))
  }

  test("null transitions count as changes (null-safe compare)") {
    val a = Seq((1L, Option("x")), (2L, Option.empty[String]), (3L, Option("z")))
      .toDF("k", "s")
    val b = Seq((1L, Option.empty[String]), (2L, Option("y")), (3L, Option("z")))
      .toDF("k", "s")
    val rows = SnapshotDiff.diff(a, b, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("schema mismatch fails loudly") {
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x")).toDF("k", "other")
    intercept[IllegalArgumentException](SnapshotDiff.diff(a, b, Seq("k")))
  }
}
