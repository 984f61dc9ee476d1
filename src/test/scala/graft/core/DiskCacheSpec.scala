package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The cross-JVM artifact cache (VERDICT r10 item 7): reuse on an
  * unchanged fingerprint, invalidation when the source files change —
  * the staleness guard the verdict asked to spec.
  */
class DiskCacheSpec extends SparkTestBase {

  private def withTempCacheDir[T](f: => T): T = {
    val d = Scratch.dir("graft-diskcache-spec")
    val prev = sys.props.get("graft.cache.dir")
    sys.props("graft.cache.dir") = d
    try f finally prev match {
      case Some(p) => sys.props("graft.cache.dir") = p
      case None => sys.props.remove("graft.cache.dir")
    }
  }

  test("fingerprint is stable, and flips when a source file changes") {
    val dir = Scratch.dir("graft-fp-src")
    val sub = new java.io.File(dir, "lineitem.parquet")
    sub.mkdirs()
    val part = new java.io.File(sub, "part-00000.parquet")
    java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3))
    val f1 = DiskCache.fingerprint(dir, Seq("lineitem"))
    assert(f1 == DiskCache.fingerprint(dir, Seq("lineitem")), "must be stable")
    assert(f1.matches("[0-9a-f]{16}"))
    // size change flips it
    java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3, 4))
    val f2 = DiskCache.fingerprint(dir, Seq("lineitem"))
    assert(f2 != f1, "a size change must invalidate")
    // mtime change alone flips it (regenerated same-size file)
    assert(part.setLastModified(part.lastModified() + 12345))
    val f3 = DiskCache.fingerprint(dir, Seq("lineitem"))
    assert(f3 != f2, "an mtime change must invalidate")
    // a different source dir never collides with this one's key space
    assert(DiskCache.fingerprint(dir + "-other", Seq("lineitem")) != f3)
  }

  test("cached: one build per key across fresh reads; new key rebuilds") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      var builds = 0
      def build() = {
        builds += 1
        spark.range(100).select(col("id"), (col("id") * 2).as("v"))
      }
      val a = DiskCache.cached(spark, "spec-artifact-v1")(build()).collect()
      assert(builds == 1 && a.length == 100)
      // second read of the SAME key: parquet hit, no rebuild
      val b = DiskCache.cached(spark, "spec-artifact-v1")(build()).collect()
      assert(builds == 1, "a fingerprint hit must not rebuild")
      assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
      // a new key (= new fingerprint) rebuilds
      DiskCache.cached(spark, "spec-artifact-v2")(build()).collect()
      assert(builds == 2, "a changed fingerprint must rebuild")
    }
  }

  test("cached: a corrupt published entry heals — rebuild replaces it") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      var builds = 0
      def build() = { builds += 1; spark.range(50).select(col("id")) }
      DiskCache.cached(spark, "spec-heal")(build()).collect()
      assert(builds == 1)
      // damage the published artifact: truncate every part file so the hit
      // read throws (footer gone) while _SUCCESS still says "valid"
      val target = new java.io.File(
        sys.props("graft.cache.dir"), "spec-heal")
      target.listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(p => java.nio.file.Files.write(p.toPath, Array[Byte](0)))
      val healed = DiskCache.cached(spark, "spec-heal")(build()).collect()
      assert(builds == 2, "an unreadable hit must fall back to the build")
      assert(healed.length == 50)
      // and the REBUILD must have replaced the corrupt entry (the old
      // renameTo-onto-nonempty-dir failure left it poisoned forever)
      val again = DiskCache.cached(spark, "spec-heal")(build()).collect()
      assert(builds == 2, "the healed entry must serve hits again")
      assert(again.length == 50)
    }
  }

  test("cached: a marker-less partial target heals — publish replaces it") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      var builds = 0
      def build() = { builds += 1; spark.range(30).select(col("id")) }
      DiskCache.cached(spark, "spec-heal2")(build()).collect()
      assert(builds == 1)
      // simulate a wipe interrupted right after the marker delete: the
      // target survives WITHOUT _SUCCESS — renameTo onto it would fail
      // forever if the build path didn't clear it first
      val target = new java.io.File(sys.props("graft.cache.dir"), "spec-heal2")
      assert(new java.io.File(target, "_SUCCESS").delete())
      DiskCache.cached(spark, "spec-heal2")(build()).collect()
      assert(builds == 2, "a marker-less target must rebuild")
      DiskCache.cached(spark, "spec-heal2")(build()).collect()
      assert(builds == 2, "the republished entry must serve hits again")
    }
  }

  test("fingerprint covers nested (partitioned) layouts") {
    val dir = Scratch.dir("graft-fp-nested")
    val sub = new java.io.File(dir, "events.parquet/dt=2024-01-01")
    sub.mkdirs()
    val part = new java.io.File(sub, "part-00000.parquet")
    java.nio.file.Files.write(part.toPath, Array[Byte](1, 2, 3))
    val f1 = DiskCache.fingerprint(dir, Seq("events"))
    // regenerating a LEAF file under a partition dir must flip the print
    java.nio.file.Files.write(part.toPath, Array[Byte](9, 9, 9, 9))
    assert(DiskCache.fingerprint(dir, Seq("events")) != f1,
      "nested leaf changes must invalidate")
  }

  test("cached: content survives the parquet round trip exactly") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      val src = spark.range(1000).select(
        col("id").as("a"), (col("id") % 7).as("b"),
        concat(lit("k"), col("id")).as("s"))
      val out = DiskCache.cached(spark, "spec-roundtrip")(src)
      // names+types survive; parquet normalizes nullability (expected —
      // the DuckDB gate compares names/types/values, never nullability)
      assert(out.schema.map(f => (f.name, f.dataType)) ==
        src.schema.map(f => (f.name, f.dataType)))
      assert(out.count() == 1000)
      assert(out.agg(sum("a"), sum("b")).head() == src.agg(sum("a"), sum("b")).head())
    }
  }
}
