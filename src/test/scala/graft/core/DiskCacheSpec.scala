package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The cross-JVM artifact cache (VERDICT r10 item 7): reuse on an
  * unchanged fingerprint, invalidation when the source files change —
  * the staleness guard the verdict asked to spec.
  */
class DiskCacheSpec extends SparkTestBase {

  /** Store dirs are `<key>-b<buildFingerprint>` since VERDICT r11 item 2;
    * tests locate an entry by its caller-key prefix.
    */
  private def entryDir(key: String): java.io.File =
    new java.io.File(sys.props("graft.cache.dir")).listFiles()
      .filter(_.getName.startsWith(key + "-b")).head

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
      val target = entryDir("spec-heal")
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
      val target = entryDir("spec-heal2")
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

  test("fingerprint: same name+size+mtime, different content bytes flips it") {
    // ADVICE r11: a source regenerated inside the FS timestamp granularity
    // (or restored with preserved mtimes) must still invalidate — the
    // head/tail content sample catches what the metadata triple cannot
    val dir = Scratch.dir("graft-fp-content")
    val sub = new java.io.File(dir, "lineitem.parquet")
    sub.mkdirs()
    val part = new java.io.File(sub, "part-00000.parquet")
    java.nio.file.Files.write(part.toPath, "PAR1-aaaa-content-v1".getBytes)
    val mt = part.lastModified()
    val f1 = DiskCache.fingerprint(dir, Seq("lineitem"))
    // same length, same mtime, different bytes
    java.nio.file.Files.write(part.toPath, "PAR1-bbbb-content-v2".getBytes)
    assert(part.setLastModified(mt))
    assert(part.length() == 20 && part.lastModified() == mt)
    assert(DiskCache.fingerprint(dir, Seq("lineitem")) != f1,
      "a content change with identical metadata must invalidate")
  }

  private def withCodePath[T](path: String)(f: => T): T = {
    val prev = sys.props.get("graft.cache.codepath")
    sys.props("graft.cache.codepath") = path
    try f finally prev match {
      case Some(p) => sys.props("graft.cache.codepath") = p
      case None => sys.props.remove("graft.cache.codepath")
    }
  }

  test("cached: a changed build invalidates with no manual token bump") {
    // VERDICT r11 item 2: the store key embeds a digest of the code
    // location. Point the digest at a stand-in "classes dir" and prove a
    // rebuild (a changed class file) forces the cold build while the
    // caller key stays byte-identical.
    assume(DiskCache.enabled)
    withTempCacheDir {
      val code = Scratch.dir("graft-fake-classes")
      val cls = new java.io.File(code, "Builder.class")
      java.nio.file.Files.write(cls.toPath, Array[Byte](1, 2, 3))
      withCodePath(code) {
        var builds = 0
        def build() = { builds += 1; spark.range(10).toDF("id") }
        DiskCache.cached(spark, "spec-buildfp")(build()).collect()
        DiskCache.cached(spark, "spec-buildfp")(build()).collect()
        assert(builds == 1, "unchanged build must hit")
        // "recompile": the class file changes size
        java.nio.file.Files.write(cls.toPath, Array[Byte](1, 2, 3, 4))
        DiskCache.cached(spark, "spec-buildfp")(build()).collect()
        assert(builds == 2, "a changed build must invalidate the store")
        DiskCache.cached(spark, "spec-buildfp")(build()).collect()
        assert(builds == 2, "the new build's entry must serve hits")
      }
    }
  }

  test("touch falls back to a .touch marker; effectiveMtime honors it") {
    val d = new java.io.File(Scratch.dir("graft-touch"), "entry")
    d.mkdirs()
    assert(DiskCache.touch(d), "plain touch must work on a real fs")
    // stale dir mtime + fresh marker: the marker must win
    val old = System.currentTimeMillis() - 8L * 3600 * 1000
    assert(d.setLastModified(old))
    java.nio.file.Files.write(new java.io.File(d, ".touch").toPath,
      "now".getBytes)
    assert(DiskCache.effectiveMtime(d) > old + 3600 * 1000,
      "a fresh .touch marker must dominate a stale dir mtime")
  }

  test("sweep spares an over-quota entry whose .touch marker is fresh") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      val cacheRoot = new java.io.File(sys.props("graft.cache.dir"))
      val quota = DiskCache.maxEntries
      def entry(i: Int) = s"spec-sweep-$i"
      // `quota` published entries, all idle >6h by dir mtime
      (1 to quota).foreach { i =>
        DiskCache.cached(spark, entry(i))(spark.range(1).toDF("id")).collect()
      }
      val dirs = cacheRoot.listFiles().filter(_.getName.startsWith("spec-sweep-"))
      assert(dirs.length == quota)
      val old = System.currentTimeMillis() - 8L * 3600 * 1000
      dirs.foreach(d => assert(d.setLastModified(old)))
      // the entry-1 dir gets a fresh marker (the ADVICE scenario: its
      // setLastModified "failed", the marker carried the LRU signal)
      val protectedDir = dirs.minBy(_.getName)
      java.nio.file.Files.write(
        new java.io.File(protectedDir, ".touch").toPath, "now".getBytes)
      // an over-quota publish triggers the sweep
      DiskCache.cached(spark, entry(quota + 1))(spark.range(1).toDF("id")).collect()
      assert(new java.io.File(protectedDir, "_SUCCESS").isFile,
        "the marker-touched entry must survive the sweep")
      val survivors = cacheRoot.listFiles()
        .count(f => f.getName.startsWith("spec-sweep-") &&
          new java.io.File(f, "_SUCCESS").isFile)
      assert(survivors == quota, s"one stale entry must be evicted, got $survivors")
    }
  }

  test("sweep bounds TOTAL store bytes, evicting LRU idle entries " +
      "(VERDICT r16 item 6)") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      val cacheRoot = new java.io.File(sys.props("graft.cache.dir"))
      val prevMax = sys.props.get("graft.cache.maxbytes")
      sys.props("graft.cache.maxbytes") = "1" // every 2nd+ idle entry is over
      try {
        (1 to 3).foreach { i =>
          DiskCache.cached(spark, s"spec-bytes-$i")(
            spark.range(100).toDF("id")).collect()
        }
        // age all three past the in-flight-reader idle guard
        val old = System.currentTimeMillis() - 8L * 3600 * 1000
        cacheRoot.listFiles().filter(_.getName.startsWith("spec-bytes-"))
          .foreach(d => assert(d.setLastModified(old)))
        // a fresh publish triggers the sweep; the newest entry is always
        // kept (a single over-budget artifact must not self-evict)
        DiskCache.cached(spark, "spec-bytes-4")(
          spark.range(100).toDF("id")).collect()
        val survivors = cacheRoot.listFiles()
          .filter(f => f.getName.startsWith("spec-bytes-") &&
            new java.io.File(f, "_SUCCESS").isFile)
          .map(_.getName).sorted
        assert(survivors.length == 1 && survivors.head.startsWith("spec-bytes-4"),
          s"byte bound must evict the idle LRU generation, kept: ${survivors.toSeq}")
      } finally prevMax match {
        case Some(p) => sys.props("graft.cache.maxbytes") = p
        case None => sys.props.remove("graft.cache.maxbytes")
      }
    }
  }

  test("a symlink store root disables the store: compute-only, no publish " +
      "(ADVICE r16)") {
    assume(DiskCache.enabled)
    // the /tmp squat scenario: the PREDICTABLE default path pre-created as
    // a symlink by another user — following it would publish (and sweep-
    // DELETE) through the attacker's link
    val base = new java.io.File(Scratch.dir("graft-symlink-root"))
    val realTarget = new java.io.File(base, "elsewhere")
    realTarget.mkdirs()
    val link = new java.io.File(base, "store").toPath
    try java.nio.file.Files.createSymbolicLink(link, realTarget.toPath)
    catch { case _: Exception => cancel("fs does not support symlinks") }
    val prev = sys.props.get("graft.cache.dir")
    sys.props("graft.cache.dir") = link.toString
    try {
      var builds = 0
      def build() = { builds += 1; spark.range(5).toDF("id") }
      DiskCache.cached(spark, "spec-symlink")(build()).collect()
      DiskCache.cached(spark, "spec-symlink")(build()).collect()
      assert(builds == 2, "a symlink root must run compute-only (no hits)")
      assert(Option(realTarget.listFiles()).getOrElse(Array.empty).isEmpty,
        "nothing may be published through the link")
    } finally prev match {
      case Some(p) => sys.props("graft.cache.dir") = p
      case None => sys.props.remove("graft.cache.dir")
    }
  }

  test("an owned-but-permissive root is healed to 0700 before use " +
      "(ADVICE r16)") {
    assume(DiskCache.enabled)
    import java.nio.file.Files
    import java.nio.file.attribute.PosixFilePermissions
    val d = new java.io.File(Scratch.dir("graft-permissive"), "store")
    d.mkdirs()
    try Files.setPosixFilePermissions(d.toPath,
      PosixFilePermissions.fromString("rwxrwxrwx"))
    catch { case _: UnsupportedOperationException => cancel("non-POSIX fs") }
    val prev = sys.props.get("graft.cache.dir")
    sys.props("graft.cache.dir") = d.getAbsolutePath
    try {
      DiskCache.cached(spark, "spec-perm")(spark.range(5).toDF("id")).collect()
      assert(new java.io.File(d, "_SUCCESS").getParentFile.isDirectory)
      assert(PosixFilePermissions.toString(
        Files.getPosixFilePermissions(d.toPath)) == "rwx------",
        "an owned world-writable root must be tightened to 0700")
      // and the store WORKS after healing (we own it)
      var builds = 0
      DiskCache.cached(spark, "spec-perm") {
        builds += 1; spark.range(5).toDF("id")
      }.collect()
      assert(builds == 0, "the healed root must serve hits")
    } finally prev match {
      case Some(p) => sys.props("graft.cache.dir") = p
      case None => sys.props.remove("graft.cache.dir")
    }
  }

  test("degraded build fingerprint runs compute-only: no publish, no LRU " +
      "churn (ADVICE r16)") {
    assume(DiskCache.enabled)
    withTempCacheDir {
      val cacheRoot = new java.io.File(sys.props("graft.cache.dir"))
      // an EMPTY classes dir is one of the degraded states (no .class
      // entries to digest) — previously each such run published under a
      // never-reusable per-JVM key, churning warm entries out of the LRU
      val emptyCode = Scratch.dir("graft-empty-classes")
      withCodePath(emptyCode) {
        var builds = 0
        def build() = { builds += 1; spark.range(5).toDF("id") }
        DiskCache.cached(spark, "spec-degraded")(build()).collect()
        DiskCache.cached(spark, "spec-degraded")(build()).collect()
        assert(builds == 2, "degraded state must compute every time")
        val published = Option(cacheRoot.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith("spec-degraded"))
        assert(published.isEmpty, "degraded state must never publish")
      }
    }
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
