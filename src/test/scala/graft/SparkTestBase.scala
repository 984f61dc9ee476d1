package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide session;
  * Test / fork := true keeps it isolated from sbt).
  */
trait SparkTestBase extends AnyFunSuite {
  // route the cross-JVM artifact cache (DiskCache) to a per-JVM temp dir:
  // suites must exercise the cold builds deterministically, never inherit
  // a workspace artifact published by an older binary
  SparkTestBase.isolateCacheDir()

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkTestBase {
  private lazy val cacheDir: String = {
    val d = graft.core.Scratch.dir("graft-test-artifact-cache")
    sys.props("graft.cache.dir") = d
    d
  }
  private[graft] def isolateCacheDir(): Unit = { cacheDir; () }
}
