package graft.queries

import graft.SparkTestBase
import graft.core.{DiskCache, Memo, Scratch}

/** The pipeline family's cross-JVM artifact store (VERDICT r11 item 3):
  * the q63 transform layer and the q64/q65 canonical quality frame are
  * published through [[DiskCache]] keyed on the `lineitem`+`orders`
  * fingerprint. Pins
  *  (1) a cold build publishes BOTH entries,
  *  (2) a rebuilt pipeline (fresh memo, same store) serves row-identical
  *      results for q63 AND q64 from the store,
  *  (3) the served q63 frame really reads the artifact (inputFiles point
  *      into the store), so the test cannot green on a silent cold path.
  * Cold-path correctness itself is the 10 pipeline oracles' territory —
  * they run with the per-JVM isolated cache dir and hash-match DuckDB.
  */
class PipelineArtifactSpec extends SparkTestBase {

  private def withTempCacheDir[T](f: String => T): T = {
    val d = Scratch.dir("graft-pipeline-artifacts")
    val prev = sys.props.get("graft.cache.dir")
    sys.props("graft.cache.dir") = d
    try f(d) finally {
      prev match {
        case Some(p) => sys.props("graft.cache.dir") = p
        case None => sys.props.remove("graft.cache.dir")
      }
      // drop the memoized pipeline so later suites rebuild against the
      // restored store instead of holding plans into this temp dir
      Memo.release(spark, "pipeline:")
    }
  }

  private def rows(name: String): Array[String] =
    graft.SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted

  /** Every file a frame's plan scans — directly (inputFiles) or through a
    * persisted subtree (q63's transform layer is `.persist()`ed, so the
    * optimizer substitutes an InMemoryRelation and `inputFiles` alone
    * returns empty; the artifact scan lives in its cachedPlan leaves).
    */
  private def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val viaCache = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
        r.cachedPlan.collectLeaves().collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.relation.location.inputFiles.toSeq
        }.flatten
    }.flatten
    df.inputFiles.toSeq ++ viaCache
  }

  test("q63/q64 artifacts: cold publishes, fresh build reads the store, rows identical") {
    assume(DiskCache.enabled)
    withTempCacheDir { d =>
      Memo.release(spark, "pipeline:")
      val cold63 = rows("q63_pipeline_transform")
      val cold64 = rows("q64_pipeline_quality_final")
      val entries = new java.io.File(d).listFiles().map(_.getName)
      assert(entries.exists(_.startsWith("pipeline-transform-v1-")),
        s"transform artifact missing: ${entries.mkString(",")}")
      assert(entries.exists(_.startsWith("pipeline-canonical-v1-")),
        s"canonical artifact missing: ${entries.mkString(",")}")

      // fresh pipeline build (the next-JVM analog): must come from the store
      Memo.release(spark, "pipeline:")
      val warm63 = graft.SparkEntry.queries("q63_pipeline_transform")(spark, sf)
      assert(scanFiles(warm63).exists(_.contains("pipeline-transform-v1-")),
        s"warm q63 must scan the transform artifact:\n${scanFiles(warm63).take(5).mkString("\n")}")
      assert(cold63.sameElements(warm63.collect().map(_.toString).sorted),
        "q63 artifact-backed rows diverge from the cold build")

      val warm64 = graft.SparkEntry.queries("q64_pipeline_quality_final")(spark, sf)
      assert(scanFiles(warm64).exists(_.contains("pipeline-canonical-v1-")),
        s"warm q64 must scan the canonical artifact:\n${scanFiles(warm64).take(5).mkString("\n")}")
      assert(cold64.sameElements(warm64.collect().map(_.toString).sorted),
        "q64 artifact-backed rows diverge from the cold build")
    }
  }

  test("disabled store: the pipeline runs the cold chain and publishes nothing") {
    withTempCacheDir { d =>
      sys.props("graft.diskcache.disabled") = "1"
      try {
        Memo.release(spark, "pipeline:")
        val df = graft.SparkEntry.queries("q63_pipeline_transform")(spark, sf)
        assert(scanFiles(df).forall(!_.contains("pipeline-transform-v1-")))
        assert(df.count() > 0)
        val entries = Option(new java.io.File(d).listFiles())
          .getOrElse(Array.empty).map(_.getName)
        assert(!entries.exists(_.startsWith("pipeline-")),
          s"disabled store must not publish: ${entries.mkString(",")}")
      } finally sys.props.remove("graft.diskcache.disabled")
    }
  }
}
