package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway A/B probe: dictionary vs row-wise TransformJob over the q63
  * feed, interleaved in one JVM. Usage: runMain graft.tools.DictProbe [sfDir]
  */
object DictProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // %f output must stay valid under any default locale
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    noop(graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir))
    val rules = graft.pipeline.MappingRules.default
    (1 to 3).foreach { i =>
      val f1 = graft.queries.PipelineQ.feed(spark, sfDir)
      time(s"rowwise #$i")(noop(graft.pipeline.TransformJob(f1, rules,
        dictionarize = false)))
      val f2 = graft.queries.PipelineQ.feed(spark, sfDir)
      time(s"dict    #$i")(noop(graft.pipeline.TransformJob(f2, rules,
        dictionarize = true)))
      val f3 = graft.queries.PipelineQ.feed(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time(s"dict+fp #$i")(noop(graft.pipeline.TransformJob(f3, rules,
        dictionarize = true)))
      f3.unpersist(true)
    }
    spark.stop()
  }
}
