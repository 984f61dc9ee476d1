package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-by-stage timing probe for the q63 transform chain at a given scale
  * directory — separates feed (join + repartition), regex transform CPU, and
  * the persist write, so super-linear scale-up cost can be attributed
  * instead of guessed at.
  *
  * Usage: runMain graft.tools.ScaleProbe [sfDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // %f output must stay valid under any default locale
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
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

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    val noop = (df: org.apache.spark.sql.DataFrame) =>
      df.write.format("noop").mode("overwrite").save()

    // warm JVM/codegen on a trivial pass
    noop(spark.read.parquet(s"$sfDir/orders.parquet").limit(1000))

    // replicate Bench exactly: q01 warmup, then the measured q63
    time("warmup q01 (bench-style)")(noop(
      graft.SparkEntry.queries("q01_pricing_summary")(spark, sfDir)))
    time("q63 exact (bench path)")(noop(
      graft.SparkEntry.queries("q63_pipeline_transform")(spark, sfDir)))

    val feed = graft.queries.PipelineQ.feed(spark, sfDir)
    time("feed: join+repartition")(noop(feed))
    time("feed again (page-cache warm)")(noop(feed))

    val transformed = graft.pipeline.TransformJob(feed, graft.pipeline.MappingRules.default)
    time("transform, NO persist")(noop(transformed))
    time("transform again")(noop(transformed))

    val persisted = transformed.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("transform + persist write")(noop(persisted))
    time("read back from cache")(noop(persisted))
    println("[probe] cached bytes: " + spark.sparkContext.getRDDStorageInfo
      .map(i => s"mem=${i.memSize / 1e6}MB disk=${i.diskSize / 1e6}MB").mkString("; "))
    spark.stop()
  }
}
