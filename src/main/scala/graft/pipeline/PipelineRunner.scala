package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.collection.mutable

/** End-to-end pipeline orchestration — the engine's analog of the
  * reference's Glue workflow (`cloudformation/06_glueworkflow.yml`): the four
  * stages run in ONE Spark application over a shared logical plan instead of
  * four processes handing off through S3, so Catalyst sees the whole graph
  * and intermediate layers are written once, not re-read + re-inferred.
  *
  * Preserved control-plane behaviors: layered parquet (landing → transform →
  * final + quarantines at quality/{final,price,quantity} — `quality/final`
  * holds the HIGH-severity quarantine, mirroring the reference's layer names,
  * `cloudformation/05_gluejobs.yml:97-101` → metrics/<subject>), small-file
  * coalesce (S7), metrics partitioned by restaurant_id (S6), skip-empty-write
  * probes (P9, `go-quality-elt.py:129-132`), per-stage run manifest (S8,
  * `go-incremental-ingest-elt.py:305-318`), landing archival (S10).
  */
object PipelineRunner {

  final case class StageResult(stage: String, rows: Long, path: String)

  final case class RunResult(stages: Seq[StageResult], manifestPath: String)

  /** P9 — conditional write: skip empty DataFrames, coalesce small output.
    * The row count comes from the just-written parquet footers (a
    * metadata-only count) rather than re-running the stage plan.
    */
  private def writeIfNonEmpty(df: DataFrame, path: String, files: Int = 4,
      partitionBy: Seq[String] = Nil): Long = {
    if (df.head(1).isEmpty) 0L
    else {
      val writer = df.coalesce(files).write.mode(SaveMode.Overwrite)
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(path)
      df.sparkSession.read.parquet(path).count()
    }
  }

  def run(spark: SparkSession, orderItemsCsv: String, optionsCsv: String,
      dateDimCsv: String, thresholds: DataFrame, outRoot: String): RunResult = {
    val stages = mutable.ArrayBuffer.empty[StageResult]
    def record(stage: String, rows: Long, path: String): Unit =
      stages += StageResult(stage, rows, path)

    // ingest: CSV → typed landing with surrogate keys (S3 + loader leg)
    val rawItems = CsvSource.withSurrogatePk(
      CsvSource.read(spark, orderItemsCsv), Seq("order_id", "lineitem_id"))
      .withColumn("item_price", col("item_price").cast("double"))
      .withColumn("item_quantity", col("item_quantity").cast("int"))
      .withColumn("is_loyalty", col("is_loyalty").cast("boolean"))
    val rawOptions = CsvSource.read(spark, optionsCsv)
      .withColumn("option_price", col("option_price").cast("double"))
      .withColumn("option_quantity", col("option_quantity").cast("int"))
    val dateDim = CsvSource.read(spark, dateDimCsv)
      .withColumn("year", col("year").cast("int"))
      .withColumn("month", col("month").cast("int"))
      .withColumn("week", col("week").cast("int"))
      .withColumn("is_weekend", col("is_weekend").cast("boolean"))
      .withColumn("is_holiday", col("is_holiday").cast("boolean"))
    record("landing_items", writeIfNonEmpty(rawItems, s"$outRoot/landing/order_items"),
      s"$outRoot/landing/order_items")

    // transform
    val transformed = TransformJob(rawItems)
    record("transform", writeIfNonEmpty(transformed, s"$outRoot/transform/order_items"),
      s"$outRoot/transform/order_items")

    // quality
    val q = QualityJob(transformed, rawOptions, dateDim, thresholds)
    record("quality_final", writeIfNonEmpty(q.finalDf, s"$outRoot/final", files = 8),
      s"$outRoot/final")
    record("quality_quarantine",
      writeIfNonEmpty(q.quarantine, s"$outRoot/quality/final"), s"$outRoot/quality/final")
    record("quality_price",
      writeIfNonEmpty(q.priceIssues, s"$outRoot/quality/price"), s"$outRoot/quality/price")
    record("quality_quantity",
      writeIfNonEmpty(q.quantityIssues, s"$outRoot/quality/quantity"),
      s"$outRoot/quality/quantity")

    // metrics fan-out: finalDf is a filter over the plan QualityJob already
    // cached — re-caching here would pin a second near-identical copy
    MetricsJob.all(q.finalDf).foreach { case (subject, df) =>
      val path = s"$outRoot/metrics/$subject"
      val partCols =
        if (df.columns.contains("restaurant_id")) Seq("restaurant_id") else Nil
      record(s"metrics_$subject", writeIfNonEmpty(df, path, partitionBy = partCols), path)
    }

    // run manifest (S8) — control plane, driver-side by design
    val manifestPath = s"$outRoot/run_manifest.json"
    val json = stages.map(s =>
      s"""{"stage":"${s.stage}","rows":${s.rows},"path":"${s.path}"}""")
      .mkString("[", ",", "]")
    Files.createDirectories(Paths.get(outRoot))
    Files.write(Paths.get(manifestPath), json.getBytes(StandardCharsets.UTF_8))

    RunResult(stages.toSeq, manifestPath)
  }
}
