package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so scale
  * properties are auditable: PushedFilters reaching the parquet scan, pruned
  * ReadSchema, BroadcastHashJoin on dims, WholeStageCodegen coverage, no
  * accidental CartesianProduct.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_pricing_summary", "q03_region_rollup", "q14_top_nations",
        "q19_incremental_slice", "q37_minhash_pairs", "q40_ann_topk")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      println(graft.SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
