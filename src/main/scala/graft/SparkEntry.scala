package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline operators) is declared here as a named query with a DuckDB
  * oracle. The driver runs `queries` via [[Verify]] at sf0.01 and compares
  * against `oracleSql` results.
  */
object SparkEntry {

  /** All query definitions, grouped by family. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ WindowsQ.defs ++ TextQ.defs ++ DedupQ.defs ++
      SimilarityQ.defs ++ EventsQ.defs ++ ParityQ.defs ++ AsOfQ.defs ++
      StatsQ.defs ++ PipelineQ.defs ++ JdbcQ.defs ++ LayoutQ.defs ++
      SkewQ.defs ++ PackQ.defs ++ MediaQ.defs ++ MergeQ.defs ++
      CorpusStatsQ.defs ++ GraphQ.defs ++ FormatsQ.defs ++ AnalyticsQ.defs ++
      ReshapeQ.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
