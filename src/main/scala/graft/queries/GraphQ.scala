package graft.queries

import graft.QueryDef
import graft.core.Tables
import graft.ops.PageRank
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Graph analytics over the transaction schema — the iterative-numeric
  * sibling of q76's connected components.
  */
object GraphQ {

  /** q92 — 3-iteration PageRank over the part↔supplier transaction graph
    * (distinct lineitem pairs; supplier ids offset into a disjoint node-id
    * space). The loop is fixed-point BIGINT micro-units with half-up
    * integer division (see [[graft.ops.PageRank]]) so the DuckDB
    * chained-CTE oracle reproduces every step bit-for-bit — per-step
    * double rounding provably flips .5 boundaries between engines.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val edges = t.lineitem.select(
      col("l_partkey").as("src"),
      (col("l_suppkey") + lit(10000000L)).as("dst"))
    PageRank.run(edges, "src", "dst", iterations = 3)
  }

  private val pagerankSql = {
    // one fixed-point PR step: half-up integer contribution divide,
    // integer damping; HUGEINT sums cast back to BIGINT
    def step(prev: String, i: Int): String =
      s"""c$i AS (
         |  SELECT e.dst AS node,
         |    CAST(SUM((2 * r.rank_u + e.deg) // (2 * e.deg)) AS BIGINT) AS s_u
         |  FROM e JOIN $prev r ON e.src = r.node GROUP BY 1),
         |r$i AS (
         |  SELECT node, 150000 + (85 * s_u + 50) // 100 AS rank_u FROM c$i)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT l_partkey AS src, l_suppkey + 10000000 AS dst
       |  FROM lineitem),
       |sym AS (
       |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
       |deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
       |e AS (SELECT sym.src, sym.dst, deg.deg FROM sym JOIN deg USING (src)),
       |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS rank_u FROM deg),
       |${step("r0", 1)},
       |${step("r1", 2)},
       |${step("r2", 3)}
       |SELECT node, CAST(rank_u AS BIGINT) AS rank_u,
       |  rank_u / 1000000.0 AS rank
       |FROM r3""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("q92_pagerank", pagerank, Some(pagerankSql)),
  )
}
