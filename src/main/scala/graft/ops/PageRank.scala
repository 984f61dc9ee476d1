package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected edge list — the
  * entity-importance companion to [[Dedup.connectedComponents]]: components
  * tell you WHICH rows form a cluster, centrality ranks rows WITHIN one
  * (e.g. picking the canonical survivor of a near-dup cluster, or scoring
  * suppliers/parts by transaction-graph importance).
  *
  * Iteration shape (the part that matters at scale): edges+degrees are
  * materialized ONCE and `localCheckpoint`ed; each round is one shuffle
  * join (ranks onto edge sources — ranks is one row per NODE, orders of
  * magnitude smaller than edges) plus one hash aggregate on the
  * destination, with the new ranks `localCheckpoint`ed to truncate lineage
  * (NOTES.md iterative rule: persisted-but-unchecked plans nest per round
  * and blow up analysis).
  *
  * Determinism: the loop is pure FIXED-POINT INTEGER arithmetic — ranks
  * are micro-units (1.0 → 1_000_000), per-edge contributions divide
  * half-up via `(2·rank + deg) div (2·deg)`, damping applies as
  * `(pct·s + 50) div 100` — so every engine computes identical BIGINTs at
  * every step. A first cut rounded doubles to 6dp per step instead; with
  * ~2k nodes × 3 iterations that hit two cells where Spark's and DuckDB's
  * double `round` split a .5 boundary differently — iterative scoring
  * NEEDS the integer formulation, not per-step rounding (QueryDef rules,
  * escalated). The float boundary is crossed exactly once, in the final
  * `rank_u / 1e6` display divide (deterministic IEEE on both engines).
  *
  * Fixed iteration count (not convergence detection) keeps the result
  * closed-form for the oracle; rank mass is conserved at `n` per round up
  * to half-up rounding (±0.5µ per edge) for a graph with no dangling nodes
  * (an undirected edge list has none).
  *
  * Overflow headroom: `dampingPct · s_u` needs `s_u < 9.2e18/100` — total
  * graph mass is `n × 1e6`, so safe below ~9e10 nodes even if one hub
  * absorbed ALL mass.
  */
object PageRank {

  private val UnitSc = 1000000L

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val teleportU = UnitSc * (100L - dampingPct) / 100L
    val one = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val sym = one.unionByName(
      one.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val eDeg = sym.join(deg, "src").localCheckpoint(true)

    var ranks = deg.select(col("src").as("node"), lit(UnitSc).as("rank_u"))
      .localCheckpoint(true)
    // Checkpointed ranks are a stats-less LogicalRDD, so the planner can
    // never auto-broadcast them and every iteration pays a full shuffle +
    // sort of BOTH sides (edges re-shuffled per round). When the node
    // count — a control-plane scalar over the just-materialized checkpoint,
    // one cached-RDD scan — fits a broadcast comfortably, hint ranks onto
    // the build side: the edge table is then only probed map-side, one
    // shuffle per round (the dst aggregate) instead of three. Past the
    // threshold the hint drops away and the loop keeps the scale-correct
    // shuffle join (node-sized frames cannot ride a broadcast at 100 TB).
    val hintTiny = ranks.count() <= 2000000L
    def tiny(df: DataFrame): DataFrame =
      if (hintTiny) org.apache.spark.sql.functions.broadcast(df) else df
    for (_ <- 1 to iterations) {
      ranks = eDeg
        .join(tiny(ranks), eDeg("src") === ranks("node"))
        .select(col("dst"),
          expr("(2 * rank_u + deg) div (2 * deg)").as("contrib_u"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib_u")).as("s_u"))
        .select(col("dst").as("node"),
          (lit(teleportU) +
            expr(s"($dampingPct * s_u + 50) div 100")).as("rank_u"))
        .localCheckpoint(true)
    }
    ranks.select(col("node"), col("rank_u"),
      (col("rank_u") / lit(1000000.0)).as("rank"))
  }
}
