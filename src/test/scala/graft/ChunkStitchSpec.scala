package graft

import org.apache.spark.sql.functions._

/** Invariants of the three gap-closure queries (q226/q227/q228) that the
  * DuckDB oracle can't express: Gramian additivity across labels, the
  * spine-fill cell accounting, and the chunk-stitching identity at every
  * chunk width (the oracle gate proves it only at width 128).
  */
class ChunkStitchSpec extends SparkTestBase {

  test("q228: chunk-stitched runs equal the global-sort runs at every width") {
    val global = graft.queries.StatsQ.shuffleRuns(spark, sf)
      .orderBy("shard").collect().toSeq
    // width 1: every row its own chunk — the count is PURE boundary
    // corrections; width ≥ corpus: one chunk per shard — pure q220;
    // 7 and 128 exercise ragged interior boundaries
    for (w <- Seq(1L, 7L, 128L, 1000000L)) {
      val stitched = graft.queries.StatsQ.chunkedRunsWidth(w)(spark, sf)
        .orderBy("shard").collect().toSeq
      assert(stitched == global, s"stitched != global at width $w")
    }
  }

  test("q226: per-label Gramians sum cell-wise to the global Gramian") {
    val t = graft.core.Tables(spark, sf)
    val byLabel = graft.ops.Gramian
      .upperTriangleBy(t.embeddings, "label", "embedding", dim = 64)
      .groupBy(col("i"), col("j"))
      .agg(sum(col("gram_u")).as("gram_u"), sum(col("n")).as("n"))
    val global = graft.ops.Gramian
      .upperTriangle(t.embeddings, "embedding", dim = 64)
      .select(col("i"), col("j"), col("gram_u"), col("n"))
    assert(byLabel.join(global, Seq("i", "j"), "full")
      .filter(byLabel("gram_u") =!= global("gram_u") ||
        byLabel("n") =!= global("n") ||
        byLabel("gram_u").isNull || global("gram_u").isNull)
      .count() == 0L)
  }

  test("q226: every label's participation ratio is in (0, dim]") {
    val rows = graft.queries.SimilarityQ.labelEffectiveRank(spark, sf).collect()
    assert(rows.length > 1)
    rows.foreach { r =>
      val pr = r.getAs[Long]("pr_milli")
      assert(pr > 0L && pr <= 64000L, s"label ${r.get(0)}: pr_milli $pr")
    }
  }

  test("q227: spine accounting — full grid, gaps = grid minus observed cells") {
    val filled = graft.queries.EventsQ.seasonalGapfill(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val observed = graft.queries.EventsQ.seasonalAnomalies(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("n_cells")).toMap
    val grid = filled.values.map(_.getAs[Long]("n_cells")).toSet
    // every type sees the SAME days × 24 grid
    assert(grid.size == 1 && grid.head % 24 == 0)
    assert(filled.keySet == observed.keySet)
    filled.foreach { case (et, r) =>
      assert(r.getAs[Long]("n_gap_cells") ==
        r.getAs[Long]("n_cells") - observed(et))
    }
  }
}
