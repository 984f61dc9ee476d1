package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Bounded top-k aggregate: ordering, ties, k > group size, null structs,
  * and agreement with the window formulation it replaces (the property that
  * makes it safe to use in an oracle-gated query).
  */
class TopKStructsSpec extends SparkTestBase {
  import spark.implicits._

  test("returns the k smallest structs in ascending order") {
    val df = Seq((1L, 30L, 100L), (1L, 10L, 101L), (1L, 20L, 102L),
        (1L, 5L, 103L), (2L, 7L, 200L))
      .toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(GraftFunctions.topk_structs(2, struct($"score", $"id")).as("top"))
      .select($"g", $"top")
      .collect().map(r => r.getLong(0) -> r.getSeq[Row](1).map(x =>
        (x.getLong(0), x.getLong(1)))).toMap
    assert(out(1L) == Seq((5L, 103L), (10L, 101L)))
    assert(out(2L) == Seq((7L, 200L)))
  }

  test("ties break on the later struct fields") {
    val df = Seq((1L, 9L), (1L, 3L), (1L, 7L)).toDF("score0", "id")
      .select(lit(1).as("g"), lit(5L).as("score"), $"id")
    val out = df.groupBy($"g")
      .agg(GraftFunctions.topk_structs(2, struct($"score", $"id")).as("top"))
      .select(explode($"top").as("s")).select($"s.id")
      .as[Long].collect().toSeq
    assert(out == Seq(3L, 7L))
  }

  test("matches the row_number window formulation on real data (many groups, forced spill through partial buffers)") {
    val t = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(($"l_orderkey" % 97).as("g"),
        $"l_extendedprice".cast("long").as("score"),
        ($"l_orderkey" * 10 + $"l_linenumber").as("id"))
    val viaAgg = t.groupBy($"g")
      .agg(GraftFunctions.topk_structs(3, struct($"score", $"id")).as("top"))
      .select($"g", posexplode($"top"))
      .select($"g", ($"pos" + 1).as("rank"), $"col.score", $"col.id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"score", $"id")
    val viaWindow = t
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"g", $"rank", $"score", $"id")
    assert(viaAgg.except(viaWindow).count() == 0 &&
      viaWindow.except(viaAgg).count() == 0)
    assert(viaAgg.count() > 0)
  }

  test("null struct inputs are skipped, k larger than group returns all") {
    val df = Seq((1, Some(4L)), (1, None), (1, Some(2L)))
      .toDF("g", "v")
      .select($"g",
        when($"v".isNotNull, struct($"v".as("score"), $"v".as("id"))).as("s"))
    val out = df.groupBy($"g")
      .agg(GraftFunctions.topk_structs(10, $"s").as("top"))
      .select(size($"top")).as[Int].collect()
    assert(out.toSeq == Seq(2))
  }
}
