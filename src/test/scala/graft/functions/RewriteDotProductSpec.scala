package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RewriteDotProductSpec extends SparkTestBase {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RewriteDotProduct
    try body finally spark.experimental.extraOptimizations = prev
  }

  private val hofDot =
    "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x)"

  test("HOF dot-product pattern is rewritten to the native expression") {
    withRule {
      // parquet source: non-foldable, so the plan survives constant folding
      val df = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("transform(embedding, x -> cast(x as double)) AS v")
        .selectExpr(s"$hofDot AS d")
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("vecdotproduct"),
        s"expected VecDotProduct in optimized plan:\n$optimized")
      // sanity on a known vector through the same rewritten path
      val known = Seq(Tuple1(Array(1.0, 2.0, 3.0))).toDF("v")
        .selectExpr(s"$hofDot AS d")
      assert(known.head().getDouble(0) == 14.0)
    }
  }

  test("rewrite is bit-identical to the interpreted HOF fold") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val plain = vecs.selectExpr("vec_id", s"$hofDot AS d")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rewritten = withRule {
      vecs.selectExpr("vec_id", s"$hofDot AS d")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(plain == rewritten)
  }

  test("null slots and length mismatches yield NULL, matching the HOF exactly") {
    GraftFunctions.register(spark)
    val cases = Seq(
      "array(1.0D, cast(null as double))" -> "array(1.0D, 2.0D)", // null slot
      "array(1.0D)" -> "array(1.0D, 2.0D)",                       // length mismatch
      "array(1.0D, 2.0D)" -> "array(3.0D, 4.0D)")                 // clean
    cases.foreach { case (a, b) =>
      val hof = spark.sql(
        s"SELECT aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0.0 as double), (acc, x) -> acc + x) AS d")
        .head()
      val native = spark.sql(s"SELECT vec_dot($a, $b) AS d").head()
      assert(hof.isNullAt(0) == native.isNullAt(0), s"nullability for ($a, $b)")
      if (!hof.isNullAt(0))
        assert(hof.getDouble(0) == native.getDouble(0), s"value for ($a, $b)")
    }
  }

  test("non-matching shapes are left untouched") {
    withRule {
      // sum-fold without multiply: must NOT rewrite
      val df = Seq(Tuple1(Array(1.0, 2.0))).toDF("v")
        .selectExpr("aggregate(v, cast(0.0 as double), (acc, x) -> acc + x) AS s")
      assert(!df.queryExecution.optimizedPlan.toString.contains("vecdotproduct"))
      assert(df.head().getDouble(0) == 3.0)
      // float arrays: must NOT rewrite (type mismatch)
      val f = spark.read.parquet(s"$sf/embeddings.parquet")
        .selectExpr("aggregate(zip_with(embedding, embedding, (x, y) -> x * y), cast(0.0 as float), (acc, x) -> acc + x) AS d")
      assert(!f.queryExecution.optimizedPlan.toString.contains("vecdotproduct"))
    }
  }
}
