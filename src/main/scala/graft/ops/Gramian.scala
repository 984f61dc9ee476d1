package graft.ops

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Distributed Gramian (Xᵀ·X upper triangle) over an embedding column — the
  * covariance/PCA prerequisite and the embedding-diagnostics aggregate
  * (dominant directions, anisotropy, dimension collapse).
  *
  * Scale shape: each partition folds its rows into ONE fixed-size
  * d(d+1)/2 accumulator (`mapPartitions`, no per-row pair explosion — a
  * posexplode² formulation shuffles N·d² rows, this shuffles
  * partitions·d(d+1)/2); the final merge is a tiny integer hash-agg.
  *
  * Determinism (the q92 lesson applied to linear algebra): per-term
  * products are rounded HALF-AWAY-FROM-ZERO to micro-units and accumulated
  * as LONGs — integer addition commutes, so the result is bit-identical
  * under any partitioning or merge order, and DuckDB's `round()` (also
  * half-away) reproduces every term. The float boundary is crossed once
  * per term (one IEEE multiply), never in the accumulation.
  */
object Gramian {

  private def halfAway(x: Double): Long =
    if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong

  private val outSchema = StructType(Seq(
    StructField("i", IntegerType), StructField("j", IntegerType),
    StructField("u", LongType), StructField("pn", LongType)))

  private val groupedSchema = StructType(Seq(
    StructField("gkey", IntegerType),
    StructField("i", IntegerType), StructField("j", IntegerType),
    StructField("u", LongType), StructField("pn", LongType)))

  /** Upper-triangle micro-unit Gramian: one output row per (i ≤ j) pair,
    * 1-based indices; `gram_u` = Σ round(xᵢ·xⱼ·10⁶), `n` = row count,
    * `gram` = gram_u/10⁶. Rows with a null or wrong-dimension vector raise
    * (an aggregate silently skipping rows would lie about `n`).
    */
  def upperTriangle(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, "dim must be positive")
    val m = dim * (dim + 1) / 2
    val partials = df.select(col(vecCol)).mapPartitions { rows =>
      val acc = new Array[Long](m)
      var n = 0L
      rows.foreach { r =>
        val v = r.getSeq[Float](0)
        require(v != null && v.length == dim,
          s"embedding null or wrong dimension (want $dim): $v")
        var i = 0
        var k = 0
        while (i < dim) {
          val xi = v(i).toDouble
          var j = i
          while (j < dim) {
            acc(k) += halfAway(xi * v(j).toDouble * 1e6)
            k += 1
            j += 1
          }
          i += 1
        }
        n += 1
      }
      if (n == 0) Iterator.empty
      else {
        val out = new Array[Row](m)
        var i = 0
        var k = 0
        while (i < dim) {
          var j = i
          while (j < dim) {
            out(k) = Row(i + 1, j + 1, acc(k), n)
            k += 1
            j += 1
          }
          i += 1
        }
        out.iterator
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    partials.groupBy(col("i"), col("j"))
      .agg(sum(col("u")).as("gram_u"), sum(col("pn")).as("n"))
      .withColumn("gram", col("gram_u") / lit(1000000.0))
  }

  /** Per-group upper-triangle Gramian: [[upperTriangle]] keyed by an INT
    * group column (one `gram_u` matrix per key) — the per-label /
    * per-source embedding-health shape. Same partition-local fold, one
    * fixed-size accumulator PER GROUP per partition (groups × d(d+1)/2
    * longs — fine for label-like cardinalities; a million-key grouping
    * wants the relational posexplode formulation instead, which this
    * deliberately is not). Shuffle stays partitions·groups·d(d+1)/2
    * rows; the same integer-accumulation determinism argument applies
    * unchanged because each group's accumulator only ever sees its own
    * rows.
    */
  def upperTriangleBy(df: DataFrame, keyCol: String, vecCol: String,
      dim: Int): DataFrame = {
    require(dim >= 1, "dim must be positive")
    val m = dim * (dim + 1) / 2
    val partials = df.select(col(keyCol).cast("int"), col(vecCol))
      .mapPartitions { rows =>
        val accs = scala.collection.mutable.LinkedHashMap
          .empty[Int, (Array[Long], Array[Long])]
        rows.foreach { r =>
          require(!r.isNullAt(0), "group key must not be null")
          val key = r.getInt(0)
          val v = r.getSeq[Float](1)
          require(v != null && v.length == dim,
            s"embedding null or wrong dimension (want $dim): $v")
          val (acc, nRef) = accs.getOrElseUpdate(key,
            (new Array[Long](m), new Array[Long](1)))
          var i = 0
          var k = 0
          while (i < dim) {
            val xi = v(i).toDouble
            var j = i
            while (j < dim) {
              acc(k) += halfAway(xi * v(j).toDouble * 1e6)
              k += 1
              j += 1
            }
            i += 1
          }
          nRef(0) += 1
        }
        accs.iterator.flatMap { case (key, (acc, nRef)) =>
          val out = new Array[Row](m)
          var i = 0
          var k = 0
          while (i < dim) {
            var j = i
            while (j < dim) {
              out(k) = Row(key, i + 1, j + 1, acc(k), nRef(0))
              k += 1
              j += 1
            }
            i += 1
          }
          out.iterator
        }
      }(org.apache.spark.sql.Encoders.row(groupedSchema))
    partials.groupBy(col("gkey").as(keyCol), col("i"), col("j"))
      .agg(sum(col("u")).as("gram_u"), sum(col("pn")).as("n"))
      .withColumn("gram", col("gram_u") / lit(1000000.0))
  }
}
