package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic numeric aggregation helpers.
  *
  * Summing doubles is order-dependent; Spark's partial aggregation order is
  * nondeterministic across partitions, and DuckDB's differs again. Casting to
  * decimal first makes the sum EXACT (money columns are 2-dp quantized), and
  * casting the exact decimal back to double is a deterministic nearest-even
  * conversion in both engines — so results hash-match bit-for-bit. This also
  * holds at any scale/partitioning, which is the property we want at 100 TB:
  * results don't drift when the cluster re-partitions.
  *
  * DuckDB oracle equivalents are in [[OracleSql]].
  */
object Exact {
  private val money = DecimalType(18, 2)
  private val money4 = DecimalType(18, 4)

  /** Exact sum of a 2-dp-quantized double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(money)).cast(DoubleType)

  /** Exact sum at 4-dp (for products like price*(1-discount)). */
  def dsum4(c: Column): Column = sum(c.cast(money4)).cast(DoubleType)

  /** Deterministic average: exact decimal sum, one double division. */
  def davg(c: Column): Column = sum(c.cast(money)).cast(DoubleType) / count(c)
}

/** SQL-side twins of [[Exact]] for building oracle strings. */
object OracleSql {
  def dsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def dsum4(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(18,4))) AS DOUBLE)"
  def davg(x: String): String = s"(CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / COUNT($x))"
}
