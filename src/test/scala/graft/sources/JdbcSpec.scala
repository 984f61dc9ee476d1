package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Integration tests for the JDBC source/sink against embedded Derby (on
  * Spark's own classpath) — S9 batch insert, S1 full + partitioned reads,
  * S2 incremental pushdown subquery, and filter pushdown into the scan.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val tmp = java.nio.file.Files.createTempDirectory("graft-derby-spec").toString
  private lazy val conn = {
    System.setProperty("derby.stream.error.file", s"$tmp/derby.log")
    Jdbc.Conn(s"jdbc:derby:$tmp/db;create=true")
  }

  test("S9 write + S1 read round-trips typed rows") {
    val df = (1 to 100).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "v")
    Jdbc.write(df, conn, "t_roundtrip", SaveMode.Overwrite, batchSize = 16)
    val back = Jdbc.readTable(spark, conn, "t_roundtrip")
    assert(back.count() == 100)
    val row = back.filter(col("id") === 7L).collect().head
    assert(row.getAs[String]("name") == "name_7" && row.getAs[Double]("v") == 10.5)
  }

  test("S1 partitioned read fans out to numPartitions range queries") {
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    Jdbc.write(df, conn, "t_parts", SaveMode.Overwrite)
    val back = Jdbc.readTablePartitioned(spark, conn, "t_parts", "id", 0, 100, 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 100)
  }

  test("filter predicates are pushed into the JDBC scan") {
    val back = Jdbc.readTable(spark, conn, "t_parts").filter(col("id") > 90L)
    val physical = back.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("GreaterThan"),
      s"expected pushed filter in:\n$physical")
    assert(back.count() == 10)
  }

  test("S2 incremental subquery reads only the post-watermark slice") {
    val df = (1 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "v")
    Jdbc.write(df, conn, "t_inc", SaveMode.Overwrite)
    val inc = Jdbc.readIncremental(spark, conn, "t_inc", "id", lowerExclusive = 95L)
    assert(inc.count() == 5)
    assert(inc.agg(min(col("id"))).collect().head.getLong(0) == 96L)
  }
}
