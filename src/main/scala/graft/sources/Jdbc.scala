package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S1/S9 + the S2 pushdown-subquery leg).
  *
  * Re-expresses the reference's three JDBC touchpoints Spark-first:
  *  - S1 full-table scan (`go-ingest-elt.py:30-45` — a single-connection
  *    `spark.read.jdbc`) plus the PARALLEL partitioned variant the reference
  *    lacks: `partitionColumn`/bounds split the table into `numPartitions`
  *    range queries executed concurrently — the only JDBC read shape that
  *    survives a large table.
  *  - S2 incremental pushdown subquery (`go-incremental-ingest-elt.py:
  *    162-195` builds a `(SELECT ... WHERE wm > :x) t` dbtable string): the
  *    watermark predicate executes IN the database, so only the new slice
  *    crosses the wire.
  *  - S9 typed batch insert (`rds/load_to_sqlserver.py:224-263` — a pyodbc
  *    `executemany` loop): `df.write.jdbc` with `batchsize`, letting every
  *    executor insert its partition concurrently instead of a single
  *    driver-side cursor.
  *
  * Catalyst pushes `.filter(...)` predicates on the returned DataFrame into
  * the JDBC `WHERE` clause (visible as `PushedFilters` on the JDBCRelation
  * scan) — asserted by JdbcSpec against embedded Derby, which ships on
  * Spark's own classpath (the Hive-metastore engine), so the whole path is
  * integration-tested offline (VERDICT r01 item 8).
  */
object Jdbc {

  /** Connection descriptor; defaults target embedded Derby (the only engine
    * guaranteed present here). Any url/driver pair works the same way.
    */
  final case class Conn(
      url: String,
      driver: String = "org.apache.derby.jdbc.EmbeddedDriver",
      props: Map[String, String] = Map.empty)

  private def base(spark: SparkSession, conn: Conn) = {
    val r = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
    conn.props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** S1 — full-table scan, single connection (small dims / control tables). */
  def readTable(spark: SparkSession, conn: Conn, table: String,
      fetchSize: Int = 1000): DataFrame =
    base(spark, conn).option("dbtable", table)
      .option("fetchsize", fetchSize).load()

  /** S1 at scale — range-partitioned parallel read: `numPartitions`
    * concurrent connections each scanning one stride of `partitionCol`.
    */
  def readTablePartitioned(spark: SparkSession, conn: Conn, table: String,
      partitionCol: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, fetchSize: Int = 1000): DataFrame =
    base(spark, conn).option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize).load()

  /** S2 — incremental slice: the watermark predicate runs in the database
    * (`query` option = the reference's hand-built pushdown subquery).
    * Quoting matches how Spark's JDBC writer created the table: the TABLE
    * name is passed through unquoted (so it case-folds identically), while
    * COLUMN names are dialect-quoted by the writer and must be quoted here
    * too (unquoted `id` would fold to `ID` and miss the quoted `"id"`).
    */
  def readIncremental(spark: SparkSession, conn: Conn, table: String,
      watermarkCol: String, lowerExclusive: Long): DataFrame =
    base(spark, conn)
      .option("query",
        s"""SELECT * FROM $table WHERE "$watermarkCol" > $lowerExclusive""")
      .load()

  /** S9 — typed batch insert; executors write their partitions concurrently
    * in `batchSize` groups.
    */
  def write(df: DataFrame, conn: Conn, table: String,
      mode: SaveMode = SaveMode.Append, batchSize: Int = 1000): Unit = {
    val w = df.write.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
      .option("dbtable", table)
      .option("batchsize", batchSize)
    conn.props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(mode).save()
  }
}
