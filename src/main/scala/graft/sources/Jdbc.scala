package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}

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
      mode: SaveMode = SaveMode.Append, batchSize: Int = 1000,
      createTableColumnTypes: Option[String] = None): Unit = {
    val w = df.write.format("jdbc")
      .option("url", conn.url)
      .option("driver", conn.driver)
      .option("dbtable", table)
      .option("batchsize", batchSize)
    val w2 = createTableColumnTypes.fold(w)(w.option("createTableColumnTypes", _))
    conn.props.foldLeft(w2) { case (acc, (k, v)) => acc.option(k, v) }
      .mode(mode).save()
  }

  // ------------------------------------------------------------------------
  // Typed-DDL inference for the CSV→DB load leg.
  //
  // The reference's loader reads CSVs all-string and infers per-column SQL
  // types from the VALUES — BIT / DATETIME2 / INT / BIGINT / FLOAT /
  // DECIMAL(18,s) / NVARCHAR(n) — before creating the table
  // (`rds/load_to_sqlserver.py:97-147`, a pandas pass per column on the
  // driver). Re-expressed Spark-first: ONE distributed aggregate pass
  // computes every column's stats simultaneously (valid-count, bool-set
  // membership, timestamp-parse fraction, int/dec/sci regex conformance,
  // max integer magnitude, max decimal scale, max length); only the single
  // stats row reaches the driver.
  //
  // Emitted types are the PORTABLE Spark-SQL spellings (`createTableColumnTypes`
  // is parsed by Spark's DDL parser, which doesn't know engine dialect names):
  // BOOLEAN / TIMESTAMP / INT / BIGINT / FLOAT / DECIMAL(18,s) / VARCHAR(n).
  // The JdbcDialect renders them per engine — NVARCHAR on SQL Server, VARCHAR
  // on Derby/Postgres — which is exactly the reference's intent. A column
  // that would be NVARCHAR(MAX) is omitted from the override map so the
  // dialect's unbounded-string default (NVARCHAR(MAX) / CLOB / TEXT) applies.
  // ------------------------------------------------------------------------

  private val BoolSet = Seq("0", "1", "true", "false", "t", "f", "yes", "no", "y", "n")
  private val IntRe = "^[+-]?[0-9]+$"
  private val DecRe = "^[+-]?[0-9]+\\.[0-9]+$"
  private val SciRe = "^[+-]?[0-9]+(\\.[0-9]+)?[eE][+-]?[0-9]+$"
  /** Null-ish sentinels the reference drops before inference
    * (`load_to_sqlserver.py:98`). */
  private val NullIsh = Seq("", "nan", "NaN", "NULL", "None")

  /** Per-column value stats → inferred SQL type, one aggregate job for ALL
    * string columns. Returns `(colName, sqlType)` in column order; a `None`
    * type means "no override — let the dialect's unbounded-string default
    * apply" (the reference's NVARCHAR(MAX) branch).
    */
  def inferColumnTypes(df: DataFrame, maxVarchar: Int = 4000): Seq[(String, Option[String])] = {
    val stringCols = df.schema.fields.filter(_.dataType ==
      org.apache.spark.sql.types.StringType).map(_.name)
    if (stringCols.isEmpty) return Nil

    def stats(c: String): Column = {
      val v = trim(col(c))
      val vv = when(v.isNotNull && !v.isin(NullIsh: _*), v) // null ⇒ skipped by aggs
      val cleaned = regexp_replace(vv, ",", "") // reference's _clean_numeric_str
      val isInt = cleaned.rlike(IntRe)
      val isDec = cleaned.rlike(DecRe)
      val isSci = cleaned.rlike(SciRe)
      val b01 = (c2: Column) => when(vv.isNotNull, when(c2, 1).otherwise(0))
      struct(
        count(vv).as("n"),
        coalesce(min(b01(lower(vv).isin(BoolSet: _*))) === 1, lit(false)).as("all_bool"),
        // try_cast: ANSI mode (Spark 4 default) makes plain cast THROW on
        // unparseable strings — the probes must degrade to null instead
        avg(b01(vv.try_cast("timestamp").isNotNull)).as("ts_frac"),
        coalesce(min(b01(isInt || isDec || isSci)) === 1, lit(false)).as("all_num"),
        coalesce(min(b01(isInt)) === 1, lit(false)).as("all_int"),
        coalesce(max(b01(isSci)) === 1, lit(false)).as("any_sci"),
        max(when(isInt, abs(cleaned.try_cast("decimal(38,0)")))).as("max_abs"),
        max(when(isDec, length(regexp_extract(cleaned, "\\.([0-9]+)$", 1)))).as("max_scale"),
        max(length(vv)).as("max_len")
      ).as(c)
    }

    val row = df.agg(stats(stringCols.head), stringCols.tail.map(stats): _*)
      .collect().head // 1 row × C structs — control-plane only

    stringCols.zipWithIndex.map { case (c, i) =>
      val s = row.getStruct(i)
      val n = s.getLong(0)
      val ts = if (s.isNullAt(2)) 0.0 else s.getDouble(2)
      val maxAbs = if (s.isNullAt(6)) None else Some(s.getDecimal(6))
      val maxScale = if (s.isNullAt(7)) 0 else s.getInt(7)
      val maxLen = if (s.isNullAt(8)) 0 else s.getInt(8)
      val t: Option[String] =
        if (n == 0L) Some("VARCHAR(255)")
        else if (s.getBoolean(1)) Some("BOOLEAN") // reference: BIT
        // NOTE: timestamp is deliberately checked BEFORE numerics, like the
        // reference (`load_to_sqlserver.py:104-110` runs pd.to_datetime
        // before the int/decimal pass) — both sides therefore type a column
        // of bare years ('2019', '2024', …) as a timestamp, since both
        // pandas and Spark accept 'yyyy' as a datetime literal. Parity over
        // plausibility: reorder here and the engines' DDL diverges.
        else if (ts >= 0.90) Some("TIMESTAMP")    // reference: DATETIME2
        else if (s.getBoolean(3)) {               // all numeric
          if (s.getBoolean(4)) {
            // all integral — escalate by actual magnitude. Values past
            // Long.MaxValue (or past the decimal(38,0) probe: maxAbs None)
            // must NOT be typed BIGINT: writeTyped's try_cast would null
            // them silently. DECIMAL(38,0) keeps them lossless; past 38
            // digits there is no exact SQL numeric — leave the column as
            // the dialect's default string type.
            val intMax = new java.math.BigDecimal(Int.MaxValue)
            val longMax = new java.math.BigDecimal(Long.MaxValue)
            maxAbs match {
              case Some(d) if d.abs.compareTo(intMax) <= 0 => Some("INT")
              case Some(d) if d.abs.compareTo(longMax) <= 0 => Some("BIGINT")
              case Some(_) => Some("DECIMAL(38,0)")
              case None => None // > 38 digits: stays string (dialect default)
            }
          }
          else if (s.getBoolean(5)) Some("FLOAT")
          else Some(s"DECIMAL(18,${math.min(maxScale, 6)})")
        } else {
          val len = math.min(math.max(maxLen, 32), maxVarchar)
          if (len < maxVarchar) Some(s"VARCHAR($len)") else None // NVARCHAR(MAX) branch
        }
      c -> t
    }.toSeq
  }

  /** The CSV→DB load leg with reference DDL parity: infer types from the
    * all-string frame, CAST the columns to the matching Spark types (the
    * reference converts values in its insert loop too), and create the table
    * with explicit column DDL via `createTableColumnTypes`. Returns the
    * inferred `(col, ddlType)` pairs for observability / assertions.
    */
  def writeTyped(df: DataFrame, conn: Conn, table: String,
      mode: SaveMode = SaveMode.Append, batchSize: Int = 1000,
      maxVarchar: Int = 4000): Seq[(String, Option[String])] = {
    val inferred = inferColumnTypes(df, maxVarchar)
    val types = inferred.toMap
    val casted = df.select(df.columns.map { c =>
      // try_cast throughout: null-ish sentinels ("", "NULL", "nan") inside an
      // otherwise-numeric column must become SQL NULL, not an ANSI cast error
      types.get(c).flatten match {
        case Some("BOOLEAN") => lower(trim(col(c))).try_cast("boolean").as(c)
        case Some("TIMESTAMP") => trim(col(c)).try_cast("timestamp").as(c)
        case Some("INT") => regexp_replace(trim(col(c)), ",", "").try_cast("int").as(c)
        case Some("BIGINT") => regexp_replace(trim(col(c)), ",", "").try_cast("bigint").as(c)
        case Some("FLOAT") => regexp_replace(trim(col(c)), ",", "").try_cast("float").as(c)
        case Some(d) if d.startsWith("DECIMAL") =>
          regexp_replace(trim(col(c)), ",", "").try_cast(d.toLowerCase).as(c)
        case _ => col(c)
      }
    }.toSeq: _*)
    // backtick-quote: CSV headers keep inner spaces/punctuation through
    // name normalization, and the DDL string goes through Spark's parser
    val ddl = inferred.collect { case (c, Some(t)) => s"`$c` $t" }
    write(casted, conn, table, mode, batchSize,
      createTableColumnTypes = if (ddl.isEmpty) None else Some(ddl.mkString(", ")))
    inferred
  }

  // ------------------------------------------------------------------------
  // Per-vendor DDL rendering.
  //
  // The inference above deliberately emits PORTABLE Spark-SQL spellings,
  // because `createTableColumnTypes` goes through Spark's DDL parser, which
  // doesn't know vendor names — Spark's own JdbcDialect then renders them
  // per engine on the write path. But the reference creates its tables
  // OUT-OF-BAND with vendor DDL (`rds/load_to_sqlserver.py:97-147,168-175`:
  // `CREATE TABLE [schema].[table] ([col] NVARCHAR(n)/DATETIME2/BIT … NULL)`
  // over pyodbc), and a deployment that needs that shape — pre-created
  // tables, exact vendor types, a DBA-reviewed DDL file — should get it
  // from a CONFIG ENTRY, not a rewrite. SqlDialect is that entry: one row
  // per vendor (identifier quoting, string type family, unbounded-string
  // spelling, type renames); [[createTableDdl]] renders the inferred
  // portable types through it.
  // ------------------------------------------------------------------------

  /** One vendor's DDL conventions. `renames` maps portable spellings to
    * vendor ones; anything absent passes through unchanged (INT, BIGINT,
    * DECIMAL(p,s) are universal).
    */
  final case class SqlDialect(
      name: String,
      quote: String => String,
      varcharName: String,
      unboundedString: String,
      renames: Map[String, String]) {
    /** Render an inferred portable type (None = the unbounded-string
      * branch, the reference's NVARCHAR(MAX)). */
    def render(portable: Option[String]): String = portable match {
      case None => unboundedString
      case Some(t) if t.startsWith("VARCHAR(") =>
        varcharName + t.substring("VARCHAR".length)
      case Some(t) => renames.getOrElse(t, t)
    }
  }

  object SqlDialect {
    /** SQL Server, matching the reference loader's emitted DDL
      * (`rds/load_to_sqlserver.py`): BIT / DATETIME2 / NVARCHAR(n) /
      * NVARCHAR(MAX), `[bracket]` identifier quoting.
      */
    val SqlServer: SqlDialect = SqlDialect("sqlserver",
      c => s"[$c]", "NVARCHAR", "NVARCHAR(MAX)",
      Map("BOOLEAN" -> "BIT", "TIMESTAMP" -> "DATETIME2"))

    /** Embedded Derby (the engine JdbcSpec integration-tests against). */
    val Derby: SqlDialect = SqlDialect("derby",
      c => "\"" + c + "\"", "VARCHAR", "CLOB",
      Map("FLOAT" -> "DOUBLE"))

    val Postgres: SqlDialect = SqlDialect("postgres",
      c => "\"" + c + "\"", "VARCHAR", "TEXT",
      Map("FLOAT" -> "DOUBLE PRECISION"))
  }

  /** Render a full CREATE TABLE statement for `inferred` column types (as
    * returned by [[inferColumnTypes]]/[[writeTyped]]) in `dialect`'s DDL.
    * Column shape mirrors the reference: `<quoted-name> <TYPE> NULL`.
    * `table` is passed through verbatim — pre-quote it for the vendor
    * (the reference writes `[schema].[table]`).
    */
  def createTableDdl(table: String, inferred: Seq[(String, Option[String])],
      dialect: SqlDialect): String =
    inferred
      .map { case (c, t) => s"${dialect.quote(c)} ${dialect.render(t)} NULL" }
      .mkString(s"CREATE TABLE $table (", ", ", ")")
}
