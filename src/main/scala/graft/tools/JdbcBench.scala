package graft.tools

import java.util.Locale

import graft.sources.Jdbc
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC scale evidence (VERDICT r14 item 6): S1/S2/S9 are Derby-gated for
  * CORRECTNESS (q73 round-trips supplier through an embedded database),
  * but carried no scale row. This main measures, against an embedded Derby
  * database loaded with the `orders` table of the given sf dir:
  *
  *  1. S9 `writeTyped` batch-size sweep — the CSV→DB load leg (all-string
  *     input, distributed type inference, typed batch insert) at
  *     batchsize 50 / 500 / 5000, each into its own table;
  *  2. S1 read scaling — one-connection [[Jdbc.readTable]] vs N-way
  *     [[Jdbc.readTablePartitioned]] (N concurrent range queries over an
  *     indexed key, the only JDBC read shape that survives a large table).
  *
  * The read target gets an INDEX on the partition column first (any real
  * deployment reads along a key; without it Derby answers every range
  * predicate with a full scan and N-way "parallelism" just repeats the
  * scan N times — measured and noted in BASELINE round 15).
  *
  * Embedded Derby shares one JVM with the executors, so N-way wall-clock
  * understates a real server (network round-trips overlap better than
  * shared-heap page latches), but the CONCURRENCY mechanics — N executor
  * threads each holding a connection and scanning a disjoint stride — are
  * exactly the cluster shape.
  *
  * Prints ONE JSON line: {"metric":"jdbc","rows":N,"write_s":{...},
  * "read_s":{...}}. Usage: runMain graft.tools.JdbcBench [sfDir] [parts...]
  */
object JdbcBench {

  private def time[A](body: => A): Double = {
    val t0 = System.nanoTime()
    body
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val parts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(2, 4, 8, 16)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft-jdbc-bench").toString
    System.setProperty("derby.stream.error.file", s"$tmp/derby.log")
    // Derby's page cache defaults to 1000 pages (~4 MB) — a multi-hundred-MB
    // table thrashes it the moment two range scans run concurrently (each
    // evicts the other's pages; measured: p8 took 5x p1). 1 GiB of pages
    // lets concurrent scans keep their working sets, which is the shape any
    // real server-class database gives the partitioned read.
    System.setProperty("derby.storage.pageCacheSize", "262144")
    val conn = Jdbc.Conn(s"jdbc:derby:$tmp/db;create=true;territory=en_US")

    // No date-like columns: the inference types bare-year-shaped digit
    // strings as TIMESTAMP (the documented pandas-parity branch —
    // Jdbc.inferColumnTypes), and o_custkey's 4–5 digit values trip it,
    // which Derby then rejects past year 9999 (ERROR 22007). The typed-DDL
    // inference is spec/gate-covered (q73, JdbcSpec); THIS row measures
    // batch size and read parallelism, so the table is a BIGINT key, a
    // VARCHAR status and a DECIMAL money column.
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val rows = orders.count()

    // ---- S9: writeTyped batch-size sweep (the CSV→DB leg: all-string in,
    // inference + typed insert out). Each batch size writes the same rows
    // into its own table; Derby cost is dominated by per-batch round trips.
    val asCsv = orders.select(orders.columns.map(c => col(c).cast("string").as(c)).toSeq: _*)
    System.err.println("[jdbc] inferred: " + Jdbc.inferColumnTypes(asCsv).mkString(", "))
    // SPARK_GRAFT_JDBC_SWEEP=0 loads once (bs 5000) — read-scaling-only runs
    val sweep = !sys.env.get("SPARK_GRAFT_JDBC_SWEEP").contains("0")
    val batches = if (sweep) Seq(50, 500, 5000) else Seq(5000)
    val writeS = batches.map { bs =>
      bs -> time {
        Jdbc.writeTyped(asCsv, conn, s"orders_bs$bs", SaveMode.Overwrite, batchSize = bs)
      }
    }
    // the reference's loader shape: ONE cursor, one executemany loop
    // (rds/load_to_sqlserver.py:224-263) — vs the S9 default above, where
    // every executor partition inserts concurrently
    val write1 = if (sweep) Some(time {
      Jdbc.writeTyped(asCsv.coalesce(1), conn, "orders_w1",
        SaveMode.Overwrite, batchSize = 5000)
    }) else None

    // ---- S1: single-connection vs N-way partitioned read of one loaded
    // table. Index the partition column first (the deployment-realistic
    // shape; see scaladoc).
    {
      val c = java.sql.DriverManager.getConnection(conn.url)
      try c.createStatement().execute(
        """CREATE INDEX orders_bs5000_pk ON orders_bs5000 ("o_orderkey")""")
      finally c.close()
    }
    val (lo, hi) = {
      val r = spark.read.format("jdbc").option("url", conn.url)
        .option("driver", conn.driver)
        .option("query", """SELECT MIN("o_orderkey") lo, MAX("o_orderkey") hi FROM orders_bs5000""")
        .load().collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def scan1(): DataFrame = Jdbc.readTable(spark, conn, "orders_bs5000", fetchSize = 1000)
    def scanN(n: Int): DataFrame = Jdbc.readTablePartitioned(spark, conn,
      "orders_bs5000", "o_orderkey", lo, hi + 1, n, fetchSize = 1000)
    drain(scan1()) // warm-up: page cache + codegen, outside every window
    val readS = (Seq(1 -> (() => scan1())) ++ parts.map(n => n -> (() => scanN(n))))
      .map { case (n, mk) => n -> Seq.fill(2)(time(drain(mk()))).min }

    val j = new StringBuilder
    j ++= "{\"metric\":\"jdbc\",\"sf_dir\":\"" + sfDir + "\",\"rows\":" + rows
    j ++= ",\"write_s\":{"
    j ++= (writeS.map { case (bs, s) =>
      "\"bs" + bs + "\":" + String.format(Locale.ROOT, "%.2f", Double.box(s))
    } ++ write1.map(s =>
      "\"single_conn\":" + String.format(Locale.ROOT, "%.2f", Double.box(s)))
    ).mkString(",")
    j ++= "},\"read_s\":{"
    j ++= readS.map { case (n, s) =>
      "\"p" + n + "\":" + String.format(Locale.ROOT, "%.2f", Double.box(s))
    }.mkString(",")
    j ++= "}}"
    println(j.toString)
    spark.stop()
  }
}
