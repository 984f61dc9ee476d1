package graft.tools

/** JVM-only microbenchmark for the per-doc media kernels (no Spark):
  * isolates whether a scale-dir slowdown is in the kernel (id-dependent
  * cost?), in thread scaling (lock/allocator contention at 32 threads?),
  * or in Spark-land. Usage: runMain graft.tools.KernelProbe
  */
object KernelProbe {
  val phaseNanos: Array[java.util.concurrent.atomic.AtomicLong] =
    Array.fill(6)(new java.util.concurrent.atomic.AtomicLong)

  private def dibDocTimed(id: Long): Long = {
    def t[A](i: Int)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      phaseNanos(i).addAndGet(System.nanoTime() - t0)
      r
    }
    val nf = 3 + (id % 5).toInt
    val (w, h) = (32, 24)
    val frames = (0 until nf).map { k =>
      val g = ((7 * id + 13 * k) % 256).toInt
      val px = t(0)(Array.fill(h, w)((g << 16) | (g << 8) | g))
      t(1)(graft.ops.Avi.dibEncode(px))
    }
    val avi = t(2)(graft.ops.Avi.writeDib(32, 24, 40000, frames))
    t(3)(graft.ops.Multimodal.AviDibDecoder.decodeBatch(Seq(avi)))
    t(4)(graft.ops.Avi.sampleFrames(avi, 2, 4)).map { case (_, p) =>
      (t(5)(graft.ops.Avi.dibDecode(p, 32, 24)).get.apply(0)(0) & 0xff).toLong
    }.sum
  }

  /** q230's mapPartitions body verbatim over an arbitrary doc_id frame. */
  private def q230Shape(in: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("frame_idx", IntegerType),
      StructField("format", StringType), StructField("width", IntegerType),
      StructField("height", IntegerType), StructField("n_frames", IntegerType),
      StructField("n_sampled", IntegerType), StructField("gray", IntegerType)))
    in.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val nf = 3 + (id % 5).toInt
        val (w, h) = (32, 24)
        val frames = (0 until nf).map { k =>
          val g = ((7 * id + 13 * k) % 256).toInt
          graft.ops.Avi.dibEncode(Array.fill(h, w)((g << 16) | (g << 8) | g))
        }
        val avi = graft.ops.Avi.writeDib(w, h, usPerFrame = 40000, frames = frames)
        val meta = graft.ops.Multimodal.AviDibDecoder.decodeBatch(Seq(avi)).head
        val sampled = graft.ops.Avi.sampleFrames(avi, stride = 2, maxFrames = 4)
        sampled.map { case (idx, payload) =>
          val px = graft.ops.Avi.dibDecode(payload, w, h).get
          org.apache.spark.sql.Row(id, idx, meta.format, meta.width, meta.height,
            meta.n_frames, sampled.length, px(0)(0) & 0xff)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private def dibDoc(id: Long): Long = {
    val nf = 3 + (id % 5).toInt
    val (w, h) = (32, 24)
    val frames = (0 until nf).map { k =>
      val g = ((7 * id + 13 * k) % 256).toInt
      graft.ops.Avi.dibEncode(Array.fill(h, w)((g << 16) | (g << 8) | g))
    }
    val avi = graft.ops.Avi.writeDib(32, 24, 40000, frames)
    graft.ops.Multimodal.AviDibDecoder.decodeBatch(Seq(avi))
    graft.ops.Avi.sampleFrames(avi, 2, 4).map { case (_, p) =>
      (graft.ops.Avi.dibDecode(p, 32, 24).get.apply(0)(0) & 0xff).toLong
    }.sum
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // %f output must stay valid under any default locale
    def run(label: String, ids: Seq[Long]): Unit = {
      val t0 = System.nanoTime()
      val acc = ids.map(dibDoc).sum
      println(f"[kp] $label%-14s ${(System.nanoTime() - t0) / 1e6}%7.0f ms " +
        f"for ${ids.size} docs (acc=$acc)")
    }
    def runThreads(label: String, ids: Seq[Long], n: Int): Unit = {
      val t0 = System.nanoTime()
      val chunks = ids.grouped((ids.size + n - 1) / n).toSeq
      val ts = chunks.map(c => new Thread(() => { c.foreach(dibDoc); () }))
      ts.foreach(_.start()); ts.foreach(_.join())
      println(f"[kp] $label%-14s ${(System.nanoTime() - t0) / 1e6}%7.0f ms " +
        f"for ${ids.size} docs on $n threads")
    }
    val low = 0L until 4000L
    val high = (0L until 4000L).map(_ + 250000000L)
    if (args.headOption.contains("spark")) {
      // Same kernel inside Spark tasks, no parquet/no Bench: isolates the
      // task-context trigger. Three shapes: Dataset[Long] (typed, no Row
      // codec), DataFrame rows via the q230 Row encoder, and the q230
      // plan proper.
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[kp] $label%-14s ${(System.nanoTime() - t0) / 1e6}%7.0f ms")
      }
      val n = 130000L
      time("ds-long #1")(
        spark.range(0, n, 1, 32).map(id => dibDoc(id)).reduce(_ + _))
      time("ds-long #2")(
        spark.range(0, n, 1, 32).map(id => dibDoc(id)).reduce(_ + _))
      spark.stop()
      return
    }
    if (args.headOption.contains("phases")) {
      // Per-phase attribution inside Spark tasks via shared AtomicLongs
      // (driver == executor in local mode, so statics are visible).
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", 32)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      KernelProbe.phaseNanos.foreach(_.set(0))
      val t0 = System.nanoTime()
      spark.range(0, 130000L, 1, 32).map(id => dibDocTimed(id)).reduce(_ + _)
      println(f"[kp] spark wall    ${(System.nanoTime() - t0) / 1e6}%7.0f ms")
      val names = Seq("fill", "encode", "writeDib", "decodeBatch",
        "sampleFrames", "dibDecode")
      names.zip(KernelProbe.phaseNanos).foreach { case (n, a) =>
        println(f"[kp] phase $n%-13s ${a.get / 1e6}%9.0f ms (thread-summed)")
      }
      spark.stop()
      return
    }
    if (args.headOption.contains("bisect")) {
      // q230's exact shape minus one ingredient at a time.
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", 32)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"[kp] $label%-26s ${(System.nanoTime() - t0) / 1e6}%7.0f ms")
      }
      val noop = (df: org.apache.spark.sql.DataFrame) =>
        df.write.format("noop").mode("overwrite").save()
      val sfDir = "target/sf26"
      // A: scan only (doc_id read + spread, no kernel)
      val t = graft.core.Tables(spark, sfDir)
      val scan = t.documents.select("doc_id")
      println("[kp] planned scan partitions: " + scan.rdd.getNumPartitions)
      time("A0 scan only, no spread")(noop(scan))
      time("A0 scan again")(noop(t.documents.select("doc_id")))
      time("A scan+spread only") {
        noop(graft.core.Tables.spread(t.documents.select("doc_id")))
      }
      time("A scan+spread again") {
        noop(graft.core.Tables.spread(t.documents.select("doc_id")))
      }
      // B: full q230 but input from range (no parquet)
      val ids = spark.range(0, 130000L, 1, 32).toDF("doc_id")
      time("B q230-shape from range")(noop(q230Shape(ids)))
      // C: full q230 proper
      time("C q230 proper")(noop(
        graft.SparkEntry.queries("q230_raw_video_decode")(spark, sfDir)))
      // D: q230 proper again (warm JIT)
      time("D q230 proper again")(noop(
        graft.SparkEntry.queries("q230_raw_video_decode")(spark, sfDir)))
      spark.stop()
      return
    }
    if (args.headOption.contains("cold32")) {
      // NO single-thread warmup: straight to 32 threads on a cold JVM —
      // reproduces the Spark-stage shape where 32 task threads hit the
      // uncompiled kernel at once and the C2 compiler threads must
      // compete with them for cores
      runThreads("cold-32t", (0L until 128000L), 32)
      runThreads("warm-32t", (0L until 128000L), 32)
      return
    }
    run("warmup", low)
    run("low-1t", low)
    run("high-1t", high)
    run("low-again-1t", low)
    runThreads("low-32t", (0L until 128000L), 32)
    runThreads("high-32t", (0L until 128000L).map(_ + 250000000L), 32)
  }
}
