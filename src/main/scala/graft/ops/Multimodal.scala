package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata.
  *
  * The Spark-side structure is real and tested — schema, partition-preserving
  * `mapPartitions`, batched decode shape (decoders see a whole batch, the
  * vectorized-UDF shape) — and for IMAGES and AUDIO the decode itself is
  * real too: [[ImageIoDecoder]] / [[ImagePoolingExtractor]] are backed by
  * the JDK's `javax.imageio` (PNG/JPEG/BMP/GIF) and [[AudioSystemDecoder]]
  * by `javax.sound.sampled` (WAV/AIFF/AU), no external libraries.
  * [[DeterministicFakeDecoder]] remains for payload-agnostic tests and
  * benchmarks. VIDEO is real for Motion-JPEG: [[AviMjpegDecoder]] parses
  * the RIFF/AVI container ([[Avi]]) and every stored frame is a complete
  * JPEG the ImageIO path decodes — container, sampling, and frame decode
  * all JDK-only; other codecs (H.264 …) still plug in through
  * [[MediaDecoder]] where an external library exists.
  *
  * All four kernels run as ENCODER-BASED `Dataset.mapPartitions` (round-2
  * fix; formerly `df.rdd.mapPartitions` + `createDataFrame`): the object
  * boundary stays inside one logical plan — no `LogicalRDD` barrier, so
  * column pruning, AQE, and codegen upstream/downstream of the kernel are
  * preserved, and only the kernel itself runs on deserialized rows (the
  * same boundary a `mapInArrow`/Pandas UDF has in PySpark).
  *
  * At 100 TB: payloads stay columnar-binary in parquet (no base64 strings),
  * decode runs partition-local with batch amortization, and metadata lands
  * in a struct column so downstream filters (`meta.width > 512`) prune
  * without touching payload bytes.
  */
object Multimodal {

  // Disk-backed ImageIO cache streams serialize concurrent codec tasks on
  // temp-file churn (see the ImageHash note); payloads here are KB-sized,
  // so memory-cached streams are strictly better. JVM-global; set in every
  // codec entry point so whichever classloads first flips it.
  javax.imageio.ImageIO.setUseCache(false)

  private def rowEncoder(schema: StructType) = org.apache.spark.sql.Encoders.row(schema)

  /** Batch decode interface — one call per partition-batch, mirroring the
    * vectorized (Arrow-batch) UDF shape.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaMeta]
  }

  final case class MediaMeta(format: String, width: Int, height: Int,
      n_frames: Int, byte_len: Long)

  /** Deterministic fake: metadata derived from content bytes (stable across
    * runs/partitionings), exercising the full plumbing.
    */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
      payloads.map { bytes =>
        val h = java.util.Arrays.hashCode(bytes)
        val fmt = Seq("jpeg", "png", "webp")(math.abs(h % 3))
        MediaMeta(fmt, 64 + math.abs(h % 1024), 64 + math.abs((h / 7) % 1024),
          1, bytes.length.toLong)
      }
  }

  /** REAL image decoder backed by `javax.imageio` (ships in the JDK —
    * PNG/JPEG/BMP/GIF/WBMP, no external libraries). Reads format and
    * dimensions from the header WITHOUT decoding pixel data (reader
    * metadata only), so it stays cheap on large payloads; frame count is
    * probed for multi-frame containers (GIF). Non-image payloads decode to
    * `("unknown", -1, -1, 0, len)` rather than throwing — at 100 TB a
    * poison payload must not kill the stage.
    *
    * Video/audio containers need external codecs: implement the same
    * [[MediaDecoder]] interface with them where available — the interface,
    * not a stub object, is the extension point.
    */
  object ImageIoDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
      payloads.map { bytes =>
        // EVERYTHING is inside the catch: a truncated header passes the
        // format probe but throws from getWidth/getHeight, and a null
        // payload would NPE building the stream — any of those must degrade
        // to "unknown", not kill the task
        try {
          if (bytes == null) MediaMeta("unknown", -1, -1, 0, 0L)
          else {
            val in = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(in)
              if (!readers.hasNext) MediaMeta("unknown", -1, -1, 0, bytes.length.toLong)
              else {
                val r = readers.next()
                r.setInput(in)
                try {
                  val frames =
                    try math.max(1, r.getNumImages(true))
                    catch { case _: Exception => 1 }
                  MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0),
                    frames, bytes.length.toLong)
                } finally r.dispose()
              }
            } finally if (in != null) in.close()
          }
        } catch {
          case _: Exception =>
            MediaMeta("unknown", -1, -1, 0, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }

  /** REAL audio decoder backed by `javax.sound.sampled.AudioSystem` (ships
    * in the JDK — WAV/AIFF/AU/SND containers, no external libraries).
    * `getAudioFileFormat` parses the HEADER only — no sample data is
    * decoded, so cost is O(1) in payload size, like [[ImageIoDecoder]].
    *
    * [[MediaMeta]] mapping for audio: `format` = container type ("wave",
    * "aiff", "au"), `width` = sample rate in Hz, `height` = channel count,
    * `n_frames` = sample-frame count (-1 when the header doesn't carry it).
    * Non-audio / truncated payloads degrade to `("unknown", -1, -1, 0,
    * len)` — poison-safe, same contract as the image decoder. Compressed
    * formats (MP3/OGG/AAC) need external SPI codecs: plug them in through
    * the same [[MediaDecoder]] interface; only VIDEO remains interface-only
    * in this container (no JDK video codec exists).
    */
  object AudioSystemDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
      payloads.map { bytes =>
        try {
          if (bytes == null) MediaMeta("unknown", -1, -1, 0, 0L)
          else {
            // cached SPI probe (SoundProviders) — AudioSystem's own
            // lookup re-scans providers under a global lock per call
            val aff = SoundProviders.audioFileFormat(bytes).getOrElse(
              throw new javax.sound.sampled.UnsupportedAudioFileException)
            val fmt = aff.getFormat
            MediaMeta(aff.getType.getExtension.toLowerCase,
              math.round(fmt.getSampleRate), fmt.getChannels,
              aff.getFrameLength, bytes.length.toLong)
          }
        } catch {
          // UnsupportedAudioFileException for non-audio; IOException and
          // friends for truncated headers — all degrade, never kill a task
          case _: Exception =>
            MediaMeta("unknown", -1, -1, 0, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }

  /** REAL video decoder for MJPEG-in-AVI ([[Avi]] container walk — pure
    * JVM). [[MediaMeta]] mapping: `format` = "avi/" + stream handler
    * (e.g. "avi/mjpg"), `width`/`height` from the main AVI header,
    * `n_frames` = frames actually STORED in `movi` (not the declared
    * count — a truncated file reports what survives). Header-only:
    * frame payloads are located but not decoded here; decode sampled
    * frames downstream via [[Avi.sampleFrames]] + [[ImagePoolingExtractor]].
    * Non-AVI payloads degrade to `("unknown", -1, -1, 0, len)` —
    * poison-safe, same contract as the other decoders.
    */
  object AviMjpegDecoder extends MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[MediaMeta] =
      payloads.map { bytes =>
        val parsed = if (bytes == null) None else Avi.parse(bytes)
        parsed match {
          case Some(m) =>
            MediaMeta("avi/" + m.handler.trim.toLowerCase, m.width, m.height,
              m.nStoredFrames, bytes.length.toLong)
          case None =>
            MediaMeta("unknown", -1, -1, 0, if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }

  /** Solid-gray JPEG through the REAL ImageIO codec — the shared planted
    * fixture for the video frame-decode queries (q121 AVI, q229 MP4) and
    * their specs; one definition so the gray-level/encoding can never
    * drift between a query and its oracle twin.
    */
  def solidGrayJpeg(gray: Int, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** REAL video decoder for UNCOMPRESSED (raw DIB) AVI — the second real
    * CODEC through [[MediaDecoder]] (MJPEG was the first; q229's MP4 was the
    * second container). The container walk and [[MediaMeta]] mapping are
    * codec-agnostic (the handler string distinguishes "avi/dib" from
    * "avi/mjpg"), so this IS [[AviMjpegDecoder]] under a codec-accurate
    * name; the frame payloads themselves decode with [[Avi.dibDecode]] —
    * pure arithmetic, pixel-exact, no image library at all.
    */
  val AviDibDecoder: MediaDecoder = AviMjpegDecoder

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("byte_len", LongType)))

  /** Attach decoded metadata as a `meta` struct column. Runs partition-local
    * (`mapPartitions`), decoding in batches of `batchSize` — the decoder
    * never sees single rows, matching the batched shape a vectorized decode
    * UDF would have. Payload column must be BinaryType.
    */
  def withMediaMeta(df: DataFrame, payloadCol: String,
      decoder: MediaDecoder = DeterministicFakeDecoder,
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val metas = decoder.decodeBatch(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.iterator.zip(metas.iterator).map { case (row, m) =>
          Row.fromSeq(row.toSeq :+ Row(m.format, m.width, m.height, m.n_frames, m.byte_len))
        }
      }
    }(rowEncoder(schema))
  }

  /** Demo payload table: documents' text as binary payloads (the container
    * has no media files; the plumbing is payload-agnostic).
    */
  def documentPayloads(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text").cast("binary").as("payload"),
      col("source"), col("lang"))

  // ---- feature-extract / resize / frame-sample ---------------------------
  // Same structure as decode: batched partition-local kernels behind small
  // Serializable interfaces; the fake kernels are deterministic functions of
  // the payload bytes so pipelines are testable end-to-end, and the real
  // kernels are explicit stubs (no media libraries in this container).

  /** Batched feature extractor: payload → fixed-dim float embedding. */
  trait FeatureExtractor extends Serializable {
    def dim: Int
    def extractBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]]
  }

  /** Deterministic fake: md5-seeded pseudo-embedding in [-0.5, 0.5)^dim. */
  final class FakeFeatureExtractor(override val dim: Int = 16) extends FeatureExtractor {
    override def extractBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        Array.tabulate(dim) { i =>
          val b = md(i % md.length) & 0xff
          (b / 256.0f) - 0.5f
        }
      }
  }

  /** REAL image embedding (JDK-only): decode via ImageIO, convert to
    * luminance, mean-pool onto a `grid`×`grid` patch grid → a dim=grid²
    * embedding in [0, 1]. Deterministic, codec-backed, and shaped exactly
    * like a learned-vision embedding for the ANN operators downstream;
    * undecodable payloads embed as the zero vector (poison-safe).
    */
  final class ImagePoolingExtractor(grid: Int = 4) extends FeatureExtractor {
    override val dim: Int = grid * grid
    override def extractBatch(payloads: Seq[Array[Byte]]): Seq[Array[Float]] =
      payloads.map { bytes =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => null }
        if (img == null) Array.fill(dim)(0.0f)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = Array.fill(dim)(0.0)
          val counts = Array.fill(dim)(0L)
          var y = 0
          while (y < h) {
            val gy = math.min(grid - 1, y * grid / h)
            var x = 0
            while (x < w) {
              val cell = gy * grid + math.min(grid - 1, x * grid / w)
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 0.299 +
                ((rgb >> 8) & 0xff) * 0.587 + (rgb & 0xff) * 0.114) / 255.0
              sums(cell) += lum
              counts(cell) += 1
              x += 1
            }
            y += 1
          }
          Array.tabulate(dim)(i =>
            if (counts(i) == 0) 0.0f else (sums(i) / counts(i)).toFloat)
        }
      }
  }

  /** Attach an `embedding array<float>` column — the bridge from multimodal
    * payloads into the [[Similarity]] ANN operators.
    */
  def withEmbedding(df: DataFrame, payloadCol: String,
      extractor: FeatureExtractor = new FakeFeatureExtractor(),
      batchSize: Int = 64): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("embedding", org.apache.spark.sql.types.ArrayType(FloatType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val embs = extractor.extractBatch(batch.map(_.getAs[Array[Byte]](payloadIdx)))
        batch.iterator.zip(embs.iterator).map { case (row, e) =>
          Row.fromSeq(row.toSeq :+ e.toSeq)
        }
      }
    }(rowEncoder(schema))
  }

  /** "Resize": payload → payload transform (fake = truncate/pad to
    * `targetBytes`, preserving the batched transform shape a real
    * image-resize kernel has).
    */
  def resized(df: DataFrame, payloadCol: String, targetBytes: Int): DataFrame = {
    val schema = df.schema
    val payloadIdx = schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val out = java.util.Arrays.copyOf(bytes, targetBytes)
        Row.fromSeq(row.toSeq.updated(payloadIdx, out))
      }
    }(rowEncoder(schema))
  }

  /** Frame sampling: payload → every `stride`-th chunk of `frameBytes`
    * bytes as an `array<binary>` column (the video-frame-sample shape:
    * one input row, bounded list of frame payloads; explode downstream for
    * per-frame processing).
    */
  def withFrameSamples(df: DataFrame, payloadCol: String, frameBytes: Int,
      stride: Int, maxFrames: Int = 8): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("frames", org.apache.spark.sql.types.ArrayType(BinaryType)))
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        val frames = Iterator.from(0, frameBytes * stride)
          .takeWhile(off => off < bytes.length)
          .take(maxFrames)
          .map(off => java.util.Arrays.copyOfRange(bytes, off,
            math.min(off + frameBytes, bytes.length)))
          .toSeq
        Row.fromSeq(row.toSeq :+ frames)
      }
    }(rowEncoder(schema))
  }
}
