package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM RIFF/AVI container parser + writer for MJPEG video — closes the
  * last interface-only multimodal path (frame DECODE). MP4 ([[Mp4]]) gave
  * container metadata but its tracks need external codecs; Motion-JPEG needs
  * none: every stored frame is a complete JPEG, decodable by the
  * already-proven `javax.imageio` path ([[Multimodal.ImageIoDecoder]] /
  * [[Multimodal.ImagePoolingExtractor]]). So AVI(MJPG) + ImageIO = real
  * end-to-end video frame decode with zero external libraries.
  *
  * Layout written/understood (RIFF is LITTLE-endian, chunks even-aligned):
  * {{{
  * RIFF('AVI ')
  *   LIST('hdrl')
  *     'avih' 56B  — µs/frame, total frames, width, height, stream count
  *     LIST('strl')
  *       'strh' 56B — fccType 'vids', handler 'MJPG', scale/rate, length
  *       'strf' 40B — BITMAPINFOHEADER, biCompression 'MJPG'
  *   LIST('movi')
  *     '00dc' <jpeg bytes> (+1 pad byte when odd)  × nFrames
  * }}}
  *
  * Parser hardening (same contract as [[Mp4.parse]]): bounds-checked reads,
  * chunk sizes clamped to the enclosing space, even-alignment advance can
  * never move backwards (so no infinite walk), and every malformed shape
  * returns `None` / no frames — a poison payload degrades, never kills a
  * task. Frame payloads round-trip BYTE-EXACT (MJPEG stores them verbatim),
  * which [[graft.queries]] and AviSpec exploit for oracle checks.
  */
object Avi {

  private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Container metadata: `usPerFrame`/`totalFrames`/`width`/`height` from
    * `avih`; `handler` from the first video `strh` (e.g. "MJPG");
    * `nStreams` from `avih`; `nStoredFrames` counts the actual `##dc`/`##db`
    * chunks inside `movi` (a truncated file can declare more than it
    * stores — both numbers are reported, the caller decides).
    */
  final case class Meta(usPerFrame: Long, totalFrames: Long, width: Int,
      height: Int, handler: String, nStreams: Int, nStoredFrames: Int) {
    def fps: Double = if (usPerFrame <= 0) -1.0 else 1e6 / usPerFrame
  }

  // ---- parsing -----------------------------------------------------------

  private final case class Scan(meta: Option[Meta], frames: Vector[(Int, Int)])

  /** One walk over the chunk tree: header fields + (offset, length) of every
    * stored frame chunk, in file order. None = not a parseable AVI.
    */
  private def scan(bytes: Array[Byte]): Option[Scan] = {
    try {
      if (bytes == null || bytes.length < 12) return None
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def u32(at: Int): Long = b.getInt(at).toLong & 0xffffffffL
      def cc(at: Int): String =
        if (at + 4 > bytes.length) "" else new String(bytes, at, 4, Iso)
      if (cc(0) != "RIFF" || cc(8) != "AVI ") return None
      val end = math.min(bytes.length.toLong, 8L + u32(4)).toInt

      var usPerFrame = -1L
      var totalFrames = -1L
      var width = -1
      var height = -1
      var nStreams = -1
      var handler = ""
      var sawVids = false
      var frames = Vector.empty[(Int, Int)]

      // iterative walk; depth bounded — hostile nesting can't recurse deep
      def walk(from: Int, to: Int, depth: Int): Unit = {
        if (depth > 8) return
        var off = from
        while (off + 8 <= to) {
          val id = cc(off)
          val size = u32(off + 4)
          val dataStart = off + 8
          val dataEnd = dataStart + math.min(size, (to - dataStart).toLong).toInt
          id match {
            case "LIST" =>
              // list type ('hdrl'/'strl'/'movi') is not dispatched on:
              // avih/strh/frame chunks are identified by their own ids, so
              // a hostile re-parented chunk can't hide from the guards
              if (dataEnd - dataStart >= 4) walk(dataStart + 4, dataEnd, depth + 1)
            case "avih" if dataEnd - dataStart >= 40 =>
              // payload offsets per AVIMAINHEADER: 0 µs/frame, 16 total
              // frames, 24 streams, 32 width, 36 height
              usPerFrame = u32(dataStart)
              totalFrames = u32(dataStart + 16)
              nStreams = u32(dataStart + 24).toInt
              width = u32(dataStart + 32).toInt
              height = u32(dataStart + 36).toInt
            case "strh" if dataEnd - dataStart >= 8 =>
              if (cc(dataStart) == "vids" && !sawVids) {
                sawVids = true
                handler = cc(dataStart + 4)
              }
            case fcc if fcc.length == 4 && fcc.charAt(0).isDigit && fcc.charAt(1).isDigit &&
                (fcc.endsWith("dc") || fcc.endsWith("db")) =>
              frames :+= ((dataStart, dataEnd - dataStart))
            case _ => ()
          }
          // even alignment; advance is always >= 8 so the walk terminates
          val advance = 8L + size + (size & 1L)
          val next = off + math.max(8L, advance)
          if (next <= off || next > Int.MaxValue) return
          off = next.toInt
        }
      }
      walk(12, end, 0)

      if (usPerFrame < 0 && frames.isEmpty) None
      else Some(Scan(Some(Meta(usPerFrame, totalFrames, width, height,
        handler, nStreams, frames.length)), frames))
    } catch { case _: Exception => None }
  }

  /** Header metadata; None for anything that isn't a parseable AVI. */
  def parse(bytes: Array[Byte]): Option[Meta] = scan(bytes).flatMap(_.meta)

  /** All stored frame payloads (byte-exact copies), in file order; empty on
    * malformed input. Bounded by the container's own size.
    */
  def frameChunks(bytes: Array[Byte]): Seq[Array[Byte]] =
    scan(bytes).map(_.frames.map { case (off, len) =>
      java.util.Arrays.copyOfRange(bytes, off, off + len)
    }).getOrElse(Vector.empty)

  /** Sample stored frames: every `stride`-th frame, at most `maxFrames`,
    * returned with their original frame index — the bounded fan-out shape
    * video pipelines need (one row in, ≤ maxFrames rows out; a 2-hour video
    * can't explode a task).
    */
  def sampleFrames(bytes: Array[Byte], stride: Int,
      maxFrames: Int): Seq[(Int, Array[Byte])] = {
    require(stride >= 1 && maxFrames >= 0, s"bad stride=$stride maxFrames=$maxFrames")
    scan(bytes).map { s =>
      s.frames.indices.by(stride).take(maxFrames).map { i =>
        val (off, len) = s.frames(i)
        (i, java.util.Arrays.copyOfRange(bytes, off, off + len))
      }
    }.getOrElse(Vector.empty)
  }

  // ---- raw DIB codec (uncompressed video frames) -------------------------

  /** Encode an RGB pixel grid (`pixels(y)(x)` = 0xRRGGBB, row 0 = top) as a
    * raw DIB frame: bottom-up rows of BGR triples, each row padded to a
    * 4-byte boundary — the BI_RGB layout uncompressed AVI stores. Pure
    * arithmetic; the inverse ([[dibDecode]]) recovers every pixel EXACTLY.
    */
  def dibEncode(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    require(h > 0 && pixels(0).nonEmpty, "empty pixel grid")
    val w = pixels(0).length
    require(pixels.forall(_.length == w),
      "ragged pixel grid: every row must have the same width")
    val rowBytes = (w * 3 + 3) & ~3
    val out = new Array[Byte](rowBytes * h)
    var y = 0
    while (y < h) {
      val row = pixels(h - 1 - y) // bottom-up storage
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val base = y * rowBytes + x * 3
        out(base) = (rgb & 0xff).toByte
        out(base + 1) = ((rgb >> 8) & 0xff).toByte
        out(base + 2) = ((rgb >> 16) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a raw DIB frame back to the RGB grid; None when the payload is
    * too short for `w`×`h` (poison contract — truncated frames degrade).
    */
  def dibDecode(bytes: Array[Byte], w: Int, h: Int): Option[Array[Array[Int]]] = {
    if (bytes == null || w <= 0 || h <= 0) return None
    // long arithmetic: w near Int.MaxValue/3 would wrap rowBytes negative,
    // sneak past the length bound, and OOM in the allocation below — w/h may
    // come from a hostile container header, so this is poison-contract code
    val rowBytes = (w.toLong * 3 + 3) & ~3L
    // division, not rowBytes*h: the product can overflow Long for hostile
    // w AND h both near Int.MaxValue, wrapping past the bound
    if (bytes.length / rowBytes < h) return None
    Some(Array.tabulate(h, w) { (y, x) =>
      val base = ((h - 1 - y) * rowBytes + x * 3).toInt
      ((bytes(base + 2) & 0xff) << 16) | ((bytes(base + 1) & 0xff) << 8) |
        (bytes(base) & 0xff)
    })
  }

  // ---- writing -----------------------------------------------------------

  /** A minimal MJPEG AVI from pre-encoded JPEG frames. All frames must share
    * `width`×`height` (MJPEG has no per-frame dims in the container; players
    * read them from each JPEG). Frames are stored verbatim in '00dc' chunks,
    * so [[frameChunks]] round-trips them byte-exact.
    */
  def write(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    writeWith(width, height, usPerFrame, frames,
      handler = "MJPG", compression = "MJPG".getBytes(Iso), chunkId = "00dc")

  /** An UNCOMPRESSED AVI from raw DIB frames ([[dibEncode]] payloads):
    * handler 'DIB ', biCompression BI_RGB(0), frames in '00db' chunks. The
    * second real CODEC through the container (MJPEG is the first) — raw
    * bottom-up BGR rows are how uncompressed AVI actually stores video, and
    * decode is pure arithmetic ([[dibDecode]]), so the round trip is
    * pixel-EXACT, not merely within JPEG loss.
    */
  def writeDib(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] =
    writeWith(width, height, usPerFrame, frames,
      handler = "DIB ", compression = u32le(0L), chunkId = "00db")

  private def u32le(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt((v & 0xffffffffL).toInt).array()

  private def writeWith(width: Int, height: Int, usPerFrame: Int,
      frames: Seq[Array[Byte]], handler: String, compression: Array[Byte],
      chunkId: String): Array[Byte] = {
    require(width > 0 && height > 0 && usPerFrame > 0,
      s"bad dims/rate: ${width}x$height @ $usPerFrame µs/frame")
    require(compression.length == 4, "biCompression must be 4 bytes")
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1
      val out = ByteBuffer.allocate(8 + payload.length + pad)
        .order(ByteOrder.LITTLE_ENDIAN)
      out.put(id.getBytes(Iso)); out.putInt(payload.length); out.put(payload)
      if (pad == 1) out.put(0.toByte)
      out.array()
    }
    def list(listType: String, children: Array[Byte]*): Array[Byte] = {
      val body = children.foldLeft(Array.emptyByteArray)(_ ++ _)
      val out = ByteBuffer.allocate(12 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      out.put("LIST".getBytes(Iso)); out.putInt(4 + body.length)
      out.put(listType.getBytes(Iso)); out.put(body)
      out.array()
    }
    def u32s(values: Long*): Array[Byte] = {
      val out = ByteBuffer.allocate(4 * values.length).order(ByteOrder.LITTLE_ENDIAN)
      values.foreach(v => out.putInt((v & 0xffffffffL).toInt))
      out.array()
    }
    val maxFrame = if (frames.isEmpty) 0L else frames.map(_.length).max.toLong

    val avih = chunk("avih", u32s(
      usPerFrame.toLong, // dwMicroSecPerFrame
      0L, 0L,            // dwMaxBytesPerSec, dwPaddingGranularity
      0L,                // dwFlags: no AVIF_HASINDEX (we write no idx1), not interleaved
      frames.length.toLong, // dwTotalFrames
      0L, 1L,            // dwInitialFrames, dwStreams
      maxFrame,          // dwSuggestedBufferSize
      width.toLong, height.toLong,
      0L, 0L, 0L, 0L))   // dwReserved[4]
    val strh = chunk("strh",
      "vids".getBytes(Iso) ++ handler.getBytes(Iso) ++ u32s(
        0L, 0L, 0L,      // dwFlags, wPriority|wLanguage, dwInitialFrames
        usPerFrame.toLong, // dwScale
        1000000L,        // dwRate  (rate/scale = fps)
        0L,              // dwStart
        frames.length.toLong, // dwLength
        maxFrame,        // dwSuggestedBufferSize
        0xffffffffL,     // dwQuality (-1 = default)
        0L,              // dwSampleSize (0 = varying, correct for MJPEG)
        0L,              // rcFrame left|top
        (height.toLong << 16) | width.toLong)) // rcFrame right|bottom
    // biSizeImage: for BI_RGB the true frame size includes each row's
    // padding to a 4-byte boundary (matches dibEncode's payload length);
    // for compressed formats (MJPEG) the field is advisory.
    val sizeImage =
      if (compression.forall(_ == 0)) ((width.toLong * 3 + 3) & ~3L) * height
      else width.toLong * height * 3
    val strf = chunk("strf", u32s(
      40L,               // biSize
      width.toLong, height.toLong,
      (24L << 16) | 1L)  // biPlanes=1 | biBitCount=24 (packed little-endian words)
      ++ compression     // biCompression: 'MJPG' fourcc or BI_RGB(0)
      ++ u32s(sizeImage, 0L, 0L, 0L, 0L))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", frames.map(chunk(chunkId, _)): _*)
    val body = "AVI ".getBytes(Iso) ++ hdrl ++ movi
    val out = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(Iso)); out.putInt(body.length); out.put(body)
    out.array()
  }
}
