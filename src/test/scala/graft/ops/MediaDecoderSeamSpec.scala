package graft.ops

import graft.SparkTestBase

/** Integration-seam proof for the ONE acknowledged stub in the multimodal
  * family: H.264-class codecs are interface-only because no JDK codec
  * exists ([[Multimodal.MediaDecoder]] is the documented plug-in point).
  * This spec plays the role of the third-party library: a fake "external"
  * H.264 decoder — written entirely HERE, zero changes to `graft.ops` —
  * that parses a minimal Annex-B-shaped bitstream (4-byte start codes, NAL
  * unit types, an SPS-like record carrying dimensions) and slots into
  * [[Multimodal.withMediaMeta]] unchanged, poison-safety included. If this
  * compiles and passes, a real JavaCV/JCodec-backed decoder drops in the
  * same way on a cluster that ships the library.
  */
class MediaDecoderSeamSpec extends SparkTestBase {
  import spark.implicits._

  /** Stand-in for an external H.264 library: parses 00 00 00 01 start
    * codes; NAL type 7 (SPS) carries big-endian u16 width/height in its
    * first 4 payload bytes; NAL types 1/5 (coded slices) each count as one
    * frame. Anything without a leading start code + SPS is "unknown".
    */
  object FakeExternalH264Decoder extends Multimodal.MediaDecoder {
    private val StartCode = Array[Byte](0, 0, 0, 1)

    private def nalOffsets(b: Array[Byte]): Seq[Int] =
      (0 to b.length - 5).filter(i =>
        b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 0 && b(i + 3) == 1)

    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Multimodal.MediaMeta] =
      payloads.map { bytes =>
        try {
          val offs = nalOffsets(bytes)
          require(offs.nonEmpty && offs.head == 0, "no leading start code")
          val nals = offs.map(o => (bytes(o + 4) & 0x1f, o + 5))
          val (_, spsOff) = nals.find(_._1 == 7)
            .getOrElse(throw new IllegalArgumentException("no SPS"))
          val w = ((bytes(spsOff) & 0xff) << 8) | (bytes(spsOff + 1) & 0xff)
          val h = ((bytes(spsOff + 2) & 0xff) << 8) | (bytes(spsOff + 3) & 0xff)
          val frames = nals.count(n => n._1 == 1 || n._1 == 5)
          Multimodal.MediaMeta("h264", w, h, frames, bytes.length.toLong)
        } catch {
          case _: Exception =>
            val len = if (bytes == null) 0L else bytes.length.toLong
            Multimodal.MediaMeta("unknown", -1, -1, 0, len)
        }
      }

    /** Build a bitstream: one SPS with dims + `frames` coded slices. */
    def synthesize(w: Int, h: Int, frames: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(StartCode); out.write(7)
      out.write(Array[Byte]((w >> 8).toByte, w.toByte, (h >> 8).toByte, h.toByte))
      for (i <- 0 until frames) {
        out.write(StartCode); out.write(if (i == 0) 5 else 1)
        out.write(Array.fill[Byte](16)((i * 37 + 11).toByte)) // slice payload
      }
      out.toByteArray
    }
  }

  test("a third-party H.264 decoder slots into withMediaMeta unchanged") {
    val clip1 = FakeExternalH264Decoder.synthesize(1920, 1080, 24)
    val clip2 = FakeExternalH264Decoder.synthesize(640, 360, 3)
    val df = Seq((1L, clip1), (2L, clip2), (3L, Array[Byte](1, 2, 3)))
      .toDF("id", "payload")
    // exactly the call sites q35/q121 use — only the decoder argument differs
    val withMeta = Multimodal.withMediaMeta(df, "payload",
      decoder = FakeExternalH264Decoder, batchSize = 2)
    val rows = withMeta
      .select($"id", $"meta.format", $"meta.width", $"meta.height",
        $"meta.n_frames", $"meta.byte_len")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getLong(5))).toSet
    assert(rows == Set(
      (1L, "h264", 1920, 1080, 24, clip1.length.toLong),
      (2L, "h264", 640, 360, 3, clip2.length.toLong),
      (3L, "unknown", -1, -1, 0, 3L)))
  }

  test("the external decoder composes with downstream struct-pruning filters") {
    // the 100 TB contract: meta lands as a struct so filters prune without
    // touching payload bytes — same shape regardless of which decoder ran
    val clips = (1 to 40).map(i =>
      (i.toLong, FakeExternalH264Decoder.synthesize(16 * i, 9 * i, i % 7 + 1)))
    val df = clips.toDF("id", "payload")
    val wide = Multimodal.withMediaMeta(df, "payload",
      decoder = FakeExternalH264Decoder, batchSize = 8)
      .where($"meta.width" > 512)
      .select($"id", $"meta.n_frames")
    assert(wide.count() == clips.count(_._1 * 16 > 512))
    // and the AVI/MP4 decoders remain drop-in siblings behind the SAME trait
    val sibling: Multimodal.MediaDecoder = Multimodal.AviMjpegDecoder
    assert(sibling.isInstanceOf[Multimodal.MediaDecoder])
  }
}
