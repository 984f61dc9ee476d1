package graft.ops

import graft.SparkTestBase

class AviSpec extends SparkTestBase {

  private def jpeg(gray: Int, w: Int = 48, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "no JPEG writer in JVM")
    bos.toByteArray
  }

  test("write → parse round-trips header metadata") {
    val frames = Seq(jpeg(16), jpeg(80), jpeg(144))
    val avi = Avi.write(48, 32, usPerFrame = 40000, frames = frames)
    val m = Avi.parse(avi).get
    assert(m.width == 48 && m.height == 32)
    assert(m.usPerFrame == 40000 && math.abs(m.fps - 25.0) < 1e-9)
    assert(m.totalFrames == 3 && m.nStoredFrames == 3)
    assert(m.nStreams == 1 && m.handler == "MJPG")
  }

  test("stored frames round-trip byte-exact, including odd-length payloads") {
    // MJPEG stores frames verbatim — an odd-length frame exercises the RIFF
    // pad byte (must not leak into the payload)
    val odd = Array.tabulate(1001)(i => (i % 251).toByte)
    val frames = Seq(jpeg(48), odd, jpeg(208))
    val avi = Avi.write(48, 32, 100000, frames)
    val back = Avi.frameChunks(avi)
    assert(back.size == 3)
    frames.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame payload must round-trip byte-exact")
    }
  }

  test("sampleFrames strides with original indices and bounded fan-out") {
    val frames = (0 until 7).map(i => jpeg(16 + 32 * (i % 8)))
    val avi = Avi.write(48, 32, 100000, frames)
    val sampled = Avi.sampleFrames(avi, stride = 2, maxFrames = 3)
    assert(sampled.map(_._1) == Seq(0, 2, 4), "stride-2 capped at 3 frames")
    assert(java.util.Arrays.equals(sampled(1)._2, frames(2)))
  }

  test("sampled frames decode through the ImageIO path to the planted gray") {
    val grays = Seq(16, 112, 240)
    val avi = Avi.write(48, 32, 100000, grays.map(jpeg(_)))
    val pool = new Multimodal.ImagePoolingExtractor(grid = 1)
    Avi.sampleFrames(avi, stride = 1, maxFrames = 3).zip(grays).foreach {
      case ((_, bytes), g) =>
        val lum = pool.extractBatch(Seq(bytes)).head(0) * 255.0
        assert(math.abs(lum - g) < 8.0,
          s"decoded mean luminance $lum should be within JPEG tolerance of $g")
    }
  }

  test("AviMjpegDecoder maps container metadata and degrades on poison") {
    val avi = Avi.write(64, 48, 50000, Seq(jpeg(80, 64, 48)))
    val Seq(good, junk, nul) = Multimodal.AviMjpegDecoder.decodeBatch(
      Seq(avi, Array.tabulate(64)(_.toByte), null))
    assert(good == Multimodal.MediaMeta("avi/mjpg", 64, 48, 1, avi.length.toLong))
    assert(junk.format == "unknown" && junk.byte_len == 64L)
    assert(nul == Multimodal.MediaMeta("unknown", -1, -1, 0, 0L))
  }

  test("poisoned containers degrade instead of throwing or spinning") {
    val avi = Avi.write(48, 32, 100000, Seq(jpeg(80), jpeg(144)))
    // truncations at every prefix length must never throw
    (0 until avi.length by 7).foreach { n =>
      Avi.parse(java.util.Arrays.copyOf(avi, n)) // must not throw
      Avi.frameChunks(java.util.Arrays.copyOf(avi, n))
    }
    // bit-flips across the header region must never throw or hang
    (0 until 200 by 3).foreach { i =>
      val mut = avi.clone(); mut(i) = (mut(i) ^ 0x5a).toByte
      Avi.parse(mut); Avi.frameChunks(mut)
    }
    // a chunk declaring a huge size must clamp, not overrun
    val big = avi.clone()
    // movi frame chunk size field: find first '00dc' and poison its size
    val idx = big.indexOfSlice("00dc".getBytes("ISO-8859-1"))
    assert(idx > 0)
    java.nio.ByteBuffer.wrap(big, idx + 4, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(Int.MaxValue)
    Avi.frameChunks(big) // clamped to the enclosing space — no OOB
  }

  test("raw DIB codec: pixel-exact round trip, odd-width padding, poison") {
    val rnd = new scala.util.Random(0xd1bL)
    // odd width (w=5 → 15 data bytes padded to 16 per row) exercises the
    // 4-byte row alignment; random pixels prove exactness beyond solids
    for (_ <- 1 to 50) {
      val (w, h) = (1 + rnd.nextInt(17), 1 + rnd.nextInt(13))
      val px = Array.fill(h, w)(rnd.nextInt(1 << 24))
      val enc = Avi.dibEncode(px)
      assert(enc.length == ((w * 3 + 3) & ~3) * h)
      val back = Avi.dibDecode(enc, w, h).get
      for (y <- 0 until h; x <- 0 until w)
        assert(back(y)(x) == px(y)(x), s"pixel ($x,$y) drifted at ${w}x$h")
    }
    // truncated payloads degrade to None, never throw
    val enc = Avi.dibEncode(Array.fill(4, 4)(0xabcdef))
    assert(Avi.dibDecode(enc.take(enc.length - 1), 4, 4).isEmpty)
    assert(Avi.dibDecode(null, 4, 4).isEmpty)
    assert(Avi.dibDecode(enc, 0, 4).isEmpty)
    // hostile header dims: w*3 would wrap an Int rowBytes negative and OOM
    // in the allocation — must degrade to None instead
    assert(Avi.dibDecode(enc, 715827883, 1).isEmpty)
    assert(Avi.dibDecode(enc, Int.MaxValue, Int.MaxValue).isEmpty)
    // ragged grids are refused loudly at encode time, not AIOOBE mid-row
    intercept[IllegalArgumentException] {
      Avi.dibEncode(Array(Array.fill(4)(0), Array.fill(2)(0)))
    }

    // full container round trip: writeDib('DIB ', 00db chunks) → parse
    // (handler avi/dib) → frameChunks byte-exact → dibDecode pixel-exact
    val frames = (0 until 3).map(k => Avi.dibEncode(Array.fill(6, 5)(k * 0x111111)))
    val avi = Avi.writeDib(5, 6, usPerFrame = 40000, frames = frames)
    val meta = Avi.parse(avi).get
    assert(meta.handler == "DIB " && meta.nStoredFrames == 3 &&
      meta.width == 5 && meta.height == 6)
    val metas = graft.ops.Multimodal.AviDibDecoder.decodeBatch(Seq(avi, null))
    assert(metas(0).format == "avi/dib" && metas(0).n_frames == 3)
    assert(metas(1).format == "unknown")
    Avi.frameChunks(avi).zipWithIndex.foreach { case (payload, k) =>
      assert(java.util.Arrays.equals(payload, frames(k)))
      assert(Avi.dibDecode(payload, 5, 6).get(0)(0) == k * 0x111111)
    }
  }
}
