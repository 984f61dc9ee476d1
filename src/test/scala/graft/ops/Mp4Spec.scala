package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkTestBase

class Mp4Spec extends SparkTestBase {

  private def bb(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.BIG_ENDIAN)

  test("write → parse round trip recovers every planted field") {
    val bytes = Mp4.write("mp42", timescale = 1000, durationTicks = 7321L,
      width = 640, height = 360, nSamples = 181, payloadLen = 37)
    val m = Mp4.parse(bytes).get
    assert(m.brand == "mp42")
    assert(m.timescale == 1000L && m.durationTicks == 7321L && m.durationMs == 7321L)
    assert(m.nTracks == 1 && m.videoWidth == 640 && m.videoHeight == 360)
    assert(m.nSamples == 181L)
    assert(bytes.length == Mp4.fixedOverhead + 37,
      s"fixedOverhead drifted: actual ${bytes.length - 37} (q84's oracle pins ${Mp4.fixedOverhead})")
  }

  test("duration scales by timescale (90kHz → ms)") {
    val bytes = Mp4.write("isom", timescale = 90000, durationTicks = 90000L * 3,
      width = 1920, height = 1080, nSamples = 72, payloadLen = 0)
    assert(Mp4.parse(bytes).get.durationMs == 3000L)
  }

  test("version-1 mvhd (64-bit times) is read") {
    // hand-built: ftyp(8+8) + moov(mvhd-v1); no tracks
    val mvhdPayload = bb(4 + 8 + 8 + 4 + 8).putInt(0x01000000)
      .putLong(0L).putLong(0L).putInt(600).putLong(1234567890123L).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(bb(16).putInt(16).put("ftyp".getBytes("ISO-8859-1"))
      .put("isom".getBytes("ISO-8859-1")).putInt(0).array())
    val mvhd = bb(8 + mvhdPayload.length).putInt(8 + mvhdPayload.length)
      .put("mvhd".getBytes("ISO-8859-1")).put(mvhdPayload).array()
    out.write(bb(8 + mvhd.length).putInt(8 + mvhd.length)
      .put("moov".getBytes("ISO-8859-1")).put(mvhd).array())
    val m = Mp4.parse(out.toByteArray).get
    assert(m.timescale == 600L && m.durationTicks == 1234567890123L && m.nTracks == 0)
  }

  test("64-bit largesize box header is honored") {
    // a single ftyp with size==1 + largesize, then moov with mvhd-v0
    val out = new java.io.ByteArrayOutputStream()
    out.write(bb(24).putInt(1).put("ftyp".getBytes("ISO-8859-1"))
      .putLong(24L).put("mp42".getBytes("ISO-8859-1")).putInt(0).array())
    val mvhdPayload = bb(4 + 8 + 4 + 4).putInt(0).putLong(0L).putInt(1000).putInt(555).array()
    val mvhd = bb(8 + mvhdPayload.length).putInt(8 + mvhdPayload.length)
      .put("mvhd".getBytes("ISO-8859-1")).put(mvhdPayload).array()
    out.write(bb(8 + mvhd.length).putInt(8 + mvhd.length)
      .put("moov".getBytes("ISO-8859-1")).put(mvhd).array())
    val m = Mp4.parse(out.toByteArray).get
    assert(m.brand == "mp42" && m.durationTicks == 555L)
  }

  test("poison payloads degrade to None, never throw or spin") {
    val good = Mp4.write("isom", 1000, 1000L, 320, 240, 24, 16)
    assert(Mp4.parse(null).isEmpty)
    assert(Mp4.parse(Array.emptyByteArray).isEmpty)
    assert(Mp4.parse("not a movie at all".getBytes).isEmpty)
    assert(Mp4.parse(good.take(Mp4.fixedOverhead / 2)).isEmpty) // truncated mid-moov
    // malformed size in [2,7] aborts the walk
    val badSize = good.clone(); bb(4).putInt(3).array().copyToArray(badSize, 0)
    assert(Mp4.parse(badSize).isEmpty)
    // wav bytes are not ISO BMFF
    assert(Mp4.parse("RIFF0000WAVEfmt ".getBytes("ISO-8859-1")).isEmpty)
  }

  test("audio-only track yields no video dimensions") {
    val bytes = Mp4.write("isom", 1000, 2000L, 320, 240, 24, 0)
    // patch the hdlr handler 4cc from 'vide' to 'soun' in place
    val idx = bytes.indexOfSlice("vide".getBytes("ISO-8859-1"))
    assert(idx > 0)
    "soun".getBytes("ISO-8859-1").copyToArray(bytes, idx)
    val m = Mp4.parse(bytes).get
    assert(m.nTracks == 1 && m.videoWidth == -1 && m.videoHeight == -1 && m.nSamples == 0L)
  }

  test("VideoContainerDecoder: MediaMeta mapping + poison contract") {
    val good = Mp4.write("avc1", 1000, 4000L, 1280, 720, 96, 8)
    val metas = Mp4.VideoContainerDecoder.decodeBatch(Seq(good, "junk".getBytes, null))
    assert(metas(0) == Multimodal.MediaMeta("avc1", 1280, 720, 96, good.length.toLong))
    assert(metas(1).format == "unknown" && metas(1).byte_len == 4L)
    assert(metas(2) == Multimodal.MediaMeta("unknown", -1, -1, 0, 0L))
  }

  test("fuzz: 2000 seeded-random payloads never throw; random round trips are exact") {
    val rnd = new scala.util.Random(0xbeefL) // seeded → deterministic failures
    // pure garbage of random lengths (incl. 0) — parse must return cleanly
    for (_ <- 1 to 1000) {
      val bytes = new Array[Byte](rnd.nextInt(256))
      rnd.nextBytes(bytes)
      Mp4.parse(bytes) // any Some is fine; throwing is the failure mode
    }
    // structured garbage: real files with random byte corruptions
    val base = Mp4.write("isom", 1000, 5000L, 640, 480, 120, 64)
    for (_ <- 1 to 500) {
      val corrupted = base.clone()
      for (_ <- 0 to rnd.nextInt(8))
        corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt(256).toByte
      Mp4.parse(corrupted)
    }
    // random-parameter round trips: everything planted must come back
    for (_ <- 1 to 500) {
      val ts = 1 + rnd.nextInt(90000)
      val dur = 1L + rnd.nextInt(1 << 30)
      val (w, h) = (rnd.nextInt(8192), rnd.nextInt(8192))
      val nf = rnd.nextInt(1 << 20)
      val m = Mp4.parse(Mp4.write("mp42", ts, dur, w, h, nf, rnd.nextInt(512))).get
      assert(m.timescale == ts && m.durationTicks == dur &&
        m.videoWidth == w && m.videoHeight == h && m.nSamples == nf)
    }
    // sample-table walk under the same contract: corrupted writeMjpeg
    // output and pure garbage must never throw or spin; random frame sets
    // must round-trip byte-exactly
    for (_ <- 1 to 300) {
      val frames = (0 until 1 + rnd.nextInt(7)).map { _ =>
        val b = new Array[Byte](1 + rnd.nextInt(64)); rnd.nextBytes(b); b
      }
      val mp4 = Mp4.writeMjpeg(1 + rnd.nextInt(256), 1 + rnd.nextInt(256),
        1 + rnd.nextInt(1000), frames)
      val back = Mp4.frames(mp4)
      assert(back.length == frames.length)
      frames.zip(back).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b))
      }
      val corrupted = mp4.clone()
      for (_ <- 0 to rnd.nextInt(8))
        corrupted(rnd.nextInt(corrupted.length)) = rnd.nextInt(256).toByte
      Mp4.sampleTable(corrupted) // any Some is fine; throwing/spinning is the failure
      val garbage = new Array[Byte](rnd.nextInt(256)); rnd.nextBytes(garbage)
      Mp4.sampleTable(garbage)
    }
  }

  test("writeMjpeg: sample tables locate every frame byte-exactly") {
    val rnd = new scala.util.Random(7L)
    val frames = (1 to 9).map { i =>
      val b = new Array[Byte](16 + rnd.nextInt(200)); rnd.nextBytes(b)
      b(0) = i.toByte; b
    }
    val mp4 = Mp4.writeMjpeg(640, 360, timescale = 30, frames)
    val m = Mp4.parse(mp4).get
    assert(m.brand == "mp42" && m.videoWidth == 640 && m.videoHeight == 360 &&
      m.nSamples == 9L)
    val back = Mp4.frames(mp4)
    assert(back.length == 9)
    frames.zip(back).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "frame bytes drifted")
    }
    // stride sampling mirrors Avi.sampleFrames
    val sampled = Mp4.sampleFrames(mp4, stride = 3, maxFrames = 2)
    assert(sampled.map(_._1) == Seq(0, 3))
    assert(java.util.Arrays.equals(sampled(1)._2, frames(3)))
  }

  test("multi-chunk stsc/stco layout is honored (hand-built, not writer output)") {
    // 5 samples of 4 bytes in chunks of (2,2,1) at offsets 300/320/340 —
    // proves the reader walks the general sample-to-chunk mapping, not just
    // writeMjpeg's single-chunk shape
    def rawBox(tpe: String, payload: Array[Byte]): Array[Byte] =
      bb(8 + payload.length).putInt(8 + payload.length)
        .put(tpe.getBytes("ISO-8859-1")).put(payload).array()
    val ftyp = rawBox("ftyp", bb(8).put("mp42".getBytes("ISO-8859-1")).putInt(0).array())
    val hdlr = rawBox("hdlr", bb(25).putInt(0).putInt(0)
      .put("vide".getBytes("ISO-8859-1")).putInt(0).putInt(0).putInt(0).put(0.toByte).array())
    val stsz = rawBox("stsz", bb(12 + 20).putInt(0).putInt(0).putInt(5)
      .putInt(4).putInt(4).putInt(4).putInt(4).putInt(4).array())
    val stsc = rawBox("stsc", bb(8 + 24).putInt(0).putInt(2)
      .putInt(1).putInt(2).putInt(1)   // chunks 1-2: 2 samples each
      .putInt(3).putInt(1).putInt(1).array()) // chunk 3+: 1 sample
    val stco = rawBox("stco", bb(8 + 12).putInt(0).putInt(3)
      .putInt(300).putInt(320).putInt(340).array())
    val stbl = rawBox("stbl", stsz ++ stsc ++ stco)
    val minf = rawBox("minf", stbl)
    val mdia = rawBox("mdia", hdlr ++ minf)
    val trak = rawBox("trak", mdia)
    val mvhd = rawBox("mvhd", bb(4 + 8 + 4 + 4).putInt(0).putLong(0L)
      .putInt(10).putInt(5).array())
    val moov = rawBox("moov", mvhd ++ trak)
    val head = ftyp ++ moov
    assert(head.length <= 300, s"header grew past the planted offsets: ${head.length}")
    // file = header, zero padding to 300, then 100 bytes of patterned data
    val bytes = head ++ new Array[Byte](300 - head.length) ++
      Array.tabulate[Byte](100)(i => (i + 1).toByte)
    val table = Mp4.sampleTable(bytes).get
    assert(table == Vector((300L, 4L), (304L, 4L), (320L, 4L), (324L, 4L), (340L, 4L)))
    assert(Mp4.frames(bytes)(2).toSeq == Seq[Byte](21, 22, 23, 24)) // bytes at 320..323
  }

  test("uniform-size stsz: truncated file degrades to the surviving prefix") {
    // hand-build a video stbl with uniform stsz (size 4, n=5), one chunk at
    // offset 200; truncate the file to 210 bytes → only 2 full samples
    // survive, and the table must report those 2, not reject everything
    def rawBox(tpe: String, payload: Array[Byte]): Array[Byte] =
      bb(8 + payload.length).putInt(8 + payload.length)
        .put(tpe.getBytes("ISO-8859-1")).put(payload).array()
    val ftyp = rawBox("ftyp", bb(8).put("mp42".getBytes("ISO-8859-1")).putInt(0).array())
    val hdlr = rawBox("hdlr", bb(25).putInt(0).putInt(0)
      .put("vide".getBytes("ISO-8859-1")).putInt(0).putInt(0).putInt(0).put(0.toByte).array())
    val stsz = rawBox("stsz", bb(12).putInt(0).putInt(4).putInt(5).array()) // uniform=4, n=5
    val stco = rawBox("stco", bb(12).putInt(0).putInt(1).putInt(200).array())
    val stbl = rawBox("stbl", stsz ++ stco)
    val moov = rawBox("moov", rawBox("mvhd", bb(20).putInt(0).putLong(0L)
      .putInt(10).putInt(5).array()) ++
      rawBox("trak", rawBox("mdia", hdlr ++ rawBox("minf", stbl))))
    val head = ftyp ++ moov
    assert(head.length <= 200)
    val full = head ++ new Array[Byte](220 - head.length)
    val truncated = full.take(210)
    // full file: clamp 5 → what fits (220/4 = 55 ≥ 5, all 5 located)
    assert(Mp4.sampleTable(full).get.length == 5)
    // truncated: 210/4 = 52 ≥ 5 sizes allocated, but only samples ending
    // ≤ 210 survive the per-sample bound: offsets 200,204 fit; 208+4 > 210
    assert(Mp4.sampleTable(truncated).get == Vector((200L, 4L), (204L, 4L)))
  }

  test("MjpegDecoder: real JPEG frames survive the MP4 round trip pixel-wise") {
    // solid-gray JPEGs through the REAL ImageIO codec, wrapped in MP4
    val (w, h) = (48, 32)
    val jpegs = (0 until 4).map(k => Multimodal.solidGrayJpeg(16 + 32 * k, w, h))
    val mp4 = Mp4.writeMjpeg(w, h, 10, jpegs)
    val metas = Mp4.MjpegDecoder.decodeBatch(Seq(mp4, "junk".getBytes, null))
    assert(metas(0) == Multimodal.MediaMeta("mp4/mp42", w, h, 4, mp4.length.toLong))
    assert(metas(1).format == "unknown" && metas(2).byte_len == 0L)
    // decode the extracted frames with the real codec: gray level survives
    val pool = new Multimodal.ImagePoolingExtractor(grid = 1)
    Mp4.frames(mp4).zipWithIndex.foreach { case (jpeg, k) =>
      val lum = pool.extractBatch(Seq(jpeg)).head(0) * 255.0
      val planted = 16 + 32 * k
      assert(math.abs(lum - planted) < 16.0,
        s"frame $k decoded luminance $lum vs planted $planted")
    }
  }

  test("q84 query matches its planted arithmetic at sf0.001") {
    import org.apache.spark.sql.functions._
    val df = graft.queries.MediaQ.videoMeta(spark, sf)
    val bad = df.filter(
      col("brand") =!= element_at(array(lit("isom"), lit("mp42"), lit("avc1")),
        (col("doc_id") % 3).cast("int") + 1) ||
      col("duration_ms") =!= lit(1000L) + col("doc_id") % 9000 ||
      col("width") =!= (lit(320) + (col("doc_id") % 8) * 80).cast("int") ||
      col("height") =!= (lit(240) + (col("doc_id") % 6) * 60).cast("int") ||
      col("n_frames") =!= (lit(24) + col("doc_id") % 240).cast("int") ||
      col("byte_len") =!= lit(Mp4.fixedOverhead.toLong) + 100 + col("doc_id") % 50)
    assert(bad.count() == 0)
  }
}
