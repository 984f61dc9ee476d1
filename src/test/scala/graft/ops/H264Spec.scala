package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class H264Spec extends AnyFunSuite {

  private def gradient(w: Int, h: Int, seed: Int): Array[Array[Int]] =
    Array.tabulate(h, w)((y, x) => (seed + 7 * x + 13 * y) % 256)

  test("exp-golomb: ue/se round-trip the full small range") {
    val bw = new H264.BitWriter
    (0 to 200).foreach(bw.ue)
    (-50 to 50).foreach(bw.se)
    bw.trailingBits()
    val br = new H264.BitReader(bw.toBytes)
    (0 to 200).foreach(v => assert(br.ue() == v))
    (-50 to 50).foreach(v => assert(br.se() == v))
  }

  test("emulation prevention: escape/unescape round-trips hostile byte runs") {
    val hostile = Array[Byte](0, 0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0)
    val escaped = H264.escapeRbsp(hostile)
    // every 00 00 in the escaped stream must be followed by 03 or >3
    (0 until escaped.length - 2).foreach { i =>
      if (escaped(i) == 0 && escaped(i + 1) == 0)
        assert((escaped(i + 2) & 0xff) >= 3, s"unescaped start code at $i")
    }
    assert(H264.unescapeRbsp(escaped).sameElements(hostile))
  }

  test("PCM codec: frames round-trip bit-exactly, including zero runs") {
    // all-zero plane forces long 00 runs through the NAL layer — the
    // emulation-prevention path is exercised for real
    val planes = Seq(gradient(48, 32, 5), Array.fill(32, 48)(0),
      Array.fill(32, 48)(255))
    val stream = H264.encodePcm(48, 32, planes)
    val back = H264.decodePcmFrames(stream)
    assert(back.length == 3)
    planes.zip(back).foreach { case (a, b) =>
      assert(a.flatten.toSeq == b.flatten.toSeq)
    }
  }

  test("SPS: parsed dimensions and frame count are real, cropping applies") {
    val stream = H264.encodePcm(64, 48, Seq(gradient(64, 48, 1), gradient(64, 48, 2)))
    val meta = H264.MetaDecoder.decodeBatch(Seq(stream)).head
    assert(meta.format == "h264")
    assert(meta.width == 64 && meta.height == 48)
    assert(meta.n_frames == 2)
  }

  test("decoder is a real parser, not a length guesser: poison safety") {
    val good = H264.encodePcm(16, 16, Seq(gradient(16, 16, 3)))
    // truncation mid-PCM must throw from the frame decoder...
    val truncated = good.take(good.length / 2)
    intercept[Exception](H264.decodePcmFrames(truncated))
    // ...and degrade to "unknown" through the poison-safe MediaDecoder
    val metas = H264.MetaDecoder.decodeBatch(
      Seq(truncated.take(8), Array[Byte](1, 2, 3), null, good))
    assert(metas.map(_.format) == Seq("unknown", "unknown", "unknown", "h264"))
  }

  test("subset boundary is loud: non-PCM macroblocks and bad dims are rejected") {
    intercept[IllegalArgumentException](
      H264.encodePcm(20, 16, Seq(Array.fill(16, 20)(0))))
    // hand-build a stream whose slice's first mb_type is Intra_4x4 (0),
    // NOT I_PCM: reuse a good stream's SPS/PPS, append the bad slice —
    // the decoder must name the seam instead of emitting garbage
    val e = intercept[IllegalArgumentException] {
      val bw = new H264.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
      bw.u(0, 1); bw.u(0, 1); bw.se(0)
      bw.ue(1) // disable_deblocking_filter_idc (the family PPS announces it)
      bw.ue(0) // mb_type Intra_4x4 — the boundary under test
      bw.trailingBits()
      val good16 = H264.encodePcm(16, 16, Seq(Array.fill(16, 16)(0)))
      val nals = H264.splitNals(good16)
      val out = new java.io.ByteArrayOutputStream()
      def writeNalRaw(t: Int, rbsp: Array[Byte]): Unit = {
        out.write(Array[Byte](0, 0, 0, 1)); out.write(0x60 | t)
        val esc = H264.escapeRbsp(rbsp); out.write(esc, 0, esc.length)
      }
      writeNalRaw(7, nals.collectFirst { case (7, _, r) => r }.get)
      writeNalRaw(8, nals.collectFirst { case (8, _, r) => r }.get)
      writeNalRaw(5, bw.toBytes)
      H264.decodePcmFrames(out.toByteArray)
    }
    assert(e.getMessage.contains("external decoder"), e.getMessage)
  }

  test("SPS cropping window: parsed display size subtracts the TOTAL luma crop once") {
    // hand-write a 1920x1088-grid SPS (120x68 MBs) with
    // frame_crop_bottom_offset = 4 (i.e. 8 cropped luma rows): the
    // standard 1080p layout. Parsed height must be 1080, not 1072
    // (double-subtraction) — and left/top offsets must count too.
    def sps(cl: Int, cr: Int, ct: Int, cb: Int): Array[Byte] = {
      val w = new H264.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(40, 8)  // profile/constraints/level
      w.ue(0); w.ue(0); w.ue(2); w.ue(0) // spsId, log2mfn-4, poc=2, refFrames
      w.u(0, 1)                          // gaps
      w.ue(120 - 1); w.ue(68 - 1)        // 120x68 MBs
      w.u(1, 1); w.u(0, 1)               // frame_mbs_only, direct_8x8
      w.u(1, 1)                          // frame_cropping_flag
      w.ue(cl); w.ue(cr); w.ue(ct); w.ue(cb)
      w.u(0, 1)                          // vui
      w.trailingBits()
      w.toBytes
    }
    val p1080 = H264.parseSps(sps(0, 0, 0, 4))
    assert(p1080.width == 1920 && p1080.height == 1080,
      s"${p1080.width}x${p1080.height}")
    val pLr = H264.parseSps(sps(1, 2, 3, 4))
    assert(pLr.width == 1920 - 2 * (1 + 2), s"left+right crop: ${pLr.width}")
    assert(pLr.height == 1088 - 2 * (3 + 4), s"top+bottom crop: ${pLr.height}")
  }

  test("frame count is pictures, not slice NALs (multi-slice encodings)") {
    // append a continuation slice (first_mb_in_slice = 1) to a 1-frame
    // stream: a real multi-slice picture has one slice NAL per slice, but
    // only ONE with first_mb_in_slice == 0
    val good = H264.encodePcm(32, 16, Seq(gradient(32, 16, 4)))
    val cont = {
      val bw = new H264.BitWriter
      bw.ue(1)        // first_mb_in_slice = 1 — NOT a new picture
      bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
      bw.u(0, 1); bw.u(0, 1); bw.se(0)
      bw.trailingBits()
      bw.toBytes
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(good)
    out.write(Array[Byte](0, 0, 0, 1)); out.write(0x65)
    val esc = H264.escapeRbsp(cont); out.write(esc, 0, esc.length)
    val meta = H264.MetaDecoder.decodeBatch(Seq(out.toByteArray)).head
    assert(meta.n_frames == 1, s"continuation slices must not count: ${meta.n_frames}")
  }

  test("PCM decoder rejects pic_order_cnt_type 0 and 1 loudly") {
    // poc types 0/1 put ordering fields in the slice header the subset
    // parser does not read — silently skipping them would shift every
    // later bit; the decoder must refuse instead
    def spsPoc(poc: Int): Array[Byte] = {
      val w = new H264.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(10, 8)
      w.ue(0); w.ue(0); w.ue(poc)
      if (poc == 0) w.ue(0)              // log2_max_pic_order_cnt_lsb-4
      w.ue(0); w.u(0, 1)
      w.ue(0); w.ue(0)                   // 1x1 MBs
      w.u(1, 1); w.u(0, 1); w.u(0, 1); w.u(0, 1)
      w.trailingBits()
      w.toBytes
    }
    for (poc <- Seq(0, 1)) {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0, 0, 0, 1)); out.write(0x67)
      val esc = H264.escapeRbsp(spsPoc(poc)); out.write(esc, 0, esc.length)
      // poc=1 needs extra SPS fields; only poc=0 parses cleanly here, so
      // assert on the DECODER's own rejection for poc 0 and the parse
      // error class for poc 1 — both are loud, neither yields frames
      val e = intercept[Exception](H264.decodePcmFrames(out.toByteArray))
      assert(e.getMessage != null, s"poc $poc must fail loudly")
    }
  }

  test("subset decoders reject interlaced, CABAC and MMCO streams loudly") {
    val good = H264.encodePcm(16, 16, Seq(gradient(16, 16, 9)))
    val nals = H264.splitNals(good)
    val goodPps = nals.collectFirst { case (8, _, r) => r }.get
    val goodSlice = nals.collectFirst { case (5, _, r) => r }.get
    def assemble(parts: (Int, Int, Array[Byte])*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { case (refIdc, t, rbsp) => H264.writeNal(out, refIdc, t, rbsp) }
      out.toByteArray
    }
    // interlaced: frame_mbs_only_flag = 0 (+ mb_adaptive flag) — every
    // slice header then carries an unread field_pic_flag
    val spsInterlaced = {
      val w = new H264.BitWriter
      w.u(66, 8); w.u(0, 8); w.u(10, 8)
      w.ue(0); w.ue(0); w.ue(2); w.ue(0); w.u(0, 1)
      w.ue(0); w.ue(0)             // 1x1 map units
      w.u(0, 1); w.u(0, 1)         // frame_mbs_only = 0, mb_adaptive = 0
      w.u(0, 1); w.u(0, 1); w.u(0, 1)
      w.trailingBits()
      w.toBytes
    }
    val e1 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, spsInterlaced), (3, 8, goodPps), (3, 5, goodSlice))))
    assert(e1.getMessage.contains("interlaced"), e1.getMessage)
    // CABAC: entropy_coding_mode_flag = 1 in the PPS
    val ppsCabac = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(0); w.u(1, 1); w.u(0, 1); w.ue(0)
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
      w.se(0); w.se(0); w.se(0); w.u(0, 1); w.u(0, 1); w.u(0, 1)
      w.trailingBits()
      w.toBytes
    }
    val goodSps = nals.collectFirst { case (7, _, r) => r }.get
    val e2 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, goodSps), (3, 8, ppsCabac), (3, 5, goodSlice))))
    assert(e2.getMessage.contains("CABAC"), e2.getMessage)
    // MMCO: a non-IDR reference slice with adaptive_ref_pic_marking = 1
    val sliceMmco = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(7); w.ue(0); w.u(1, 4) // frame_num 1 (non-IDR)
      w.u(1, 1)                            // adaptive flag = 1 -> MMCO follows
      w.trailingBits()
      w.toBytes
    }
    val e3 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, goodSps), (3, 8, goodPps), (3, 5, goodSlice),
        (2, 1, sliceMmco))))
    assert(e3.getMessage.contains("MMCO"), e3.getMessage)
  }

  test("subset decoders reject multi-SPS/PPS streams and foreign slice PPS ids loudly") {
    // ADVICE r12: a stream with several parameter sets would be parsed
    // with the FIRST one bound, so a slice referencing a later PPS
    // (different entropy/QP/deblocking) could silently bit-desync.
    def assemble(parts: (Int, Int, Array[Byte])*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach { case (refIdc, t, rbsp) => H264.writeNal(out, refIdc, t, rbsp) }
      out.toByteArray
    }
    def parts(stream: Array[Byte]): (Array[Byte], Array[Byte], Array[Byte]) = {
      val nals = H264.splitNals(stream)
      (nals.collectFirst { case (7, _, r) => r }.get,
        nals.collectFirst { case (8, _, r) => r }.get,
        nals.collectFirst { case (5, _, r) => r }.get)
    }
    val flat = Array.tabulate(16, 16)((y, x) => 40 + y + x)

    // a DIFFERING second parameter set (PPS id 1; an SPS with other dims)
    val ppsDiff = {
      val w = new H264.BitWriter
      w.ue(1); w.ue(0); w.u(0, 1); w.u(0, 1); w.ue(0)
      w.ue(0); w.ue(0); w.u(0, 1); w.u(0, 2)
      w.se(0); w.se(0); w.se(0); w.u(1, 1); w.u(0, 1); w.u(0, 1)
      w.trailingBits()
      w.toBytes
    }
    val spsDiff = H264.splitNals(H264.encodePcm(32, 16,
      Seq(gradient(32, 16, 9)))).collectFirst { case (7, _, r) => r }.get

    // PCM decoder: byte-identical REPEATS decode (real encoders re-send
    // the same SPS/PPS before every IDR for random access)...
    val (sps, pps, slice) = parts(H264.encodePcm(16, 16, Seq(gradient(16, 16, 9))))
    val repeated = H264.decodePcmFrames(assemble(
      (3, 7, sps), (3, 8, pps), (3, 8, pps), (3, 7, sps), (3, 5, slice)))
    val single = H264.decodePcmFrames(assemble(
      (3, 7, sps), (3, 8, pps), (3, 5, slice)))
    assert(repeated.length == single.length &&
      repeated.head(0).sameElements(single.head(0)))
    // ...but DIFFERING sets still reject loudly
    val e1 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, sps), (3, 8, pps), (3, 8, ppsDiff), (3, 5, slice))))
    assert(e1.getMessage.contains("PPS"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, sps), (3, 7, spsDiff), (3, 8, pps), (3, 5, slice))))
    assert(e2.getMessage.contains("SPS"), e2.getMessage)
    // a slice naming PPS 1 while the stream's only PPS is id 0
    val foreignSlice = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(7); w.ue(1) // first_mb, slice_type I, pps id 1
      w.trailingBits()
      w.toBytes
    }
    val e3 = intercept[IllegalArgumentException](H264.decodePcmFrames(
      assemble((3, 7, sps), (3, 8, pps), (3, 5, foreignSlice))))
    assert(e3.getMessage.contains("references PPS"), e3.getMessage)
    // zero PPS stays legal for the PCM decoder (metadata-only producers) —
    // the slice then carries NO deblocking field (nothing announced it)
    val ppslessSlice = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(7); w.ue(0)      // first_mb, slice_type I, pps id
      w.u(0, 4)                      // frame_num
      w.ue(0); w.u(0, 1); w.u(0, 1)  // idr_pic_id, dec_ref_pic_marking
      w.se(0)                        // slice_qp_delta
      w.ue(25)                       // mb_type I_PCM
      w.alignZero()
      for (i <- 0 until 256) w.u((40 + i % 16 + i / 16) & 0xff, 8)
      for (_ <- 0 until 128) w.u(128, 8)
      w.trailingBits()
      w.toBytes
    }
    val ppsless = H264.decodePcmFrames(assemble((3, 7, sps), (3, 5, ppslessSlice)))
    assert(ppsless.nonEmpty && ppsless.head(0)(0) == 40)

    // intra (CAVLC) decoder
    val intraGood = H264Cavlc.encodeIntra(1, 1, 26,
      Seq(Seq(H264Cavlc.PcmBlock(flat))))
    val (isps, ipps, islice) = parts(intraGood)
    val e4 = intercept[IllegalArgumentException](H264Cavlc.decodeIntraFrames(
      assemble((3, 7, isps), (3, 8, ipps), (3, 8, ppsDiff), (3, 5, islice))))
    assert(e4.getMessage.contains("PPS"), e4.getMessage)
    // identical repeats decode through the intra decoder too
    assert(H264Cavlc.decodeIntraFrames(assemble((3, 7, isps), (3, 8, ipps),
      (3, 8, ipps), (3, 5, islice))).head(0)(0) == flat(0)(0))
    val e5 = intercept[IllegalArgumentException](H264Cavlc.decodeIntraFrames(
      assemble((3, 7, isps), (3, 8, ipps), (3, 5, foreignSlice))))
    assert(e5.getMessage.contains("references PPS"), e5.getMessage)

    // inter decoder
    val interGood = H264Inter.encodeStream(1, 1, 26, flat,
      Seq(Seq(H264Inter.PSkip)))
    val (psps, ppps, pslice) = parts(interGood)
    val e6 = intercept[IllegalArgumentException](H264Inter.decodeFrames(
      assemble((3, 7, psps), (3, 8, ppps), (3, 8, ppsDiff), (3, 5, pslice))))
    assert(e6.getMessage.contains("PPS"), e6.getMessage)
    val e7 = intercept[IllegalArgumentException](H264Inter.decodeFrames(
      assemble((3, 7, psps), (3, 7, spsDiff), (3, 8, ppps), (3, 5, pslice))))
    assert(e7.getMessage.contains("SPS"), e7.getMessage)
  }

  test("3-byte start codes are accepted on parse (legal Annex-B variant)") {
    val four = H264.encodePcm(16, 16, Seq(gradient(16, 16, 9)))
    // rewrite 4-byte start codes as 3-byte ones
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < four.length) {
      if (i + 3 < four.length && four(i) == 0 && four(i + 1) == 0 &&
        four(i + 2) == 0 && four(i + 3) == 1) {
        out.write(Array[Byte](0, 0, 1)); i += 4
      } else { out.write(four(i)); i += 1 }
    }
    val three = out.toByteArray
    assert(three.length < four.length)
    val back = H264.decodePcmFrames(three)
    assert(back.head.flatten.toSeq == gradient(16, 16, 9).flatten.toSeq)
  }
}
