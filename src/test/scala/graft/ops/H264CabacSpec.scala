package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[H264Cabac]] — the 9.3 entropy codec. Gates, strongest first:
  *  - cross-entropy pixel equality: the SAME planted macroblocks through
  *    the CAVLC and CABAC encoders must decode to IDENTICAL pixels (the
  *    prediction/transform layer is shared and q235-proven, so this pins
  *    the entire CABAC parse against the prefix-free-witnessed CAVLC);
  *  - bin-level engine round-trip fuzz over decisions/bypass/terminate;
  *  - hand-computable engine cases (bypass bit mapping, terminate);
  *  - Table 9-44/9-45 structural invariants.
  * The context INITIALIZATION constants have no in-container witness
  * (any values round-trip) — see the H264Cabac scaladoc for the seam.
  */
class H264CabacSpec extends AnyFunSuite {

  test("Table 9-44/9-45 structural invariants") {
    val t = H264Cabac.rangeTabLps
    assert(t.length == 64 && t.forall(_.length == 4))
    assert(t(0).sameElements(Array(128, 176, 208, 240)))
    assert(t(63).sameElements(Array(2, 2, 2, 2)))
    for (s <- 0 until 63) {
      // LPS ranges shrink as confidence grows (strictly, except the
      // quantization plateaus at the top) and grow with codIRange
      for (q <- 0 until 4) assert(t(s)(q) >= t(s + 1)(q) || s == 62)
      for (q <- 0 until 3) assert(t(s)(q) < t(s)(q + 1))
    }
    val l = H264Cabac.transIdxLps
    assert(l.length == 64)
    for (i <- 1 until 64) assert(l(i) >= l(i - 1)) // non-decreasing
    for (i <- 2 to 61) assert(l(i) < i) // LPS always drops confidence
    assert(l(0) == 0 && l(1) == 0)
  }

  test("engine: bypass bins round-trip exactly and cost ~1 bit each") {
    val rnd = new scala.util.Random(9301)
    val bits = Array.fill(2000)(rnd.nextInt(2))
    val w = new H264.BitWriter
    val e = new H264Cabac.ArithEncoder(w, 26)
    bits.foreach(e.bypass)
    e.terminate(1)
    w.alignZero()
    val bytes = w.toBytes
    // 2000 bypass bins cannot compress: ~250 bytes + flush overhead
    assert(bytes.length >= 250 && bytes.length <= 256, bytes.length)
    val d = new H264Cabac.ArithDecoder(new H264.BitReader(bytes), 26)
    bits.foreach(b => assert(d.bypass() == b))
    assert(d.terminate() == 1)
  }

  test("engine: decision/bypass/terminate fuzz round-trips bin-exact") {
    val rnd = new scala.util.Random(9302)
    for (trial <- 0 until 30) {
      val qp = 12 + rnd.nextInt(40)
      val n = 50 + rnd.nextInt(500)
      // (kind, ctx, bin): kind 0 = decision, 1 = bypass, 2 = terminate(0)
      val script = Array.fill(n) {
        rnd.nextInt(10) match {
          case 9 => (2, 0, 0)
          case k if k >= 6 => (1, 0, rnd.nextInt(2))
          case _ => (0, rnd.nextInt(276), rnd.nextInt(2))
        }
      }
      val w = new H264.BitWriter
      val e = new H264Cabac.ArithEncoder(w, qp)
      script.foreach {
        case (0, ctx, bin) => e.decision(ctx, bin)
        case (1, _, bin) => e.bypass(bin)
        case (2, _, _) => e.terminate(0)
      }
      e.terminate(1)
      w.alignZero()
      val d = new H264Cabac.ArithDecoder(new H264.BitReader(w.toBytes), qp)
      script.foreach {
        case (0, ctx, bin) => assert(d.decision(ctx) == bin, s"trial $trial")
        case (1, _, bin) => assert(d.bypass() == bin, s"trial $trial")
        case (2, _, _) => assert(d.terminate() == 0, s"trial $trial")
      }
      assert(d.terminate() == 1)
    }
  }

  test("engine: a biased context compresses far below 1 bit/bin") {
    val w = new H264.BitWriter
    val e = new H264Cabac.ArithEncoder(w, 26)
    (0 until 4000).foreach(_ => e.decision(100, 1))
    e.terminate(1)
    w.alignZero()
    // adaptation must drive the cost toward the entropy floor
    assert(w.toBytes.length < 120, w.toBytes.length)
    val d = new H264Cabac.ArithDecoder(new H264.BitReader(w.toBytes), 26)
    (0 until 4000).foreach(_ => assert(d.decision(100) == 1))
    assert(d.terminate() == 1)
  }

  private def rndPlans(rnd: scala.util.Random, mbsX: Int, mbsY: Int)
      : Seq[H264Cavlc.MbPlan] = {
    def sparse(n: Int, maxMag: Int): Array[Int] = {
      val a = new Array[Int](n)
      for (_ <- 0 until rnd.nextInt(6)) {
        val mag = 1 + rnd.nextInt(maxMag)
        a(rnd.nextInt(n)) = if (rnd.nextBoolean()) mag else -mag
      }
      a
    }
    Seq.tabulate(mbsX * mbsY) { mbIdx =>
      val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
      if (rnd.nextBoolean()) {
        val mode = (rnd.nextInt(4), mbX > 0, mbY > 0) match {
          case (0, _, true) => 0
          case (1, true, _) => 1
          case (3, true, true) => 3
          case _ => 2
        }
        H264Cavlc.I16x16(mode, sparse(16, 6),
          if (rnd.nextBoolean()) Array.fill(16)(sparse(15, 4)) else null,
          qpDelta = rnd.nextInt(3) - 1,
          chromaDc = if (rnd.nextBoolean())
            Array(sparse(4, 3), sparse(4, 3)) else null)
      } else {
        val modes = Array.tabulate(16) { b =>
          val (bx, by) = H264Cavlc.blk4x4(b)
          val hasLeft = mbX > 0 || bx > 0
          val hasTop = mbY > 0 || by > 0
          val pool = Seq(2) ++
            (if (hasTop) Seq(0, 3, 7) else Nil) ++
            (if (hasLeft) Seq(1, 8) else Nil) ++
            (if (hasTop && hasLeft) Seq(4, 5, 6) else Nil)
          pool(rnd.nextInt(pool.length))
        }
        val cbpLuma = rnd.nextInt(16)
        H264Cavlc.I4x4(modes, Array.fill(16)(sparse(16, 8)), cbpLuma,
          qpDelta = if (cbpLuma > 0) rnd.nextInt(3) - 1 else 0,
          chromaDc = if (cbpLuma > 0 && rnd.nextBoolean())
            Array(sparse(4, 3), sparse(4, 3)) else null)
      }
    }
  }

  test("cross-entropy: CAVLC and CABAC decode the same plans to the same pixels") {
    val rnd = new scala.util.Random(9303)
    for (trial <- 0 until 15) {
      val (mbsX, mbsY) = (3, 2)
      val qp = 14 + rnd.nextInt(36)
      val frames = Seq.fill(2)(rndPlans(rnd, mbsX, mbsY))
      val viaCavlc = H264Cavlc.decodeIntraFrames(
        H264Cavlc.encodeIntra(mbsX, mbsY, qp, frames))
      val viaCabac = H264Cabac.decodeIntraFrames(
        H264Cabac.encodeIntra(mbsX, mbsY, qp, frames))
      assert(viaCavlc.length == viaCabac.length)
      viaCavlc.zip(viaCabac).zipWithIndex.foreach { case ((a, b), f) =>
        a.zip(b).zipWithIndex.foreach { case ((ra, rb), y) =>
          assert(ra.sameElements(rb), s"trial $trial frame $f row $y")
        }
      }
    }
  }

  test("cross-entropy under the loop filter: deblocked pixels agree too") {
    val rnd = new scala.util.Random(9304)
    for (_ <- 0 until 5) {
      val qp = 24 + rnd.nextInt(16)
      val frames = Seq(rndPlans(rnd, 3, 1))
      val a = H264Cavlc.decodeIntraFrames(
        H264Cavlc.encodeIntra(3, 1, qp, frames, deblockIdc = 0,
          aOffD2 = 1, bOffD2 = -1))
      val b = H264Cabac.decodeIntraFrames(
        H264Cabac.encodeIntra(3, 1, qp, frames, deblockIdc = 0,
          aOffD2 = 1, bOffD2 = -1))
      a.head.zip(b.head).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
    }
  }

  // ---- inter (P slices): the q239 cross-entropy gate extended to motion.
  // Same planted pictures through both entropy codecs must decode to
  // identical pixels — any slip in the CABAC P binarizations, contexts,
  // or the Model's inter neighbor state desyncs the two immediately.

  private def rndPFrames(rnd: scala.util.Random, mbsX: Int, mbsY: Int,
      nFrames: Int): Seq[Seq[H264Inter.PMbPlan]] = {
    def sparse16(): Array[Array[Int]] = Array.tabulate(16) { _ =>
      if (rnd.nextInt(3) == 0) {
        val a = new Array[Int](16)
        for (_ <- 0 until 1 + rnd.nextInt(3)) {
          val m = 1 + rnd.nextInt(5)
          a(rnd.nextInt(16)) = if (rnd.nextBoolean()) m else -m
        }
        a
      } else null
    }
    def mv(): Int = rnd.nextInt(5) match {
      case 0 => 0
      case 1 => rnd.nextInt(9) - 4            // sub-pel neighborhood
      case 2 => rnd.nextInt(33) - 16          // ordinary motion
      case 3 => if (rnd.nextBoolean()) 9 else -9 // TU-prefix boundary
      case _ => rnd.nextInt(161) - 80         // UEG3 escape territory
    }
    Seq.tabulate(nFrames) { fi =>
      val maxRef = math.min(fi + 1, 3) // I + the previous P pictures
      Seq.tabulate(mbsX * mbsY) { _ =>
        rnd.nextInt(4) match {
          case 0 => H264Inter.PSkip
          case 1 | 2 =>
            val cbp = rnd.nextInt(16)
            H264Inter.P16x16(mv(), mv(),
              cbpLuma = cbp, levels = if (cbp > 0) sparse16() else null,
              qpDelta = if (cbp > 0) rnd.nextInt(3) - 1 else 0,
              refIdx = rnd.nextInt(maxRef))
          case 3 if rnd.nextBoolean() =>
            val cbp = rnd.nextInt(16)
            H264Inter.P8x8(
              Seq.fill(4) {
                val st = rnd.nextInt(4)
                H264Inter.Sub8x8(st, rnd.nextInt(maxRef),
                  Seq.fill(Array(1, 2, 2, 4)(st))((mv(), mv())))
              },
              cbpLuma = cbp, levels = if (cbp > 0) sparse16() else null,
              qpDelta = if (cbp > 0) rnd.nextInt(3) - 1 else 0)
          case _ =>
            val cbp = rnd.nextInt(16)
            H264Inter.PPart(wide = rnd.nextBoolean(),
              mv(), mv(), rnd.nextInt(maxRef),
              mv(), mv(), rnd.nextInt(maxRef),
              cbpLuma = cbp, levels = if (cbp > 0) sparse16() else null,
              qpDelta = if (cbp > 0) rnd.nextInt(3) - 1 else 0)
        }
      }
    }
  }

  private def assertFramesEqual(a: Seq[Array[Array[Int]]],
      b: Seq[Array[Array[Int]]], tag: String): Unit = {
    assert(a.length == b.length, tag)
    a.zip(b).zipWithIndex.foreach { case ((fa, fb), f) =>
      fa.zip(fb).zipWithIndex.foreach { case ((ra, rb), y) =>
        assert(ra.sameElements(rb), s"$tag frame $f row $y")
      }
    }
  }

  test("cross-entropy inter: CAVLC and CABAC P streams decode identically") {
    val rnd = new scala.util.Random(9305)
    for (trial <- 0 until 12) {
      val (mbsX, mbsY) = (3, 2)
      val qp = 16 + rnd.nextInt(32)
      val iMbs = rndPlans(rnd, mbsX, mbsY)
      val pFrames = rndPFrames(rnd, mbsX, mbsY, 3)
      val viaCavlc = H264Inter.decodeFrames(H264Inter.encodeStream(
        mbsX, mbsY, qp, iMbs, pFrames, 1, 0, 0, Nil, cabac = false))
      val viaCabac = H264Inter.decodeFrames(H264Inter.encodeStream(
        mbsX, mbsY, qp, iMbs, pFrames, 1, 0, 0, Nil, cabac = true))
      assertFramesEqual(viaCavlc, viaCabac, s"trial $trial")
    }
  }

  test("cross-entropy inter under the loop filter: deblocked P pixels agree") {
    val rnd = new scala.util.Random(9306)
    for (trial <- 0 until 5) {
      val qp = 24 + rnd.nextInt(16)
      val iMbs = rndPlans(rnd, 3, 2)
      val pFrames = rndPFrames(rnd, 3, 2, 2)
      val a = H264Inter.decodeFrames(H264Inter.encodeStream(
        3, 2, qp, iMbs, pFrames, 0, 1, -1, Nil, cabac = false))
      val b = H264Inter.decodeFrames(H264Inter.encodeStream(
        3, 2, qp, iMbs, pFrames, 0, 1, -1, Nil, cabac = true))
      assertFramesEqual(a, b, s"filtered trial $trial")
    }
  }

  test("cross-entropy inter: weighted prediction composes with CABAC") {
    val rnd = new scala.util.Random(9307)
    val iMbs = rndPlans(rnd, 2, 1)
    val pFrames = Seq(Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(6, -3), H264Inter.PSkip))
    val w = H264Inter.PredWeights(1, luma = Seq(Some((3, 4))))
    val a = H264Inter.decodeFrames(H264Inter.encodeStream(
      2, 1, 26, iMbs, pFrames, 1, 0, 0, Seq(Some(w)), cabac = false))
    val b = H264Inter.decodeFrames(H264Inter.encodeStream(
      2, 1, 26, iMbs, pFrames, 1, 0, 0, Seq(Some(w)), cabac = true))
    assertFramesEqual(a, b, "weighted")
  }

  test("mvd UEG3 boundaries decode exactly (0, ±1, ±8, ±9, ±16, ±200)") {
    // single-MB pictures: MB(0,0)'s predictor is always (0,0), so the
    // planted mv IS the coded mvd — each boundary value of the TU-prefix/
    // EG3-suffix split round-trips through both entropies to the same
    // decoded picture
    val vals = Seq(0, 1, -1, 8, -8, 9, -9, 16, -16, 200, -200)
    val iMbs = Seq[H264Cavlc.MbPlan](
      H264Cavlc.I16x16(2, Array(4) ++ Array.fill(15)(0)))
    val pFrames = vals.map(v => Seq[H264Inter.PMbPlan](H264Inter.P16x16(v, -v)))
    val a = H264Inter.decodeFrames(H264Inter.encodeStream(
      1, 1, 26, iMbs, pFrames, 1, 0, 0, Nil, cabac = false))
    val b = H264Inter.decodeFrames(H264Inter.encodeStream(
      1, 1, 26, iMbs, pFrames, 1, 0, 0, Nil, cabac = true))
    assertFramesEqual(a, b, "ueg3")
  }

  test("P mb_type / sub_mb_type binarizations match Tables 9-37/9-38 bin-exactly") {
    // The encoder and decoder share the binarization trees, so a swapped
    // branch round-trips invisibly (this KAT caught a real 2↔3 swap in
    // round 14). Bins are written RAW through the arithmetic engine and
    // read back through the decoder's public tree: Table 9-37 P mb_type
    // '000'→0, '001'→P_8x8(3), '010'→8x16(2), '011'→16x8(1); Table 9-38
    // sub_mb_type '1'→8x8(0), '00'→8x4(1), '011'→4x8(2), '010'→4x4(3).
    def viaBins(write: H264Cabac.ArithEncoder => Unit)(
        read: H264Cabac.PSliceDecoder => Int): Int = {
      val w = new H264.BitWriter
      val e = new H264Cabac.ArithEncoder(w, 26, pSlice = true)
      write(e)
      e.terminate(1) // flush
      w.alignZero()
      val pd = new H264Cabac.PSliceDecoder(
        new H264.BitReader(w.toBytes), 26, 1, 1)
      read(pd)
    }
    def mbType(b1: Int, b2: Int): Int =
      viaBins { e =>
        e.decision(14, 0); e.decision(15, b1)
        e.decision(if (b1 == 0) 16 else 17, b2)
      }(_.mbTypeP())
    assert(mbType(0, 0) == 0, "'000' must decode P_L0_16x16")
    assert(mbType(0, 1) == 3, "'001' must decode P_8x8")
    assert(mbType(1, 0) == 2, "'010' must decode P_L0_L0_8x16")
    assert(mbType(1, 1) == 1, "'011' must decode P_L0_L0_16x8")
    def subType(bins: Seq[Int]): Int =
      viaBins { e =>
        e.decision(21, bins.head)
        if (bins.length > 1) e.decision(22, bins(1))
        if (bins.length > 2) e.decision(23, bins(2))
      }(_.subMbTypeP())
    assert(subType(Seq(1)) == 0, "'1' must decode P_L0_8x8")
    assert(subType(Seq(0, 0)) == 1, "'00' must decode P_L0_8x4")
    assert(subType(Seq(0, 1, 1)) == 2, "'011' must decode P_L0_4x8")
    assert(subType(Seq(0, 1, 0)) == 3, "'010' must decode P_L0_4x4")
  }

  test("CABAC inter rejections: B slices and I_PCM references throw") {
    val iMbs = Seq[H264Cavlc.MbPlan](
      H264Cavlc.I16x16(2, Array(1) ++ Array.fill(15)(0)))
    val e1 = intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, iMbs,
        Seq(Seq(H264Inter.B16x16(mode = 0))), 1, 0, 0, Nil, cabac = true)
    }
    assert(e1.getMessage.contains("CABAC B slices"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, Seq(H264Cavlc.Pcm(90)),
        Seq(Seq(H264Inter.P16x16(0, 0))), 1, 0, 0, Nil, cabac = true)
    }
    assert(e2.getMessage.contains("I_PCM"), e2.getMessage)
  }

  test("metadata layer reads CABAC streams; wrong-entropy decodes are refused") {
    val frames = Seq(Seq[H264Cavlc.MbPlan](
      H264Cavlc.I16x16(2, Array(3) ++ Array.fill(15)(0))))
    val cabacStream = H264Cabac.encodeIntra(1, 1, 26, frames)
    val meta = H264.MetaDecoder.decodeBatch(Seq(cabacStream)).head
    assert(meta.format == "h264" && meta.width == 16 && meta.height == 16)
    val e1 = intercept[IllegalArgumentException] {
      H264Cavlc.decodeIntraFrames(cabacStream)
    }
    assert(e1.getMessage.contains("CABAC"), e1.getMessage)
    val cavlcStream = H264Cavlc.encodeIntra(1, 1, 26, frames)
    val e2 = intercept[IllegalArgumentException] {
      H264Cabac.decodeIntraFrames(cavlcStream)
    }
    assert(e2.getMessage.contains("CAVLC"), e2.getMessage)
    // I_PCM plans stay outside the CABAC subset, loudly
    val e3 = intercept[IllegalArgumentException] {
      H264Cabac.encodeIntra(1, 1, 26, Seq(Seq(H264Cavlc.Pcm(77))))
    }
    assert(e3.getMessage.contains("I_PCM"), e3.getMessage)
  }
}
