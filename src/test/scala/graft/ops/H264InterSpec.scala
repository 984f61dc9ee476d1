package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The P-slice (inter) codec: fractional-sample interpolation pinned
  * against an INDEPENDENT transcription of 8.4.2.2 (the expected integers
  * below were computed by a separate reimplementation of the 6-tap /
  * two-stage-center / quarter-average arithmetic, not by the code under
  * test), the 8.4.1.1 skip-motion rules, the Table 9-4 inter CBP column,
  * reference-buffer chaining, and the q236 plan end-to-end against the
  * same closed forms the DuckDB oracle uses.
  */
class H264InterSpec extends AnyFunSuite {

  test("inter CBP table: permutation of 0..47, spot values per Table 9-4") {
    assert(H264Inter.cbpInter.sorted.sameElements(0 until 48))
    // the three most-load-bearing entries: no-residual, luma-8x8-0, full
    assert(H264Inter.cbpInter(0) == 0)
    assert(H264Inter.cbpInter(2) == 1)
    assert(H264Inter.cbpInter(1) == 16)
    assert(H264Inter.cbpInter(12) == 47)
  }

  /** 48x32 gradient 50+x+2y with an impulse +40 at (10,10) — probing
    * around the impulse isolates individual tap weights; every one of the
    * 16 fractional positions is pinned.
    */
  private def impulseRef(): Array[Array[Int]] = {
    val ref = Array.tabulate(32, 48)((y, x) => 50 + x + 2 * y)
    ref(10)(10) += 40
    ref
  }

  test("lumaInterp: all 16 fractional positions match the independent model") {
    val ref = impulseRef()
    val cases = Seq(
      // (x, y, fx, fy) -> expected (computed by the independent model)
      (10, 10, 0, 0, 120), // full-pel fetch hits the impulse exactly
      (9, 10, 2, 0, 105),  // half b: +20·40 center tap
      (8, 10, 2, 0, 72),   // half b: −5·40 negative lobe
      (10, 9, 0, 2, 104),  // half h: +20·40 on the vertical filter
      (9, 9, 2, 2, 94),    // center j: 20·20·40 through the (+512)>>10 stage
      (9, 10, 1, 0, 92),   // quarter a
      (10, 9, 0, 1, 91),   // quarter d
      (9, 9, 3, 3, 105),   // quarter r = (m+s+1)>>1
      (9, 10, 3, 0, 113),  // quarter c
      (10, 9, 0, 3, 112),  // quarter n
      (9, 9, 1, 1, 78),    // e
      (9, 9, 2, 1, 86),    // f
      (9, 9, 3, 1, 91),    // g
      (9, 9, 1, 2, 86),    // i
      (9, 9, 3, 2, 99),    // k
      (9, 9, 1, 3, 92),    // p
      (9, 9, 2, 3, 100))   // q
    for ((x, y, fx, fy, want) <- cases)
      assert(H264Inter.lumaInterp(ref, x, y, fx, fy) == want,
        s"position ($x,$y)+($fx/4,$fy/4)")
  }

  test("chromaInterp: bilinear eighth-sample weights") {
    val ref = Array.tabulate(8, 8)((y, x) => 10 * y + x)
    // at (3,3) frac (2,5): ((8-2)(8-5)·33 + 2·3·34 + 6·5·43 + 2·5·44 + 32)>>6
    val want = ((6 * 3 * 33 + 2 * 3 * 34 + 6 * 5 * 43 + 2 * 5 * 44 + 32) >> 6)
    assert(H264Inter.chromaInterp(ref, 3, 3, 2, 5) == want)
    // integer position passes through
    assert(H264Inter.chromaInterp(ref, 4, 2, 0, 0) == 24)
  }

  private def grad(g0: Int): Array[Array[Int]] =
    Array.tabulate(32, 48)((y, x) => g0 + x + 2 * y)

  /** The 3x2 gradient as PCM plans (for reorder-overload calls that need
    * explicit MbPlans).
    */
  private def pcmPlans(ref: Array[Array[Int]]): Seq[H264Cavlc.MbPlan] =
    (0 until 6).map { mb =>
      val x0 = (mb % 3) * 16; val y0 = (mb / 3) * 16
      H264Cavlc.PcmBlock(Array.tabulate(16, 16)((y, x) => ref(y0 + y)(x0 + x)))
    }

  /** n gradient-ish Intra_16x16 plans — a non-PCM reference for CABAC
    * streams (I_PCM is outside the CABAC subset).
    */
  private def i16Plans(n: Int): Seq[H264Cavlc.MbPlan] =
    (0 until n).map(i =>
      H264Cavlc.I16x16(2, Array(2 + i) ++ Array.fill(15)(0)))

  test("skip motion: top row forces zero mv; zero-mv left neighbor forces zero") {
    val ref = grad(60)
    // top-LEFT skip: A and B unavailable -> mv 0 -> exact copy of ref
    val f = Seq[H264Inter.PMbPlan](H264Inter.PSkip, H264Inter.P16x16(8, 4),
      H264Inter.P16x16(8, 4), H264Inter.P16x16(8, 4),
      H264Inter.P16x16(8, 4), H264Inter.P16x16(8, 4))
    val d = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, 26, ref, Seq(f)))
    assert(d(1)(5)(5) == ref(5)(5), "top-left skip must copy at zero mv")
    // skip at (1,1) whose LEFT neighbor is a zero-mv inter MB: 8.4.1.1
    // forces zero even though B and C carry (8,4)
    val f2 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(8, 4), H264Inter.P16x16(8, 4),
      H264Inter.P16x16(8, 4), H264Inter.P16x16(0, 0),
      H264Inter.PSkip, H264Inter.P16x16(8, 4))
    val d2 = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, 26, ref, Seq(f2)))
    assert(d2(1)(20)(20) == ref(20)(20), "zero-mv A neighbor must zero the skip mv")
    // and WITHOUT a zero neighbor the same skip inherits the (8,4) median:
    // integer mv (2,1) -> copy from (22,21)
    val f3 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(8, 4), H264Inter.P16x16(8, 4),
      H264Inter.P16x16(8, 4), H264Inter.P16x16(8, 4),
      H264Inter.PSkip, H264Inter.P16x16(8, 4))
    val d3 = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, 26, ref, Seq(f3)))
    assert(d3(1)(20)(20) == ref(21)(22), "skip must inherit the neighbor median mv")
  }

  test("reference chaining: an all-skip second P frame reproduces frame 1") {
    val ref = grad(45)
    val lv = Array(2) ++ Array.fill(15)(0)
    val f1 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(5, 6), H264Inter.P16x16(5, 6),
      H264Inter.P16x16(5, 6), H264Inter.P16x16(5, 6), H264Inter.PSkip,
      H264Inter.P16x16(5, 6, cbpLuma = 1,
        levels = Array.tabulate(16)(b => if (b == 0) lv else null)))
    val f2 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.PSkip)
    val d = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, 24, ref, Seq(f1, f2)))
    assert(d.length == 3)
    // frame 2 == frame 1 everywhere (reference buffer advanced), and both
    // differ from frame 0 (so the assertion is not vacuous)
    assert(d(2).map(_.toSeq).toSeq == d(1).map(_.toSeq).toSeq)
    assert(d(1).map(_.toSeq).toSeq != d(0).map(_.toSeq).toSeq)
  }

  /** The q236 closed forms (cross-validated against the independent model
    * before being inlined in the oracle SQL) — the spec re-derives the five
    * probes for many doc ids and pins the decoder against them.
    */
  test("q236 plan end-to-end: probes match the oracle closed forms for 42 ids") {
    def clip(v: Long): Long = math.max(0L, math.min(255L, v))
    def fl(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val dqA = Array(10, 11, 13, 14, 16, 18)
    for (id <- 0L until 42L) {
      val c = (id % 7).toInt
      val qp = 20 + (id % 12).toInt
      val g0 = 40 + (id % 50).toInt
      val dl = 30 + (id % 60).toInt
      val lvl = (id % 5).toInt - 2
      val mvs = Array((4, 8), (10, 8), (8, 10), (10, 10), (9, 8), (8, 9), (11, 11))
      val (mvx, mvy) = mvs(c)
      val ref = Array.tabulate(32, 48)((y, x) => g0 + x + 2 * y)
      ref(10)(10) += dl
      val p16 = H264Inter.P16x16(mvx, mvy)
      val blk0 = Array(lvl) ++ Array.fill(15)(0)
      val withResid = H264Inter.P16x16(mvx, mvy, cbpLuma = 1,
        levels = Array.tabulate(16)(b => if (b == 0) blk0 else null))
      val f1p = Seq[H264Inter.PMbPlan](p16, p16, p16, p16, H264Inter.PSkip, withResid)
      val f2p = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.PSkip)
      val fs = H264Inter.decodeFrames(
        H264Inter.encodeStream(3, 2, qp, ref, Seq(f1p, f2p)))
      val f1 = fs(1); val f2 = fs(2)
      val main: Long = c match {
        case 0 => g0 + 30 + dl
        case 1 => fl(32 * (g0 + 29) + 32 + 20 * dl, 32)
        case 2 => fl(32 * (g0 + 28) + 48 + 20 * dl, 32)
        case 3 => fl(1024 * (g0 + 27) + 2048 + 400 * dl, 1024)
        case 4 => (g0 + 29 + fl(32 * (g0 + 29) + 32 + 20 * dl, 32) + 1) / 2
        case 5 => (g0 + 28 + fl(32 * (g0 + 28) + 48 + 20 * dl, 32) + 1) / 2
        case 6 => (fl(32 * (g0 + 28) + 48 + 20 * dl, 32) +
          fl(32 * (g0 + 29) + 32 + 20 * dl, 32) + 1) / 2
      }
      val aux: Long = c match {
        case 0 => g0 + 29
        case 1 => fl(32 * (g0 + 28) + 32 - 5 * dl, 32)
        case 2 => fl(32 * (g0 + 26) + 48 - 5 * dl, 32)
        case 3 => fl(1024 * (g0 + 23) + 2048 - 5 * dl, 1024)
        case 4 => (g0 + 28 + fl(32 * (g0 + 28) + 32 - 5 * dl, 32) + 1) / 2
        case 5 => (g0 + 26 + fl(32 * (g0 + 26) + 48 - 5 * dl, 32) + 1) / 2
        case 6 => g0 + 27
      }
      val skip: Long = g0 + Array(65, 67, 67, 68, 67, 67, 69)(c)
      val resid = fl(lvl.toLong * dqA(qp % 6) * (1L << (qp / 6)) + 32, 64)
      val resv: Long = g0 + (c match {
        case 0 => 72; case 3 => 75; case 6 => 76; case _ => 74
      }) + resid
      val mains = Array((9, 8), (7, 8), (8, 7), (7, 7), (7, 8), (8, 7), (7, 7))
      val auxes = Array((8, 8), (6, 8), (8, 6), (5, 6), (6, 8), (8, 6), (6, 6))
      assert(f1(mains(c)._2)(mains(c)._1) == clip(main), s"id=$id p_main")
      assert(f1(auxes(c)._2)(auxes(c)._1) == clip(aux), s"id=$id p_aux")
      assert(f1(20)(20) == clip(skip), s"id=$id p_skip")
      assert(f1(17)(33) == clip(resv), s"id=$id p_resid")
      assert(f2(17)(33) == clip(resv), s"id=$id p_f2")
    }
  }

  test("CAVLC intra reference: P pictures motion-compensate from decoded intra") {
    // the q237 shape: PCM gradient tiles + one real Intra_16x16 DC CAVLC MB
    // at (2,1); a P MB reads the CAVLC region, so the probe only matches if
    // intra decode and inter MC compose. Closed forms re-derived here
    // independently (8.3.3.3 DC pred + q235 Hadamard-DC scaling).
    def fl(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val dqA = Array(10, 11, 13, 14, 16, 18)
    for (id <- 0L until 21L) {
      val c = (id % 7).toInt
      val qp = 20 + (id % 12).toInt
      val g0 = 40 + (id % 50).toInt
      val dl = 30 + (id % 60).toInt
      val l0 = (id % 7).toInt - 3
      val mvs = Array((4, 8), (10, 8), (8, 10), (10, 10), (9, 8), (8, 9), (11, 11))
      val (mvx, mvy) = mvs(c)
      def tile(mbX: Int, mbY: Int) = H264Cavlc.PcmBlock(
        Array.tabulate(16, 16) { (y, x) =>
          val fx = mbX * 16 + x; val fy = mbY * 16 + y
          val g = g0 + fx + 2 * fy
          if (fx == 10 && fy == 10) g + dl else g
        })
      val iMbs = Seq[H264Cavlc.MbPlan](
        tile(0, 0), tile(1, 0), tile(2, 0), tile(0, 1), tile(1, 1),
        // I_PCM zeroes QP_Y,prev (7.4.5) — restore the planted QP
        H264Cavlc.I16x16(2, Array(l0) ++ Array.fill(15)(0),
          qpDelta = H264Cavlc.qpRestoreDelta(qp)))
      val p16 = H264Inter.P16x16(mvx, mvy)
      val fs = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, qp, iMbs,
        Seq(Seq[H264Inter.PMbPlan](p16, p16, p16, p16, H264Inter.PSkip, p16),
          Seq.fill[H264Inter.PMbPlan](6)(H264Inter.PSkip))))
      // the CAVLC MB decodes flat: DC pred over the PCM gradient neighbors
      // = (32*g0 + 2376)>>5 = g0+74, plus the Hadamard-DC residual
      val v5 = g0 + 74 + fl(l0.toLong * dqA(qp % 6) * (1L << (qp / 6 - 2)) + 32, 64)
      assert(fs(0)(20)(40) == v5, s"id=$id intra-decode flat value")
      // the P MB at (2,1) reads the flat CAVLC region: interpolation-
      // invariant, so every fractional class returns v5 exactly
      assert(fs(1)(20)(36) == v5, s"id=$id MC from the CAVLC region")
      // and the all-skip second P frame chains off frame 1
      assert(fs(2)(20)(36) == v5, s"id=$id chained reference")
      // the impulse probe (PCM region) must be UNCHANGED by the mixed
      // reference: same closed form as the all-PCM stream (class 0 only,
      // spot check — the full set is q236/q237's oracle surface)
      if (c == 0) assert(fs(1)(8)(9) == math.min(255, g0 + 30 + dl), s"id=$id")
    }
  }

  test("P-to-P chain with motion: frame 2 reads frame 1's decoded pixels") {
    // integer-pel motion makes the check exact WITHOUT re-using the
    // interpolator: f2(y)(x) must equal f1(y)(x+1) (mv (4,0) = one full
    // luma sample right), where f1 itself came from a quarter-pel MC of
    // the gradient — so this pins the reference-buffer update and the
    // per-picture MV-grid reset under real motion, not just all-skip
    val ref = impulseRef()
    val p1 = H264Inter.P16x16(9, 8)     // quarter-pel: f1 differs from f0
    val p2 = H264Inter.P16x16(4, 0)     // integer-pel read of f1
    val fs = H264Inter.decodeFrames(H264Inter.encodeStream(3, 2, 26, ref,
      Seq(Seq.fill[H264Inter.PMbPlan](6)(p1), Seq.fill[H264Inter.PMbPlan](6)(p2))))
    assert(fs.length == 3)
    val f1 = fs(1); val f2 = fs(2)
    assert(f1.map(_.toSeq).toSeq != fs(0).map(_.toSeq).toSeq)
    for (y <- 0 until 32; x <- 0 until 46)
      assert(f2(y)(x) == f1(y)(x + 1), s"($x,$y)")
    // the last column clamps at the frame edge (8.4.2.2.1)
    for (y <- 0 until 32; x <- 46 until 48)
      assert(f2(y)(x) == f1(y)(47), s"($x,$y) edge clamp")
  }

  test("chroma motion compensation: eighth-pel bilinear across MB fills") {
    // I frame: per-MB chroma fills 40+10*mb make a chroma plane that
    // changes at MB boundaries; a P MB with mv (3,2) (chroma frac (3,2),
    // integer 0) must bilinear-blend across the boundary with the 8-266
    // weights — hand-computed here, read through the full-plane decode
    val iMbs = (0 until 6).map { mb =>
      H264Cavlc.PcmBlock(Array.fill(16, 16)(90), chroma = 40 + 10 * mb)
    }
    val p16 = H264Inter.P16x16(3, 2)
    val fs = H264Inter.decodeFramesFull(H264Inter.encodeStream(3, 2, 26, iMbs,
      Seq(Seq.fill[H264Inter.PMbPlan](6)(p16))))
    val (_, cb0, _) = fs(0)
    assert(cb0(3)(7) == 40 && cb0(3)(8) == 50, "I-frame chroma fills")
    val (_, cb1, cr1) = fs(1)
    // probe (7,3): A=(7,3)=40 B=(8,3)=50 C=(7,4)=40 D=(8,4)=50, frac (3,2):
    // ((8-3)(8-2)*40 + 3*(8-2)*50 + (8-3)*2*40 + 3*2*50 + 32) >> 6
    val want = ((5 * 6 * 40 + 3 * 6 * 50 + 5 * 2 * 40 + 3 * 2 * 50 + 32) >> 6)
    assert(cb1(3)(7) == want, s"got ${cb1(3)(7)} want $want")
    assert(cr1(3)(7) == want, "cr shares the fill, so the same blend")
    // interior of MB0 (no boundary in the 2x2 support): blend of equals = 40
    assert(cb1(3)(3) == 40)
  }

  test("intra chroma DC reconstruction: dequant + 2x2 Hadamard + DC pred") {
    // an I4x4 MB with planted chroma DC levels and no neighbors: pred is
    // the 128 gray default, the residual is the hand arithmetic
    // scaleChromaDc(e0, qpc) then (+32)>>6. qp 28 -> qpc 28, V_A 16,
    // shift 4: e0=3 -> +6; e0=-2 -> -4 (arithmetic shift = floor)
    val stream = H264Cavlc.encodeIntra(1, 1, 28, Seq(Seq(
      H264Cavlc.I4x4(Array.fill(16)(2),
        Array.fill(16)(Array.fill(16)(0)), cbpLuma = 0,
        chromaDc = Array(Array(3, 0, 0, 0), Array(-2, 0, 0, 0))))))
    val (luma, cb, cr) = H264Inter.decodeFramesFull(stream).head
    assert(luma(0)(0) == 128, "no-neighbor luma DC pred is 128")
    assert(cb.forall(_.forall(_ == 134)), s"cb ${cb(0)(0)}")
    assert(cr.forall(_.forall(_ == 124)), s"cr ${cr(0)(0)}")
  }

  // ---- hand-assembled raw slice bits (ADVICE r12): encoder/decoder share
  // mvPred and the Table 9-4 inter column, so encode→decode round trips
  // cannot catch a shared-predictor or CBP-table transcription bug. These
  // slices are written bit-by-bit from the published syntax (7.3.3/7.3.4/
  // 7.3.5), with cbp codewords and expected pixels derived BY HAND in the
  // comments — never through cbpInterInv or mvPred.

  /** SPS+PPS+IDR prefix from the proven encoder (reference content is
    * I_PCM — entropy-trivial), with a raw hand-built P NAL appended.
    * refIdc 0 ⇒ the slice header carries no dec_ref_pic_marking.
    */
  private def withHandSlice(mbsX: Int, ref: Array[Array[Int]],
      body: H264.BitWriter => Unit): Array[Byte] = {
    val base = H264Inter.encodeStream(mbsX, 1, 26, ref, Nil)
    val w = new H264.BitWriter
    w.ue(0)       // first_mb_in_slice
    w.ue(0)       // slice_type = 0 (P)
    w.ue(0)       // pic_parameter_set_id
    w.u(1, 4)     // frame_num
    w.u(0, 1)     // num_ref_idx_active_override_flag
    w.u(0, 1)     // ref_pic_list_modification_flag_l0
    body(w)       // slice_qp_delta onward
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    H264.writeNal(out, 0, 1, w.toBytes) // non-reference non-IDR slice
    out.toByteArray
  }

  test("hand-assembled mvd bits: nonzero mvd over the hand-derived predictor") {
    // 32x16 ramp: ref(y)(x) = 3x + 2y + 20 (max 143, no clipping anywhere)
    val ref = Array.tabulate(16, 32)((y, x) => 3 * x + 2 * y + 20)
    val stream = withHandSlice(2, ref, { w =>
      w.se(0)     // slice_qp_delta (qp 26; no residual coded)
      w.ue(1)     // disable_deblocking_filter_idc = 1
      // MB0: A/B/C/D all address-unavailable -> 8.4.1.3.2 median of three
      // zeros -> predictor (0,0); mvd (+4,0) = one integer pel right
      w.ue(0); w.ue(0)        // mb_skip_run, mb_type P_L0_16x16
      w.se(4); w.se(0)        // mvd_l0
      w.ue(0)                 // cbp 0 (Table 9-4: inter codeNum 0)
      // MB1: only A (MB0) is available and referenced -> both the
      // exactly-one-match rule AND the B/C/D-unavailable directional rule
      // give predictor = mvA = (4,0); mvd (-4,0) cancels it -> mv (0,0)
      w.ue(0); w.ue(0)
      w.se(-4); w.se(0)
      w.ue(0)
    })
    val last = H264Inter.decodeFrames(stream).last
    for (y <- 0 until 16; x <- 0 until 32) {
      // MB0 shifted one pel right (x+1 <= 16 < 32: clamp never engages);
      // MB1 identical to the reference — WRONG predictor handling would
      // shift MB1 or double-shift MB0
      val want = if (x < 16) ref(y)(x + 1) else ref(y)(x)
      assert(last(y)(x) == want, s"($x,$y): got ${last(y)(x)}, want $want")
    }
  }

  test("hand-assembled cbp bits: full (15) and partial (2) luma patterns beyond {0,1}") {
    // flat-100 reference; zero mv -> prediction is flat 100. At slice QP
    // 24 (qp%6=0, qp/6=4) a planted DC level 1 dequants to 1·10·2⁴ = 160
    // (8.5.9 V position (0,0) = 10) and the DC-only inverse transform
    // adds (160+32)>>6 = +3 to all 16 samples of the 4x4 block (8.5.12).
    val flat = Array.fill(16, 16)(100)
    def residualBlocks(w: H264.BitWriter, blocks: Seq[Int]): Unit = {
      val grid = Array.fill(4, 4)(0) // 4x4-block TotalCoeff context (9.2.1)
      for (b <- 0 until 16 if blocks.contains(b)) {
        val (bx, by) = H264Cavlc.blk4x4(b)
        val tc = H264Cavlc.encodeResidual(w,
          Array(1) ++ Array.fill(15)(0), H264Cavlc.ncAt(grid, bx, by))
        grid(by)(bx) = tc
      }
    }
    // cbp 15 (all four luma 8x8s): Table 9-4 inter column -> codeNum 11
    val full = withHandSlice(1, flat, { w =>
      w.se(-2)                 // slice_qp_delta: 26 - 2 = QP 24
      w.ue(1)                  // disable_deblocking_filter_idc
      w.ue(0); w.ue(0)         // mb_skip_run, mb_type
      w.se(0); w.se(0)         // mvd (0,0); predictor is (0,0) at MB(0,0)
      w.ue(11)                 // cbp 15, hand-read from Table 9-4
      w.se(0)                  // mb_qp_delta
      residualBlocks(w, 0 until 16)
    })
    val f = H264Inter.decodeFrames(full).last
    assert(f.flatten.forall(_ == 103),
      s"cbp 15 must lift every sample to 103, got ${f.flatten.distinct.toSeq}")
    // cbp 2 (luma 8x8 block 1 only = top-right): Table 9-4 -> codeNum 3;
    // blocks 4..7 cover luma x 8..15, y 0..7
    val part = withHandSlice(1, flat, { w =>
      w.se(-2)
      w.ue(1)
      w.ue(0); w.ue(0)
      w.se(0); w.se(0)
      w.ue(3)                  // cbp 2, hand-read from Table 9-4
      w.se(0)
      residualBlocks(w, 4 to 7)
    })
    val p = H264Inter.decodeFrames(part).last
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = if (x >= 8 && y < 8) 103 else 100
      assert(p(y)(x) == want, s"($x,$y): got ${p(y)(x)}, want $want")
    }
  }

  // ---- multi-reference DPB (round 13): ref_idx_l0, te(v), sliding
  // window, and the 8.4.1.3.2 equal-refIdx neighbor-match rule

  test("multi-reference: ref_idx selects the right DPB picture, te(v) both widths") {
    // A(y,x) = 60 + x over 32x16; P1 shifts everything one pel right:
    // B(y,x) = A(y, min(x+1, 31)). P2 reads ref 0 (=B) on the left MB and
    // ref 1 (=A) on the right MB, zero mv -> the halves differ by the
    // ramp slope. P3 uses THREE active references (te(v) degenerates to
    // ue(v)): ref 2 is the original A again.
    val a = Array.tabulate(16, 32)((y, x) => 60 + x)
    val p1 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(4, 0), H264Inter.P16x16(4, 0))
    val p2 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 0), H264Inter.P16x16(0, 0, refIdx = 1))
    val p3 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 2), H264Inter.P16x16(0, 0, refIdx = 0))
    val fs = H264Inter.decodeFrames(
      H264Inter.encodeStream(2, 1, 26,
        (0 until 2).map(mb => H264Cavlc.PcmBlock(
          Array.tabulate(16, 16)((y, x) => a(y)(mb * 16 + x)))),
        Seq(p1, p2, p3)))
    assert(fs.length == 4)
    for (y <- 0 until 16; x <- 0 until 32) {
      val b = a(y)(math.min(x + 1, 31))
      assert(fs(1)(y)(x) == b, s"P1 ($x,$y)")
      // P2: left = B (one-right), right = A (identity via ref 1)
      val w2 = if (x < 16) b else a(y)(x)
      assert(fs(2)(y)(x) == w2, s"P2 ($x,$y)")
      // P3 dpb = [P2, P1(=B), I(=A)]: left reads ref 2 (A), right ref 0
      // (the P2 picture, whose right half is A too)
      val w3 = if (x < 16) a(y)(x) else w2
      assert(fs(3)(y)(x) == w3, s"P3 ($x,$y)")
    }
  }

  test("multi-reference: sliding window trims to the SPS DPB bound") {
    // maxRef = 2 (largest planted refIdx is 1): after P2 decodes, the
    // original I picture falls out of the window, so a later refIdx 1
    // reads P1, not I. Plant P3(ref 1, mv 0) and check it equals P1.
    val a = Array.tabulate(16, 16)((y, x) => 50 + 2 * x + y)
    def shift(p: Seq[H264Inter.PMbPlan]) = p
    val p1 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(8, 0)) // A two right
    val p2 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(0, 0, refIdx = 1)) // = A
    val p3 = Seq[H264Inter.PMbPlan](H264Inter.P16x16(0, 0, refIdx = 1)) // = P1!
    val fs = H264Inter.decodeFrames(H264Inter.encodeStream(1, 1, 26,
      Seq(H264Cavlc.PcmBlock(a)), Seq(p1, p2, p3).map(shift)))
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(fs(2)(y)(x) == a(y)(x), s"P2 ($x,$y) must re-read A")
      // dpb at P3 = [P2(=A), P1] (I trimmed): ref 1 = P1 = A shifted
      assert(fs(3)(y)(x) == fs(1)(y)(x), s"P3 ($x,$y) must read P1")
      assert(fs(1)(y)(x) == a(y)(math.min(x + 2, 15)), s"P1 ($x,$y)")
    }
  }

  test("hand-assembled ref_idx bits: the equal-refIdx match rule in mv prediction") {
    // encoder and decoder share mvPred, so round trips cannot catch a
    // match-rule slip — these mvd values are derived BY HAND against the
    // 8.4.1.3 rules in the comments, and the expected pixels would differ
    // if refIdx equality were ignored in the neighbor match.
    // Ramp r(y,x) = 2x + 5y + 10 over 32x32 (2x2 MBs), max 227 (8-bit safe).
    val ramp = Array.tabulate(32, 32)((y, x) => 2 * x + 5 * y + 10)
    val pcm = (0 until 4).map { mb =>
      val x0 = (mb % 2) * 16; val y0 = (mb / 2) * 16
      H264Cavlc.PcmBlock(Array.tabulate(16, 16)((y, x) => ramp(y0 + y)(x0 + x)))
    }
    // P1: all four MBs shift one right -> B(y,x) = r(y, min(x+1,31)).
    // P2 (proven encoder): all four read ref 1 (= A) -> C = A; its only
    // purpose is to put maxRef = 2 into the SPS and [C=A, B] into the DPB.
    val p1 = Seq.fill[H264Inter.PMbPlan](4)(H264Inter.P16x16(4, 0))
    val p2 = Seq.fill[H264Inter.PMbPlan](4)(H264Inter.P16x16(0, 0, refIdx = 1))
    val base = H264Inter.encodeStream(2, 2, 26, pcm, Seq(p1, p2))
    // hand P3, num_ref_idx_active override = 2; dpb = [C=A, B].
    val w = new H264.BitWriter
    w.ue(0)       // first_mb_in_slice
    w.ue(0)       // slice_type P
    w.ue(0)       // pps id
    w.u(3, 4)     // frame_num
    w.u(1, 1)     // num_ref_idx_active_override_flag
    w.ue(1)       // num_ref_idx_l0_active_minus1 = 1
    w.u(0, 1)     // ref_pic_list_modification_flag_l0
    w.se(0)       // slice_qp_delta
    w.ue(1)       // disable_deblocking_filter_idc
    // MB(0,0): ref 0 (te(v) cMax 1: bit = 1-refIdx = 1), mv (8,0).
    //   All neighbor addresses unavailable -> predictor (0,0), mvd (8,0).
    w.ue(0); w.ue(0)          // mb_skip_run, mb_type P_L0_16x16
    w.u(1, 1)                 // ref_idx_l0 = 0
    w.se(8); w.se(0)
    w.ue(0)                   // cbp 0
    // MB(1,0): ref 1 (bit 0), mv (4,4). A = MB(0,0) has refIdx 0 -> NOT
    //   matched; B/C/D unavailable -> directional rule copies A into B/C
    //   (still unmatched) -> zero matches -> median(mvA,mvA,mvA) = (8,0).
    //   mvd = (4-8, 4-0) = (-4, 4).
    w.ue(0); w.ue(0)
    w.u(0, 1)                 // ref_idx_l0 = 1
    w.se(-4); w.se(4)
    w.ue(0)
    // MB(0,1): ref 1, mv (4,4). A unavailable; B = MB(0,0) ref 0
    //   unmatched; C = MB(1,0) ref 1 MATCHED -> exactly one -> predictor
    //   (4,4); mvd (0,0). If refIdx were ignored, B and C would both
    //   "match" -> median((0,0),(8,0),(4,4)) = (4,0) and this MB would
    //   sample B at the wrong row (the ramp's y slope 5 exposes it).
    w.ue(0); w.ue(0)
    w.u(0, 1)                 // ref_idx_l0 = 1
    w.se(0); w.se(0)
    w.ue(0)
    // MB(1,1): ref 0, mv (0,0). A = MB(0,1) ref 1 unmatched; B = MB(1,0)
    //   ref 1 unmatched; C address unavailable -> D = MB(0,0) ref 0
    //   MATCHED -> predictor (8,0); mvd (-8, 0).
    w.ue(0); w.ue(0)
    w.u(1, 1)                 // ref_idx_l0 = 0
    w.se(-8); w.se(0)
    w.ue(0)
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    H264.writeNal(out, 0, 1, w.toBytes) // non-reference slice
    val last = H264Inter.decodeFrames(out.toByteArray).last
    def rc(y: Int, x: Int) = ramp(math.min(y, 31))(math.min(x, 31))
    // MB(0,0): ref 0 = C = A, mv (8,0) -> r(y, x+2)
    for (y <- 0 until 16; x <- 0 until 16)
      assert(last(y)(x) == rc(y, x + 2), s"MB00 ($x,$y)")
    // MB(1,0): ref 1 = B (= A one right), mv (4,4) -> B(y+1, x+1) =
    //   r(y+1, min(x+1+1, 31... B's own clamp)) — for x in 16..30 and
    //   y in 0..14 no clamp: r(y+1, x+2); edges clamp through B
    for (y <- 0 until 15; x <- 16 until 30)
      assert(last(y)(x) == rc(y + 1, x + 2), s"MB10 ($x,$y)")
    // MB(0,1): ref 1 = B, mv (4,4) -> r(y+1, x+2) for x<14, y<31.
    //   The WRONG (refIdx-blind) predictor (4,0) would give r(y, x+2) —
    //   5 gray levels away on every sample.
    for (y <- 16 until 31; x <- 0 until 14)
      assert(last(y)(x) == rc(y + 1, x + 2), s"MB01 ($x,$y)")
    // MB(1,1): ref 0 = C = A, mv (0,0) -> r(y, x) exactly
    for (y <- 16 until 32; x <- 16 until 32)
      assert(last(y)(x) == rc(y, x), s"MB11 ($x,$y)")
  }

  test("multi-reference rejections: over-deep refIdx and bad overrides throw") {
    val a = Array.fill(16, 16)(90)
    // frame 0 cannot reference picture 1 (not yet decoded)
    intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, Seq(H264Cavlc.PcmBlock(a)),
        Seq(Seq(H264Inter.P16x16(0, 0, refIdx = 1))))
    }
    // refIdx beyond the 16-frame DPB bound
    intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, Seq(H264Cavlc.PcmBlock(a)),
        Seq.tabulate(17)(k => Seq[H264Inter.PMbPlan](
          H264Inter.P16x16(0, 0, refIdx = k))))
    }
  }

  // ---- B slices (round 13): L0/L1/Bi 16x16, the 8.2.4.2.3 list1 swap,
  // bi-average rounding, and the non-reference DPB behavior

  test("B slices: list selection, the list1 first-two swap, bi averaging") {
    // A(y,x) = 60 + x; P1 shifts ONE pel right (odd step -> the bi
    // average's +1 rounding is observable): P1pic(y,x) = A(y,min(x+1,31))
    val a = Array.tabulate(16, 32)((y, x) => 60 + x)
    val iMbs = (0 until 2).map { mb =>
      H264Cavlc.PcmBlock(Array.tabulate(16, 16)((y, x) => a(y)(mb * 16 + x)))
    }
    val p1 = Seq.fill[H264Inter.PMbPlan](2)(H264Inter.P16x16(4, 0))
    // B1: left MB reads L0(0) = P1pic; right MB reads L1(0), which the
    // swap rule maps to A — WITHOUT the swap it would read P1pic and be
    // one gray level high everywhere
    val b1 = Seq[H264Inter.PMbPlan](
      H264Inter.B16x16(mode = 0, ref0 = 0),
      H264Inter.B16x16(mode = 1, ref1 = 0))
    // B2: bi average of P1pic and A (odd sum -> rounds up), plus a DC
    // residual (+rho at QP 24: level 2 -> (2*10*16+32)>>6 = +5) on MB1
    val dc = Array.tabulate(16)(b =>
      if (b == 0) Array(2) ++ Array.fill(15)(0) else null)
    val b2 = Seq[H264Inter.PMbPlan](
      H264Inter.B16x16(mode = 2, ref0 = 0, ref1 = 0),
      H264Inter.B16x16(mode = 2, ref0 = 0, ref1 = 0, cbpLuma = 1, levels = dc))
    // B3: the CROSS indexes — L1(1) maps back to P1pic, L0(1) to A
    val b3 = Seq[H264Inter.PMbPlan](
      H264Inter.B16x16(mode = 1, ref1 = 1),
      H264Inter.B16x16(mode = 0, ref0 = 1))
    val fs = H264Inter.decodeFrames(
      H264Inter.encodeStream(2, 1, 24, iMbs, Seq(p1, b1, b2, b3)))
    assert(fs.length == 5)
    def A(y: Int, x: Int) = a(y)(math.min(x, 31))
    for (y <- 0 until 16; x <- 0 until 32) {
      val p1v = A(y, x + 1)
      assert(fs(1)(y)(x) == p1v, s"P1 ($x,$y)")
      val w1 = if (x < 16) p1v else A(y, x) // swap: L1(0) = A
      assert(fs(2)(y)(x) == w1, s"B1 ($x,$y)")
      val bi = (p1v + A(y, x) + 1) >> 1     // rounds up on the odd sum
      val w2 = if (x < 16) bi
        else if (x < 20 && y < 4) math.min(255, bi + 5) // DC residual blk0
        else bi
      assert(fs(3)(y)(x) == w2, s"B2 ($x,$y)")
      val w3 = if (x < 16) p1v else A(y, x) // crossed indexes land the same
      assert(fs(4)(y)(x) == w3, s"B3 ($x,$y)")
    }
    // B pictures are non-reference: the DPB still holds [P1pic, A] at B3
    // (asserted implicitly by w3), and a following P frame still sees
    // P1pic as ref 0
    val p4 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 0), H264Inter.P16x16(0, 0, refIdx = 1))
    val fs2 = H264Inter.decodeFrames(
      H264Inter.encodeStream(2, 1, 24, iMbs, Seq(p1, b1, p4)))
    for (y <- 0 until 16; x <- 0 until 32) {
      val want = if (x < 16) A(y, x + 1) else A(y, x)
      assert(fs2(3)(y)(x) == want, s"P-after-B ($x,$y)")
    }
  }

  test("B slices: a single-reference stream skips the swap (list1 = list0)") {
    val a = Array.tabulate(16, 16)((y, x) => 70 + 2 * x)
    // B directly after the IDR: the DPB holds ONE picture, the full
    // list1 has one entry, so no swap — L1(0) must be A itself
    val b1 = Seq[H264Inter.PMbPlan](H264Inter.B16x16(mode = 1, ref1 = 0))
    val fs = H264Inter.decodeFrames(H264Inter.encodeStream(1, 1, 26,
      Seq(H264Cavlc.PcmBlock(a)), Seq(b1)))
    for (y <- 0 until 16; x <- 0 until 16)
      assert(fs(1)(y)(x) == a(y)(x), s"($x,$y)")
  }

  test("B slice rejections: mixed frames, direct modes, filter-on") {
    val a = Array.fill(16, 16)(90)
    val pcm = Seq(H264Cavlc.PcmBlock(a))
    // mixing B and P macroblocks in one frame
    intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, pcm, Seq(Seq(
        H264Inter.B16x16(mode = 0)), Seq(H264Inter.PSkip,
        H264Inter.B16x16(mode = 0))))
    }
    // B picture with the loop filter enabled: loud decoder rejection
    val bStream = H264Inter.encodeStream(1, 1, 26, pcm,
      Seq(Seq(H264Inter.B16x16(mode = 2))), 0, 0, 0)
    val e = intercept[IllegalArgumentException] {
      H264Inter.decodeFrames(bStream)
    }
    assert(e.getMessage.contains("B pictures"), e.getMessage)
    // bad B16x16 mode at construction
    intercept[IllegalArgumentException] { H264Inter.B16x16(mode = 3) }
  }

  // ---- explicit weighted prediction (round 13, 7.3.3.2 / 8.4.2.3.2)

  test("weighted prediction: weights/offsets/denoms, skip, per-refIdx, identity") {
    val a = Array.tabulate(16, 16)((y, x) => 60 + x)
    val pcm = Seq(H264Cavlc.PcmBlock(a))
    import H264Inter.{P16x16, PSkip, PredWeights}
    val frames = Seq[Seq[H264Inter.PMbPlan]](
      Seq(P16x16(0, 0)),              // P1: weighted copy of A
      Seq(PSkip),                     // P2: weights apply to P_Skip too
      Seq(P16x16(0, 0, refIdx = 1)),  // P3: per-refIdx table entry 1
      Seq(P16x16(0, 0)))              // P4: None frame -> identity table
    val weights = Seq(
      Some(PredWeights(2, Seq(Some((5, 3))), 1, Seq(Some(((3, -2), (2, 5)))))),
      Some(PredWeights(0, Seq(Some((2, -40))))),
      Some(PredWeights(2, Seq(None, Some((8, 1))))),
      None)
    val stream = H264Inter.encodeStream(1, 1, 26, pcm, frames, 1, 0, 0, weights)
    val full = H264Inter.decodeFramesFull(stream)
    val fs = full.map(_._1)
    def clip(v: Int) = math.max(0, math.min(255, v))
    for (y <- 0 until 16; x <- 0 until 16) {
      val v = 60 + x
      val p1 = clip(((v * 5 + 2) >> 2) + 3)          // logWD 2
      assert(fs(1)(y)(x) == p1, s"P1 ($x,$y)")
      val p2 = clip(p1 * 2 - 40)                     // logWD 0, via P_Skip
      assert(fs(2)(y)(x) == p2, s"P2 ($x,$y)")
      // P3 reads refIdx 1 (= P1, A was trimmed by the 2-deep window) with
      // entry 1 = (8,1): ((v*8+2)>>2)+1 = 2v+1; entry 0 is the default
      // identity and must not be picked up
      val p3 = clip(2 * p1 + 1)
      assert(fs(3)(y)(x) == p3, s"P3 ($x,$y)")
      // P4 carries the identity table (None frame under an active PPS
      // flag): exact copy of P3
      assert(fs(4)(y)(x) == p3, s"P4 ($x,$y)")
    }
    // chroma weighting (input is flat 128): cb ((128*3+1)>>1)-2 = 190,
    // cr ((128*2+1)>>1)+5 = 133
    val (_, cb1, cr1) = full(1)
    assert(cb1(4)(4) == 190 && cr1(4)(4) == 133)
    // non-vacuous: the unweighted decode of the same plans differs
    val plain = H264Inter.decodeFrames(
      H264Inter.encodeStream(1, 1, 26, pcm, frames, 1, 0, 0))
    assert(plain(1)(0)(0) == 60 && fs(1)(0)(0) != 60)
    // B frames cannot carry weights
    intercept[IllegalArgumentException] {
      H264Inter.encodeStream(1, 1, 26, pcm,
        Seq(Seq(H264Inter.B16x16(mode = 0))), 1, 0, 0,
        Seq(Some(PredWeights(0, Seq(Some((1, 0)))))))
    }
  }

  // ---- 16x8 / 8x16 partitions (round 13)

  test("partitions: 16x8 and 8x16 compose per-partition motion and refs") {
    // A(y,x) = 50 + 2x + 3y over 16x16 (max 125, 8-bit safe)
    val a = Array.tabulate(16, 16)((y, x) => 50 + 2 * x + 3 * y)
    def A(y: Int, x: Int) = a(math.min(y, 15))(math.min(x, 15))
    import H264Inter.{PPart, P16x16}
    // P1: 16x8 — top shifts right one pel, bottom shifts down one pel
    val p1 = Seq[H264Inter.PMbPlan](
      PPart(wide = true, 4, 0, 0, 0, 4, 0))
    // P2: 8x16 — left copies P1, right reads the ORIGINAL A via ref 1
    // with a (8,8) motion: per-partition reference indexes are live
    val p2 = Seq[H264Inter.PMbPlan](
      PPart(wide = false, 0, 0, 0, 8, 8, 1))
    val fs = H264Inter.decodeFrames(H264Inter.encodeStream(1, 1, 26,
      Seq(H264Cavlc.PcmBlock(a)), Seq(p1, p2)))
    def p1v(y: Int, x: Int) = if (y < 8) A(y, x + 1) else A(y + 1, x)
    for (y <- 0 until 16; x <- 0 until 16) {
      assert(fs(1)(y)(x) == p1v(y, x), s"P1 ($x,$y)")
      val w2 = if (x < 8) p1v(y, x) else A(y + 2, x + 2)
      assert(fs(2)(y)(x) == w2, s"P2 ($x,$y)")
    }
    // and a residual on a partitioned MB composes over both partitions:
    // DC level 2 at QP 24 adds +5 on block 0 (top-left 4x4)
    val dc = Array.tabulate(16)(b =>
      if (b == 0) Array(2) ++ Array.fill(15)(0) else null)
    val p1r = Seq[H264Inter.PMbPlan](
      PPart(wide = true, 4, 0, 0, 0, 4, 0, cbpLuma = 1, levels = dc))
    val fr = H264Inter.decodeFrames(H264Inter.encodeStream(1, 1, 24,
      Seq(H264Cavlc.PcmBlock(a)), Seq(p1r)))
    for (y <- 0 until 16; x <- 0 until 16) {
      val want = math.min(255, p1v(y, x) + (if (x < 4 && y < 4) 5 else 0))
      assert(fr(1)(y)(x) == want, s"P1r ($x,$y)")
    }
  }

  test("hand-assembled partition bits: the 16x8 directional predictor rules") {
    // 2x1 MBs over ramp r(y,x) = 2x + 5y + 10 (max 147). The encoder and
    // decoder share mvPred, so the 8.4.1.3 16x8 special cases (top -> B,
    // bottom -> A on a refIdx match) are pinned with hand-built bits and
    // hand-derived predictors.
    val ramp = Array.tabulate(16, 32)((y, x) => 2 * x + 5 * y + 10)
    val pcm = (0 until 2).map { mb =>
      H264Cavlc.PcmBlock(Array.tabulate(16, 16)((y, x) => ramp(y)(mb * 16 + x)))
    }
    val base = H264Inter.encodeStream(2, 1, 26, pcm, Nil)
    val w = new H264.BitWriter
    w.ue(0); w.ue(0); w.ue(0)   // first_mb, slice_type P, pps
    w.u(1, 4)                   // frame_num
    w.u(0, 1); w.u(0, 1)        // no override, no list modification
    w.se(0)                     // slice_qp_delta
    w.ue(1)                     // disable_deblocking_filter_idc
    // MB0: P_L0_16x8. Top partition: all neighbors unavailable ->
    //   predictor (0,0); mvd (4,4) -> mv (4,4). Bottom partition: the
    //   SPECIAL rule (A) does not fire (A unavailable), general rule:
    //   B = own top partition, only match -> predictor (4,4); mvd
    //   (8,-4) -> mv (12,0).
    w.ue(0)                     // mb_skip_run
    w.ue(1)                     // mb_type P_L0_16x8
    w.se(4); w.se(4)            // mvd top
    w.se(8); w.se(-4)           // mvd bottom
    w.ue(0)                     // cbp 0
    // MB1: P_L0_16x8. TOP partition special rule: B = MB0's row-0 cell
    //   above? gy=0 -> B unavailable; A = MB0 top-right cell, mv (4,4);
    //   B/C/D unavailable -> DIRECTIONAL -> (4,4). mvd (0,0) -> mv (4,4).
    //   BOTTOM partition special rule FIRES: A = MB0's bottom partition
    //   cell (3,2) -> mv (12,0) ref-matched -> predictor (12,0) — the
    //   general rule would median A=(12,0), B=own top (4,4), C/D
    //   unavailable-> D none, C = cell (8,1): out of picture -> D (3,1):
    //   MB0 top (4,4) -> median x med(12,4,4)=4, y med(0,4,4)=4 = (4,4),
    //   so a decoder without the special case lands 8 quarter-pels off.
    //   mvd (0,0) -> mv (12,0) = 3 integer pels right.
    w.ue(0)
    w.ue(1)
    w.se(0); w.se(0)            // mvd top
    w.se(0); w.se(0)            // mvd bottom
    w.ue(0)
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    H264.writeNal(out, 0, 1, w.toBytes)
    val last = H264Inter.decodeFrames(out.toByteArray).last
    def rc(y: Int, x: Int) = ramp(math.min(y, 15))(math.min(math.max(x, 0), 31))
    for (y <- 0 until 16; x <- 0 until 32) {
      val want =
        if (x < 16 && y < 8) rc(y + 1, x + 1)        // MB0 top (4,4)
        else if (x < 16) rc(y, x + 3)                // MB0 bottom (12,0)
        else if (y < 8) rc(y + 1, x + 1)             // MB1 top (4,4)
        else rc(y, x + 3)                            // MB1 bottom (12,0) via SPECIAL A
      assert(last(y)(x) == want, s"($x,$y): got ${last(y)(x)}, want $want")
    }
  }

  test("hand-assembled B bits: a decoded other-list neighbor stays ADDRESS-available") {
    // ADVICE r13 (medium): B-slice mv prediction must key neighbor ADDRESS
    // availability on "that MB has decoded", not on "that MB predicted
    // from THIS list". A B_L1 neighbor during an L0 prediction is
    // available with refIdxL0 -1 / mvL0 (0,0) (8.4.1.3.2 via predFlagLX),
    // NOT unavailable — the buggy reading substitutes D for C and can pick
    // up a stale diagonal match. Encoder and decoder share mvPred, so only
    // hand-built bits can pin this: 3x2 MBs over ramp r(y,x) = 2x + 3y + 10
    // (max 197), one I_PCM reference, then a raw B slice:
    //   MB(0,0) B_L0 mv (4,0)   MB(1,0) B_L1 mv (0,0)  MB(2,0) B_L1 (0,0)
    //   MB(0,1) B_L1 mv (0,0)   MB(1,1) B_L0 mvd (0,0) MB(2,1) B_L1 (0,0)
    // MB(1,1)'s L0 predictor per spec: A=MB(0,1), B=MB(1,0), C=MB(2,0) are
    // ALL decoded-but-L1 -> available, unmatched, mv (0,0); zero matches ->
    // median (0,0) -> mv (0,0). The per-list-filled bug instead finds C's
    // cell unfilled in the L0 grid, substitutes D = MB(0,0) (L0, refIdx
    // match, mv (4,0)) -> exactly-one-match -> mv (4,0): one pel right.
    val ramp = Array.tabulate(32, 48)((y, x) => 2 * x + 3 * y + 10)
    val base = H264Inter.encodeStream(3, 2, 26, ramp, Nil)
    val w = new H264.BitWriter
    w.ue(0); w.ue(6); w.ue(0)   // first_mb, slice_type B, pps
    w.u(1, 4)                   // frame_num = PrevRefFrameNum + 1 (7.4.3)
    w.u(1, 1)                   // direct_spatial_mv_pred_flag
    w.u(0, 1)                   // no num_ref_idx override (l0 = l1 = 1)
    w.u(0, 1); w.u(0, 1)        // no l0 / l1 list modification
    w.se(0)                     // slice_qp_delta
    w.ue(1)                     // disable_deblocking_filter_idc
    // (numActive = 1 on both lists -> te(v) ref_idx fields are absent)
    def mb(mode: Int, mvdx: Int, mvdy: Int): Unit = {
      w.ue(0)                   // mb_skip_run
      w.ue(1 + mode)            // B_L0/L1_16x16 (Table 7-14)
      w.se(mvdx); w.se(mvdy)    // mvd for the single coded list
      w.ue(0)                   // cbp 0
    }
    mb(0, 4, 0)                 // MB(0,0): predictor (0,0), mv (4,0)
    mb(1, 0, 0); mb(1, 0, 0)    // MB(1,0), MB(2,0): L1, mv (0,0)
    mb(1, 0, 0)                 // MB(0,1): L1, mv (0,0)
    mb(0, 0, 0)                 // MB(1,1): THE PIN — spec mv (0,0)
    mb(1, 0, 0)                 // MB(2,1): L1, mv (0,0)
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    H264.writeNal(out, 0, 1, w.toBytes) // non-reference B slice
    val last = H264Inter.decodeFrames(out.toByteArray).last
    for (y <- 0 until 32; x <- 0 until 48) {
      // only MB(0,0) moves (one integer pel right; x+1 <= 16 < 48, no
      // clamp); every other MB — MB(1,1) in particular — is the reference
      val want = if (x < 16 && y < 16) ramp(y)(x + 1) else ramp(y)(x)
      assert(last(y)(x) == want, s"($x,$y): got ${last(y)(x)}, want $want")
    }
  }

  test("P_8x8: all four sub_mb_types compose per-sub-partition motion and refs") {
    val ref = Array.tabulate(16, 32)((y, x) => 2 * x + 3 * y + 15) // max 122
    def rc(y: Int, x: Int) =
      ref(math.min(math.max(y, 0), 15))(math.min(math.max(x, 0), 31))
    // P1: every MB shifts right one pel -> P1(y,x) = ref(y, x+1)
    val p1 = Seq.fill[H264Inter.PMbPlan](2)(H264Inter.P16x16(4, 0))
    // P2 MB0 = P_8x8 exercising all four sub shapes, refs mixing the
    // original (ref 1 = I picture) and the shifted P1 (ref 0):
    val mb0 = H264Inter.P8x8(Seq(
      H264Inter.Sub8x8(0, 1, Seq((8, 0))),               // 8x8: ref +2px
      H264Inter.Sub8x8(1, 0, Seq((0, 0), (0, 8))),       // 8x4: P1; P1 +2py
      H264Inter.Sub8x8(2, 1, Seq((0, 0), (-4, -4))),     // 4x8: ref; ref -1,-1
      H264Inter.Sub8x8(3, 0,                             // 4x4 quad over P1
        Seq((0, 0), (4, 0), (0, 4), (4, 4)))))
    val p2 = Seq[H264Inter.PMbPlan](mb0, H264Inter.P16x16(0, 0))
    val d = H264Inter.decodeFrames(
      H264Inter.encodeStream(2, 1, 26, ref, Seq(p1, p2)))
    def p1v(y: Int, x: Int) = rc(y, x + 1)
    for (y <- 0 until 16; x <- 0 until 32) {
      val want =
        if (x < 8 && y < 8) rc(y, x + 2)                   // sub0 8x8 ref+2
        else if (x < 16 && y < 4) p1v(y, x)                // sub1 8x4 top
        else if (x < 16 && y < 8) p1v(y + 2, x)            // sub1 8x4 bottom
        else if (x < 4 && y >= 8) rc(y, x)                 // sub2 4x8 left
        else if (x < 8 && y >= 8) rc(y - 1, x - 1)         // sub2 4x8 right
        else if (x < 12 && y >= 8 && y < 12) p1v(y, x)     // sub3 4x4 #0
        else if (x < 16 && y >= 8 && y < 12) p1v(y, x + 1) // sub3 4x4 #1
        else if (x < 12 && y >= 12) p1v(y + 1, x)          // sub3 4x4 #2
        else if (x < 16 && y >= 12) p1v(y + 1, x + 1)      // sub3 4x4 #3
        else p1v(y, x)                                     // MB1 16x16 over P1
      assert(d(2)(y)(x) == want, s"($x,$y): got ${d(2)(y)(x)}, want $want")
    }
    // residual over a P_8x8 prediction + round trip of an 8x4/4x8 mix
    val lv = Array(3) ++ Array.fill(15)(0)
    val mbR = H264Inter.P8x8(Seq(
      H264Inter.Sub8x8(1, 0, Seq((0, 0), (4, 0))),
      H264Inter.Sub8x8(2, 0, Seq((0, 4), (0, 0))),
      H264Inter.Sub8x8(0, 0, Seq((0, 0))),
      H264Inter.Sub8x8(3, 0, Seq((0, 0), (0, 0), (0, 0), (0, 0)))),
      cbpLuma = 1, levels = Array.tabulate(16)(b => if (b == 0) lv else null))
    val d2 = H264Inter.decodeFrames(H264Inter.encodeStream(2, 1, 24, ref,
      Seq(Seq[H264Inter.PMbPlan](mbR, H264Inter.PSkip))))
    // block 0 (px 0..3, py 0..3) belongs to the 8x4 top part, mv (0,0):
    // prediction = ref; DC level 3 at qp 24 dequants to 3·10·2⁴ = 480,
    // DC-only IDCT adds (480+32)>>6 = 8
    assert(d2(1)(1)(1) == math.min(255, ref(1)(1) + 8))
    assert(d2(1)(1)(6) == ref(1)(6), "uncoded block untouched")
  }

  test("hand-assembled P_8x8 bits: in-MB C availability and D substitution") {
    // Single-MB picture, one P_8x8 of four 4x4 sub-types — the
    // sub-partition predictor's neighbors come from INSIDE the MB, so
    // decode order drives C availability: cell (1,1) must substitute D
    // (cell (0,0)) because its C (cell (2,0), in sub1) has NOT decoded
    // yet, while cell (0,1)'s C (cell (1,0), in sub0) HAS. Every
    // predictor below is hand-derived from 8.4.1.3; the encoder is never
    // consulted (shared-derivation caveat).
    val ref = Array.tabulate(16, 16)((y, x) => 3 * x + 2 * y + 30) // max 105
    val base = H264Inter.encodeStream(1, 1, 26, ref, Nil)
    val w = new H264.BitWriter
    w.ue(0); w.ue(0); w.ue(0)   // first_mb, slice_type P, pps
    w.u(1, 4)                   // frame_num
    w.u(0, 1); w.u(0, 1)        // no override, no list modification
    w.se(0)                     // slice_qp_delta
    w.ue(1)                     // disable_deblocking_filter_idc
    w.ue(0)                     // mb_skip_run
    w.ue(3)                     // mb_type P_8x8
    (0 until 4).foreach(_ => w.ue(3)) // all sub_mb_type 4x4
    // (numActive = 1 -> no ref_idx fields)
    // hand-derived predictors, decode order (see derivations):
    //  (0,0): all unavail -> (0,0); plant mv (4,0) -> mvd (4,0)
    //  (1,0): B/C/D unavail, A=(4,0) -> directional -> (4,0); plant (8,0)
    //  (0,1): A unavail, B=(4,0), C=(1,0)=(8,0) -> median(0,4,8)=(4,0);
    //         plant (4,4) -> mvd (0,4)
    //  (1,1): C cell (2,0) UNDECODED -> D=(0,0)=(4,0); A=(4,4), B=(8,0)
    //         -> median x med(4,8,4)=4, y med(4,0,0)=0 -> (4,0); plant (4,0)
    //  sub1..sub3: every predictor lands (8,0)/(4,0) as planted (mvd 0)
    val mvds = Seq((4, 0), (4, 0), (0, 4), (0, 0)) ++ Seq.fill(12)((0, 0))
    mvds.foreach { case (mx, my) => w.se(mx); w.se(my) }
    w.ue(0)                     // cbp 0
    w.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, base.length)
    H264.writeNal(out, 0, 1, w.toBytes)
    val last = H264Inter.decodeFrames(out.toByteArray).last
    def rc(y: Int, x: Int) = ref(math.min(y, 15))(math.min(x, 15))
    for (y <- 0 until 16; x <- 0 until 16) {
      val want =
        if (x < 4 && y < 4) rc(y, x + 1)        // (0,0) mv (4,0)
        else if (x < 8 && y < 4) rc(y, x + 2)   // (1,0) mv (8,0)
        else if (x < 4 && y < 8) rc(y + 1, x + 1) // (0,1) mv (4,4)
        else if (x < 8 && y < 8) rc(y, x + 1)   // (1,1) mv (4,0) via D
        else if (y < 8) rc(y, x + 2)            // sub1 (8,0)
        else if (x < 8) rc(y, x + 1)            // sub2 (4,0)
        else rc(y, x + 2)                       // sub3 (8,0)
      assert(last(y)(x) == want, s"($x,$y): got ${last(y)(x)}, want $want")
    }
  }

  test("ref-list modification: reordered list0 selects reordered targets") {
    val ref = grad(40) // 3x2 MBs, ref(y,x) = 40 + x + 2y
    val p1 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(8, 0))
    // reordered P2: picks (1, 0) swap the list -> refIdx 0 = the I
    // picture, refIdx 1 = the shifted P1; a P_Skip must read list0(0)
    // = the REORDERED head (8.4.1.1 references RefPicList0[0])
    val p2 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 0), H264Inter.P16x16(0, 0, refIdx = 1),
      H264Inter.PSkip, H264Inter.P16x16(0, 0, refIdx = 0),
      H264Inter.P16x16(0, 0, refIdx = 1), H264Inter.PSkip)
    val reordered = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2), 1, 0, 0, Nil, cabac = false,
      reorders = Seq(None, Some(Seq(1, 0)))))
    // the same semantics through the DEFAULT order with refIdx swapped
    val p2d = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 1), H264Inter.P16x16(0, 0, refIdx = 0),
      H264Inter.P16x16(0, 0, refIdx = 1), H264Inter.P16x16(0, 0, refIdx = 1),
      H264Inter.P16x16(0, 0, refIdx = 0), H264Inter.P16x16(0, 0, refIdx = 1))
    val default = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2d)))
    reordered(2).zip(default(2)).zipWithIndex.foreach { case ((a, b), y) =>
      assert(a.sameElements(b), s"row $y")
    }
    // and the reorder genuinely changed pixels vs the UN-reordered plan
    val plain = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2)))
    assert(reordered(2)(4)(4) == ref(4)(4), "refIdx 0 must hit the I picture")
    assert(plain(2)(4)(4) == ref(4)(6), "default refIdx 0 is the shifted P1")
    // CABAC carries the same (entropy-agnostic) header reorder
    val viaCabac = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, i16Plans(6), Seq(p1, p2), 1, 0, 0, Nil, cabac = true,
      reorders = Seq(None, Some(Seq(1, 0)))))
    val viaCavlc = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, i16Plans(6), Seq(p1, p2), 1, 0, 0, Nil, cabac = false,
      reorders = Seq(None, Some(Seq(1, 0)))))
    viaCabac(2).zip(viaCavlc(2)).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("ref-list modification: three-deep reorder drives both op directions") {
    val ref = grad(35)
    val p1 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(4, 0))
    val p2 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(4, 0))
    // picks (2,0,1): ops are idc0 (back 3), idc1 (forward 2), idc0
    // (back 1) — list0 = (I, P2, P1)
    val p3 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(0, 0, refIdx = 0), H264Inter.P16x16(0, 0, refIdx = 1),
      H264Inter.P16x16(0, 0, refIdx = 2), H264Inter.P16x16(0, 0, refIdx = 0),
      H264Inter.P16x16(0, 0, refIdx = 1), H264Inter.P16x16(0, 0, refIdx = 2))
    val d = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2, p3), 1, 0, 0, Nil, cabac = false,
      reorders = Seq(None, None, Some(Seq(2, 0, 1)))))
    assert(d(3)(4)(4) == ref(4)(4), "refIdx 0 -> I (unshifted)")
    assert(d(3)(4)(20) == ref(4)(22), "refIdx 1 -> P2 (two pels)")
    assert(d(3)(4)(36) == ref(4)(37), "refIdx 2 -> P1 (one pel)")
  }

  test("ref-list modification poison: long-term ops and B flags reject") {
    val ref = Array.tabulate(16, 16)((y, x) => x + y + 50)
    val base = H264Inter.encodeStream(1, 1, 26, ref, Nil)
    def slice(body: H264.BitWriter => Unit): Array[Byte] = {
      val w = new H264.BitWriter
      w.ue(0); w.ue(0); w.ue(0); w.u(1, 4)
      w.u(0, 1) // no num_ref_idx override
      body(w)
      w.trailingBits()
      val out = new java.io.ByteArrayOutputStream()
      out.write(base, 0, base.length)
      H264.writeNal(out, 0, 1, w.toBytes)
      out.toByteArray
    }
    val e1 = intercept[IllegalArgumentException] {
      H264Inter.decodeFrames(slice { w =>
        w.u(1, 1); w.ue(2) // modification flag, idc 2 = long-term
      })
    }
    assert(e1.getMessage.contains("long-term"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      H264Inter.decodeFrames(slice { w =>
        w.u(1, 1); w.ue(0); w.ue(7); w.ue(3) // op naming an absent PicNum
        w.se(0); w.ue(1) // slice_qp_delta, deblocking idc (list builds next)
      })
    }
    assert(e2.getMessage.contains("absent"), e2.getMessage)
  }

  test("multi-slice: split P pictures decode pixel-identically (planted mvs)") {
    // absolute planted mvs round-trip through slice-scoped predictors on
    // BOTH sides, so any split of a skip-free picture must reproduce the
    // single-slice pixels exactly — in both entropies, with residuals
    // near the boundary (exercising the -1-sentinel nC grids)
    val ref = grad(40)
    val lv = Array.tabulate(16)(b => if (b == 0) Array(2, -1) ++ Array.fill(14)(0) else null)
    val p1 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(8, 0))
    val p2 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(4, 0), H264Inter.P16x16(0, 4, cbpLuma = 3, levels = lv),
      H264Inter.P8x8(Seq(
        H264Inter.Sub8x8(0, 0, Seq((4, 4))),
        H264Inter.Sub8x8(1, 0, Seq((0, 0), (8, 0))),
        H264Inter.Sub8x8(2, 0, Seq((0, 8), (4, 0))),
        H264Inter.Sub8x8(3, 0, Seq((0, 0), (4, 0), (0, 4), (4, 4))))),
      H264Inter.P16x16(0, 0, cbpLuma = 1, levels = lv),
      H264Inter.PPart(wide = true, 4, 0, 0, 8, 4, 0),
      H264Inter.P16x16(-4, -4))
    for (cab <- Seq(false, true); splits <- Seq(Seq(0, 2), Seq(0, 1, 4))) {
      val iRef: Seq[H264Cavlc.MbPlan] = if (cab) i16Plans(6) else pcmPlans(ref)
      val single = H264Inter.decodeFrames(H264Inter.encodeStream(
        3, 2, 26, iRef, Seq(p1, p2), 1, 0, 0, Nil, cab, Nil))
      val multi = H264Inter.decodeFrames(H264Inter.encodeStream(
        3, 2, 26, iRef, Seq(p1, p2), 1, 0, 0, Nil, cab,
        Nil, Seq(Seq(0), splits)))
      assert(single.length == multi.length)
      single.last.zip(multi.last).zipWithIndex.foreach { case ((a, b), y) =>
        assert(a.sameElements(b), s"cabac=$cab splits=$splits row $y")
      }
    }
  }

  test("multi-slice: a skip at the slice start infers zero motion (8.4.1.1)") {
    val ref = grad(55)
    val p1 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(4, 0))
    // MB4 (row 1 col 1) = P_Skip; its A (MB3) and B (MB1) carry NONZERO
    // mvs, so a single-slice skip inherits the median — but as the FIRST
    // MB of slice 2, A and B are in the previous slice -> unavailable ->
    // zero vector (exactly like a picture corner)
    val p2 = Seq[H264Inter.PMbPlan](
      H264Inter.P16x16(8, 0), H264Inter.P16x16(4, 0), H264Inter.P16x16(8, 0),
      H264Inter.P16x16(8, 4), H264Inter.PSkip, H264Inter.P16x16(8, 0))
    val single = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2)))
    val multi = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, pcmPlans(ref), Seq(p1, p2), 1, 0, 0, Nil, cabac = false,
      Nil, Seq(Seq(0), Seq(0, 4))))
    // multi-slice: MB4 copies P1 unshifted (mv 0): P1(20,20) = ref(20,21)
    assert(multi.last(20)(20) == ref(20)(21), "slice-start skip must be (0,0)")
    // single-slice: the same skip inherits median x med(8,4,8)=8 -> 2 pels
    assert(single.last(20)(20) == ref(20)(23), "single-slice skip inherits the median")
    // the CABAC framing agrees with the CAVLC one
    val multiC = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, i16Plans(6), Seq(p1, p2), 1, 0, 0, Nil, cabac = true,
      Nil, Seq(Seq(0), Seq(0, 4))))
    val multiV = H264Inter.decodeFrames(H264Inter.encodeStream(
      3, 2, 26, i16Plans(6), Seq(p1, p2), 1, 0, 0, Nil, cabac = false,
      Nil, Seq(Seq(0), Seq(0, 4))))
    multiC.last.zip(multiV.last).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("multi-slice: idc 2 excludes slice-boundary edges, idc 0 filters them") {
    val ref = grad(60)
    val p1 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(0, 0))
    // MB1's bottom-row blocks carry coefficients -> the MB1|MB4 horizontal
    // edge has bS 2 and a small planted step the filter smooths; MB4 is
    // skipped so no other edge touches the probed samples
    val lv = Array.tabulate(16) { b =>
      val (_, by) = H264Cavlc.blk4x4(b)
      if (by == 3) Array(3) ++ Array.fill(15)(0) else null
    }
    val p2 = Seq[H264Inter.PMbPlan](
      H264Inter.PSkip,
      H264Inter.P16x16(0, 0, cbpLuma = 12, levels = lv),
      H264Inter.PSkip, H264Inter.PSkip, H264Inter.PSkip, H264Inter.PSkip)
    def stream(idc: Int, splits: Seq[Seq[Int]]) = H264Inter.decodeFrames(
      H264Inter.encodeStream(3, 2, 28, pcmPlans(ref), Seq(p1, p2),
        idc, 0, 0, Nil, cabac = false, Nil, splits)).last
    val off = stream(1, Seq(Seq(0), Seq(0, 4)))       // filter off: raw recon
    val excl = stream(2, Seq(Seq(0), Seq(0, 4)))      // on, boundary excluded
    val on = stream(0, Seq(Seq(0), Seq(0, 4)))        // on, boundary filtered
    // the MB1|MB4 edge runs at y=16, x in 16..31 — a slice boundary. Its
    // q side (row 16, inside the skipped MB4) is touched by NO other
    // edge; the p side's columns 16..19 sit in the internal vertical
    // MB0|MB1 edge's reach, so row 15 is compared beyond them
    val bx = (16 until 32)
    assert(bx.forall(x => excl(16)(x) == off(16)(x)),
      "idc 2 must leave the boundary's q-side samples unfiltered")
    // (columns 30..31 sit in the internal MB1|MB2 vertical edge's reach)
    assert((20 until 30).forall(x => excl(15)(x) == off(15)(x)),
      "idc 2 must leave the boundary's p-side samples unfiltered")
    assert(bx.exists(x => on(16)(x) != off(16)(x)) &&
      (20 until 30).exists(x => on(15)(x) != off(15)(x)),
      "idc 0 must actually filter the same edge (the exclusion is not vacuous)")
    // inside slice 1 the vertical MB0|MB1 edge (x=16) filters the SAME
    // way under both idcs — rows 0..11 sit outside the slice-boundary
    // h-edge's reach (it modifies rows 14..17)
    assert((0 until 12).forall(y => excl(y)(16) == on(y)(16)))
  }

  test("multi-slice poison: gaps, mid-picture ends, per-slice idc drift reject") {
    val ref = grad(45)
    val p2 = Seq.fill[H264Inter.PMbPlan](6)(H264Inter.P16x16(4, 0))
    val good = H264Inter.encodeStream(3, 2, 26, pcmPlans(ref), Seq(p2),
      1, 0, 0, Nil, cabac = false, Nil, Seq(Seq(0, 3)))
    assert(H264Inter.decodeFrames(good).length == 2)
    // drop the final NAL (the second slice): the picture never completes
    val nals = H264.splitNals(good)
    val cut = {
      val out = new java.io.ByteArrayOutputStream()
      // keep everything but the last slice NAL
      val keep = nals.dropRight(1)
      keep.foreach { case (t, refIdc, rbsp) => H264.writeNal(out, refIdc, t, rbsp) }
      out.toByteArray
    }
    val e1 = intercept[IllegalArgumentException] { H264Inter.decodeFrames(cut) }
    assert(e1.getMessage.contains("mid-picture"), e1.getMessage)
    // B pictures must stay single-slice (encoder-side guard)
    val e2 = intercept[IllegalArgumentException] {
      H264Inter.encodeStream(3, 2, 26, pcmPlans(ref),
        Seq(Seq.fill[H264Inter.PMbPlan](6)(H264Inter.B16x16(mode = 0))),
        1, 0, 0, Nil, cabac = false, Nil, Seq(Seq(0, 3)))
    }
    assert(e2.getMessage.contains("single-slice"), e2.getMessage)
  }

  test("poison: garbage and truncated streams throw, never mis-decode") {
    val junk = Array.tabulate[Byte](64)(i => (i * 37 + 11).toByte)
    intercept[Exception] { H264Inter.decodeFrames(junk) }
    val good = H264Inter.encodeStream(3, 2, 26, grad(50),
      Seq(Seq.fill[H264Inter.PMbPlan](6)(H264Inter.PSkip)))
    intercept[Exception] {
      H264Inter.decodeFrames(java.util.Arrays.copyOf(good, good.length / 2))
    }
  }

  test("9.2.1 in-MB nC: a coded 4x4 sees same-MB cbp-uncoded neighbors " +
      "as available-with-0, pinned by frozen bits (ADVICE r15)") {
    // MB1's block 4 (bx=2, by=0) has its UP neighbor in MB0 (coded,
    // TotalCoeff 4) and its LEFT neighbor (1,0) inside MB1's own UNCODED
    // 8x8 #0. 9.2.1 infers TotalCoeff 0 for cbp-uncoded blocks of an
    // available MB, so nC = (4 + 0 + 1) >> 1 = 2 — the round-14 code left
    // the cell at the -1 'unavailable' sentinel until after the whole MB,
    // yielding nC = 4 and the WRONG coeff_token table (encoder mirrored
    // the slip, so round-trips could not catch it; the A/B probe this
    // round confirmed the fix changes the emitted bits). The sha-256
    // freeze pins BOTH sides: a mirrored re-regression keeps the
    // round-trip green but cannot reproduce these bytes.
    val ref = Array.tabulate(32, 16)((y, x) => 40 + x + 2 * y)
    val lv4 = Array(3, 2, 1, 1) ++ Array.fill(12)(0)
    val mb0 = H264Inter.P16x16(0, 0, cbpLuma = 15,
      levels = Array.fill(16)(lv4))
    val lv2 = Array(7, 3) ++ Array.fill(14)(0)
    val mb1 = H264Inter.P16x16(0, 0, cbpLuma = 2,
      levels = Array.tabulate(16)(b => if (b >= 4 && b < 8) lv2 else null))
    val bytes = H264Inter.encodeStream(1, 2, 26, ref,
      Seq(Seq[H264Inter.PMbPlan](mb0, mb1)))
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    assert(sha == "69b62d5836830e3dbd7d21a4ef23497e7523346d85d9b218f8908a14637a7952",
      "partial-CBP P stream bits drifted from the 9.2.1-conformant freeze")
    val f1 = H264Inter.decodeFrames(bytes)(1)
    // decode-side probe: residual-affected and skip-region samples
    assert(Seq(f1(0)(0), f1(3)(8), f1(16)(8), f1(17)(9), f1(31)(15)) ==
      Seq(65, 71, 115, 112, 117),
      "decoded pixels drifted on the partial-CBP nC scenario")

    // Slice-boundary interaction: split the same picture at MB1. MB1's UP
    // neighbor now sits in a PRIOR SLICE (unavailable, 9.2.1 — the cell
    // stays at the -1 sentinel), while its in-MB uncoded LEFT still infers
    // available-with-0, so block 4's nC becomes 0 (left only) instead of
    // 2 — different entropy bits, IDENTICAL coefficients and pixels. The
    // single-vs-split pixel identity is exactly the two rules composing.
    val iMbs = (0 until 2).map { mb =>
      H264Cavlc.PcmBlock(
        Array.tabulate(16, 16)((y, x) => ref(mb * 16 + y)(x)), 128)
    }
    val split = H264Inter.encodeStream(1, 2, 26, iMbs,
      Seq(Seq[H264Inter.PMbPlan](mb0, mb1)), 1, 0, 0, Nil, false, Nil,
      Seq(Seq(0, 1)))
    assert(!java.util.Arrays.equals(split, bytes),
      "split stream must differ bitwise (nC context changes at the boundary)")
    val g1 = H264Inter.decodeFrames(split)(1)
    assert(f1.map(_.toSeq).toSeq == g1.map(_.toSeq).toSeq,
      "multi-slice partial-CBP picture must decode pixel-identically")
  }
}
