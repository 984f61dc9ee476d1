package graft.ops

import H264.{BitReader, BitWriter}

/** Pure-JVM H.264 **CABAC entropy codec for I slices** (ITU-T Rec. H.264,
  * clause 9.3) — the last named entropy seam (VERDICT r11 item 5). Real-
  * world encoders default to CABAC; with this module the engine natively
  * decodes I slices whose PPS sets entropy_coding_mode_flag = 1, through
  * the SAME prediction/dequant/transform layer the CAVLC decoder uses
  * ([[H264Cavlc.reconI16x16]] / [[H264Cavlc.reconI4x4Block]] /
  * [[H264Cavlc.reconChroma]] — entropy-agnostic after residual parse, and
  * oracle-proven by q235).
  *
  * What is implemented, per the public spec (clauses cited inline):
  *  - the binary arithmetic decoding engine (9.3.3.2): DecodeDecision
  *    with the 64-state probability machine (rangeTabLPS Table 9-44,
  *    transIdx Table 9-45), DecodeBypass, DecodeTerminate, RenormD;
  *  - the matching encoder (9.3.4): EncodeDecision/RenormE with
  *    PutBit + bitsOutstanding carry resolution, EncodeBypass,
  *    EncodeTerminate and EncodeFlush (whose final bit doubles as the
  *    rbsp_stop_one_bit);
  *  - context-variable initialization (9.3.1.1): the (m, n) → pStateIdx/
  *    valMPS derivation over the I-slice initialization constants of
  *    Tables 9-12..9-23 for ctxIdx 0..275;
  *  - slice-data framing (7.3.4): cabac_alignment_one_bit, per-macroblock
  *    end_of_slice_flag via the terminate rule;
  *  - the I-slice macroblock layer (9.3.2/9.3.3): mb_type binarization
  *    with its neighbor ctxIdxInc, prev/rem intra4x4 pred modes
  *    (ctx 68/69), intra_chroma_pred_mode (TU, ctx 64..67),
  *    coded_block_pattern (luma 73..76 with per-8x8 neighbor bits, chroma
  *    77..84), mb_qp_delta (unary, ctx 60..63), and residual_block_cabac:
  *    coded_block_flag (ctx 85..104 by ctxBlockCat with the intra
  *    unavailable-neighbor = 1 rule), the significant/last coefficient
  *    maps (ctx 105..226, frame scan), and coeff_abs_level_minus1 as
  *    UEG0 (uCoff 14) with the numDecodAbsLevelEq1/Gt1 context rule and
  *    bypass-coded EG0 escapes and signs.
  *
  * Verification boundary, stated plainly — WEAKER than CAVLC's, and why:
  * the CAVLC tables are prefix-free codes, so a transcription slip is
  * independently witnessed in-repo by the prefix-freeness spec. CABAC's
  * initialization constants admit NO such witness: ANY (m, n) values
  * yield a self-consistent codec (round-trip and the q239 oracle both
  * pass regardless), so in this zero-egress container their transcription
  * cannot be independently validated. What IS pinned: the engine state
  * machines (hand-computed known-answer tests + bin-level round-trip fuzz
  * in H264CabacSpec), the Table 9-44/9-45 structural invariants, the
  * binarizations, and — through q239 and the CAVLC cross-check (same
  * planted macroblocks through both entropy codecs must produce identical
  * pixels) — the entire parse→pixel path. Externally-encoded CABAC
  * streams therefore remain on the documented MediaDecoder seam until
  * conformance vectors can be run: this module decodes them structurally,
  * but a deviated init constant would desync against a real encoder.
  * I_PCM inside CABAC slices (engine re-initialization, 9.3.1.2) is
  * rejected loudly, as are B/P slices.
  *
  * The reference repo has no video surface (SURVEY.md §2.11); built from
  * the public spec alone, like the rest of the family.
  */
object H264Cabac {

  // ------------------------------------------------------- engine tables ---

  /** Table 9-44: codIRangeLPS by (pStateIdx, qCodIRangeIdx). */
  private[ops] val rangeTabLps: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** Table 9-45: transIdxLPS. MPS transition is Min(pStateIdx + 1, 62)
    * with 63 fixed.
    */
  private[ops] val transIdxLps: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 23, 24, 24,
    25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33, 33,
    33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63, 63)

  private def transIdxMps(s: Int): Int = if (s >= 62) s else s + 1

  // -------------------------------------------------- context init table ---

  /** I-slice context initialization constants (m, n) for ctxIdx 0..275
    * (Tables 9-12..9-23, the column used when cabac_init_idc is absent).
    * Regions this subset never touches (11..59 — P/B mb types, skip,
    * sub-mb, motion, ref_idx; 70..72 — mb_field_decoding_flag) are
    * present for index stability; their values are never read by an
    * I-slice decode except 70..72 which are transcribed anyway.
    *
    * TRANSCRIPTION CONFIDENCE: see the object scaladoc — these constants
    * have no in-container witness; any deviation preserves every in-repo
    * gate but would desync external CABAC streams.
    */
  private val initMN: Array[(Int, Int)] = {
    val t = Array.fill[(Int, Int)](276)((0, 0))
    val known: Seq[(Int, Seq[(Int, Int)])] = Seq(
      // 0..10: mb_type (SI/I)
      0 -> Seq((20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
        (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51)),
      // 60..63: mb_qp_delta; 64..67: intra_chroma_pred_mode;
      // 68: prev_intra4x4_pred_mode_flag; 69: rem_intra4x4_pred_mode
      60 -> Seq((0, 41), (0, 63), (0, 63), (0, 63),
        (-9, 83), (4, 86), (0, 97), (-7, 72), (13, 41), (3, 62)),
      // 70..72: mb_field_decoding_flag (unused here)
      70 -> Seq((0, 11), (1, 55), (0, 69)),
      // 73..76: coded_block_pattern luma; 77..84: chroma
      73 -> Seq((-17, 127), (-13, 102), (0, 82), (-7, 74),
        (-21, 107), (-27, 127), (-31, 127), (-24, 127),
        (-18, 95), (-27, 127), (-21, 114), (-30, 127)),
      // 85..104: coded_block_flag by ctxBlockCat (0,4,8,12,16) + inc
      85 -> Seq((-17, 123), (-12, 115), (-16, 122), (-11, 115),
        (-12, 63), (-2, 68), (-15, 84), (-13, 104),
        (-3, 70), (-8, 93), (-10, 90), (-30, 127),
        (-1, 74), (-6, 97), (-7, 91), (-20, 127),
        (-4, 56), (-5, 82), (-7, 76), (-22, 125)),
      // 105..165: significant_coeff_flag (frame)
      105 -> Seq((-7, 93), (-11, 87), (-3, 77), (-5, 71),
        (-4, 63), (-4, 68), (-12, 84), (-7, 62),
        (-7, 65), (8, 61), (5, 56), (-2, 66),
        (1, 64), (0, 61), (-2, 78), (1, 50),
        (7, 52), (10, 35), (0, 44), (11, 38),
        (1, 45), (0, 46), (5, 44), (31, 17),
        (1, 51), (7, 50), (28, 19), (16, 33),
        (14, 62), (-13, 108), (-15, 100), (-13, 101),
        (-13, 91), (-12, 94), (-10, 88), (-16, 84),
        (-10, 86), (-7, 83), (-13, 87), (-19, 94),
        (1, 70), (0, 72), (-5, 74), (18, 59),
        (-8, 102), (-15, 100), (0, 95), (-4, 75),
        (2, 72), (-11, 75), (-3, 71), (15, 46),
        (-13, 69), (0, 62), (0, 65), (21, 37),
        (-15, 72), (9, 57), (16, 54), (0, 62), (12, 72)),
      // 166..226: last_significant_coeff_flag (frame)
      166 -> Seq((24, 0), (15, 9), (8, 25), (13, 18),
        (15, 9), (13, 19), (10, 37), (12, 18),
        (6, 29), (20, 33), (15, 30), (4, 45),
        (1, 58), (0, 62), (7, 61), (12, 38),
        (11, 45), (15, 39), (11, 42), (13, 44),
        (16, 45), (12, 41), (10, 49), (30, 34),
        (18, 42), (10, 55), (17, 51), (17, 46),
        (0, 89), (26, -19), (22, -17), (26, -17),
        (30, -25), (28, -20), (33, -23), (37, -27),
        (33, -23), (40, -28), (38, -17), (33, -11),
        (40, -15), (41, -6), (38, 1), (41, 17),
        (30, -6), (27, 3), (26, 22), (37, -16),
        (35, -4), (38, -8), (38, -3), (37, 3),
        (38, 5), (42, 0), (35, 16), (39, 22),
        (14, 48), (27, 37), (21, 60), (12, 68), (2, 97)),
      // 227..275: coeff_abs_level_minus1
      227 -> Seq((-3, 71), (-6, 42), (-5, 50), (-3, 54),
        (-2, 62), (0, 58), (1, 63), (-2, 72),
        (-1, 74), (-9, 91), (-5, 67), (-4, 76),
        (-4, 77), (-4, 82), (-4, 76), (-6, 93),
        (-4, 82), (-5, 85), (-7, 100), (-7, 96),
        (-7, 94), (-7, 91), (-15, 89), (-13, 92),
        (-10, 89), (-13, 88), (-16, 85), (-13, 83),
        (-12, 87), (-19, 94), (-18, 93), (-17, 98),
        (-6, 76), (-2, 44), (0, 45), (0, 52),
        (-3, 64), (-2, 59), (-4, 70), (-4, 75),
        (-8, 82), (-17, 102), (-9, 77), (3, 24),
        (0, 42), (0, 48), (0, 55), (-6, 59), (-7, 71)))
    known.foreach { case (base, vals) =>
      vals.zipWithIndex.foreach { case (v, i) => t(base + i) = v }
    }
    t
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** 9.3.1.1: initialize all context states/valMPS for SliceQPY. */
  private def initContexts(qp: Int): (Array[Int], Array[Int]) = {
    val state = new Array[Int](276)
    val mps = new Array[Int](276)
    val q = clip3(0, 51, qp)
    var i = 0
    while (i < 276) {
      val (m, n) = initMN(i)
      val pre = clip3(1, 126, ((m * q) >> 4) + n)
      if (pre <= 63) { state(i) = 63 - pre; mps(i) = 0 }
      else { state(i) = pre - 64; mps(i) = 1 }
      i += 1
    }
    (state, mps)
  }

  // ------------------------------------------------------ decoder engine ---

  /** 9.3.3.2 binary arithmetic decoder over a [[BitReader]] positioned at
    * the byte-aligned start of the slice data.
    */
  private[ops] final class ArithDecoder(r: BitReader, qp: Int) {
    private var range = 510
    private var offset = r.u(9).toInt
    require(offset < 510, "CABAC init: codIOffset must be < codIRange")
    private val (state, mps) = initContexts(qp)

    def decision(ctx: Int): Int = {
      val s = state(ctx)
      val rLps = rangeTabLps(s)((range >> 6) & 3)
      range -= rLps
      val bin =
        if (offset >= range) { // LPS
          offset -= range
          range = rLps
          val b = 1 - mps(ctx)
          if (s == 0) mps(ctx) = 1 - mps(ctx)
          state(ctx) = transIdxLps(s)
          b
        } else { // MPS
          state(ctx) = transIdxMps(s)
          mps(ctx)
        }
      while (range < 256) {
        range <<= 1
        offset = (offset << 1) | r.u(1).toInt
      }
      bin
    }

    def bypass(): Int = {
      offset = (offset << 1) | r.u(1).toInt
      if (offset >= range) { offset -= range; 1 } else 0
    }

    def terminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        while (range < 256) {
          range <<= 1
          offset = (offset << 1) | r.u(1).toInt
        }
        0
      }
    }

    /** UEGk suffix, k = 0 (9.3.2.4), bypass-coded. */
    def eg0(): Int = {
      var k = 0; var v = 0
      while (bypass() == 1) {
        v += 1 << k; k += 1
        require(k <= 20, "EG0 escape out of range (corrupt stream)")
      }
      while (k > 0) { k -= 1; v += bypass() << k }
      v
    }
  }

  // ------------------------------------------------------ encoder engine ---

  /** 9.3.4 binary arithmetic encoder emitting into a [[BitWriter]] that is
    * byte-aligned at construction (after cabac_alignment_one_bit).
    */
  private[ops] final class ArithEncoder(w: BitWriter, qp: Int) {
    private var low = 0
    private var range = 510
    private var firstBit = true
    private var outstanding = 0
    private val (state, mps) = initContexts(qp)

    private def putBit(b: Int): Unit = {
      if (firstBit) firstBit = false else w.u(b.toLong, 1)
      while (outstanding > 0) { w.u((1 - b).toLong, 1); outstanding -= 1 }
    }

    private def renorm(): Unit = {
      while (range < 256) {
        if (low >= 512) { putBit(1); low -= 512 }
        else if (low < 256) putBit(0)
        else { outstanding += 1; low -= 256 }
        range <<= 1
        low <<= 1
      }
    }

    def decision(ctx: Int, bin: Int): Unit = {
      val s = state(ctx)
      val rLps = rangeTabLps(s)((range >> 6) & 3)
      range -= rLps
      if (bin != mps(ctx)) {
        low += range
        range = rLps
        if (s == 0) mps(ctx) = 1 - mps(ctx)
        state(ctx) = transIdxLps(s)
      } else state(ctx) = transIdxMps(s)
      renorm()
    }

    def bypass(bin: Int): Unit = {
      low <<= 1
      if (bin == 1) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    def terminate(bin: Int): Unit = {
      range -= 2
      if (bin == 1) { low += range; flush() } else renorm()
    }

    /** 9.3.4.6: the final two written bits carry ((codILow >> 7) & 3) | 1 —
      * the trailing 1 is the rbsp_stop_one_bit; the caller byte-aligns
      * with zeros afterwards.
      */
    private def flush(): Unit = {
      range = 2
      renorm()
      putBit((low >> 9) & 1)
      w.u((((low >> 7) & 3) | 1).toLong, 2)
    }

    def eg0(value: Int): Unit = {
      var v = value; var k = 0
      while (v >= (1 << k)) { bypass(1); v -= 1 << k; k += 1 }
      bypass(0)
      while (k > 0) { k -= 1; bypass((v >> k) & 1) }
    }
  }

  // -------------------------------------------------- ctx model (grids) ---

  /** Per-picture neighbor state shared by the encoder and decoder loops so
    * every ctxIdxInc derivation has exactly one implementation. (Shared-
    * derivation caveat as for the inter codec's mv predictor: a slip here
    * round-trips invisibly; only the context CHOICE is affected, never
    * decoded values of our own streams.)
    */
  private final class Model(mbsX: Int, mbsY: Int) {
    val isI4x4 = Array.ofDim[Boolean](mbsY, mbsX)
    val decoded = Array.ofDim[Boolean](mbsY, mbsX)
    val cbpLuma = Array.ofDim[Int](mbsY, mbsX)
    val cbpChroma = Array.ofDim[Int](mbsY, mbsX)
    val chromaMode = Array.ofDim[Int](mbsY, mbsX)
    val isI16 = Array.ofDim[Boolean](mbsY, mbsX)
    val dcCbf = Array.ofDim[Int](mbsY, mbsX)             // Intra16x16 DC
    val lumaCbf = Array.ofDim[Int](mbsY * 4, mbsX * 4)   // 4x4 AC/luma
    val cdcCbf = Array.ofDim[Int](2, mbsY, mbsX)         // chroma DC
    val cacCbf = Array.ofDim[Int](2, mbsY * 2, mbsX * 2) // chroma AC
    val mode4x4 = Array.fill(mbsY * 4, mbsX * 4)(2)
    var prevQpDeltaNz = false

    private def avail(x: Int, y: Int): Boolean =
      x >= 0 && y >= 0 && x < mbsX && decoded(y)(x)

    /** mb_type bin0 (9.3.3.1.1.3): neighbor coded and not I_NxN → 1. */
    def mbTypeInc(mbX: Int, mbY: Int): Int = {
      def c(x: Int, y: Int) = if (avail(x, y) && !isI4x4(y)(x)) 1 else 0
      c(mbX - 1, mbY) + c(mbX, mbY - 1)
    }

    /** intra_chroma_pred_mode bin0 (9.3.3.1.1.8). */
    def chromaModeInc(mbX: Int, mbY: Int): Int = {
      def c(x: Int, y: Int) = if (avail(x, y) && chromaMode(y)(x) != 0) 1 else 0
      c(mbX - 1, mbY) + c(mbX, mbY - 1)
    }

    /** coded_block_pattern luma bin for 8x8 index i (9.3.3.1.1.4):
      * condTermFlagN = 1 only when the neighboring 8x8 EXISTS and its
      * cbp bit is 0 — an absent neighbor macroblock contributes 0 (the
      * JM derivation: `mb_available_up == NULL → b = 0`), which this
      * models by treating its bit as set. `partial` holds this MB's
      * already-decoded bits.
      */
    def cbpLumaInc(mbX: Int, mbY: Int, i: Int, partial: Int): Int = {
      def bitOf(x: Int, y: Int, blk: Int): Int =
        if (x == mbX && y == mbY) (partial >> blk) & 1
        else if (avail(x, y)) (cbpLuma(y)(x) >> blk) & 1
        else 1 // unavailable → condTermFlag 0
      val (ax, ay, ablk) = i match {
        case 0 => (mbX - 1, mbY, 1)
        case 1 => (mbX, mbY, 0)
        case 2 => (mbX - 1, mbY, 3)
        case _ => (mbX, mbY, 2)
      }
      val (bx, by, bblk) = i match {
        case 0 => (mbX, mbY - 1, 2)
        case 1 => (mbX, mbY - 1, 3)
        case 2 => (mbX, mbY, 0)
        case _ => (mbX, mbY, 1)
      }
      (1 - bitOf(ax, ay, ablk)) + 2 * (1 - bitOf(bx, by, bblk))
    }

    /** coded_block_pattern chroma bins (9.3.3.1.1.4): bin0 on != 0,
      * bin1 on == 2; absent neighbor → 0.
      */
    def cbpChromaInc(mbX: Int, mbY: Int, bin: Int): Int = {
      def c(x: Int, y: Int) =
        if (!avail(x, y)) 0
        else if (bin == 0) { if (cbpChroma(y)(x) != 0) 1 else 0 }
        else { if (cbpChroma(y)(x) == 2) 1 else 0 }
      c(mbX - 1, mbY) + 2 * c(mbX, mbY - 1)
    }

    def qpDeltaInc: Int = if (prevQpDeltaNz) 1 else 0

    // coded_block_flag ctxIdxInc (9.3.3.1.1.9) — current MB is intra, so
    // an out-of-picture neighbor contributes 1
    def cbfIncDc(mbX: Int, mbY: Int): Int = {
      def c(x: Int, y: Int) =
        if (!avail(x, y)) 1 else if (!isI16(y)(x)) 0 else dcCbf(y)(x)
      c(mbX - 1, mbY) + 2 * c(mbX, mbY - 1)
    }
    def cbfIncLuma(gx: Int, gy: Int): Int = {
      def c(x: Int, y: Int) =
        if (x < 0 || y < 0) 1 else lumaCbf(y)(x)
      c(gx - 1, gy) + 2 * c(gx, gy - 1)
    }
    def cbfIncCdc(mbX: Int, mbY: Int, comp: Int): Int = {
      def c(x: Int, y: Int) =
        if (!avail(x, y)) 1
        else if (cbpChroma(y)(x) == 0) 0 else cdcCbf(comp)(y)(x)
      c(mbX - 1, mbY) + 2 * c(mbX, mbY - 1)
    }
    def cbfIncCac(cgx: Int, cgy: Int, comp: Int): Int = {
      def c(x: Int, y: Int) =
        if (x < 0 || y < 0) 1 else cacCbf(comp)(y)(x)
      c(cgx - 1, cgy) + 2 * c(cgx, cgy - 1)
    }

    /** 8.3.1.1 predicted Intra_4x4 mode — identical to the CAVLC grids. */
    def predictedMode(mbX: Int, mbY: Int, b: Int): Int = {
      val (bx, by) = H264Cavlc.blk4x4(b)
      def nb(dx: Int, dy: Int): Int = {
        val gx = mbX * 4 + bx + dx; val gy = mbY * 4 + by + dy
        if (gx < 0 || gy < 0) 2
        else if (!isI4x4(gy / 4)(gx / 4)) 2
        else mode4x4(gy)(gx)
      }
      math.min(nb(-1, 0), nb(0, -1))
    }
  }

  // -------------------------------------- residual ctx offsets (Table 9-40) ---

  private val cbfCatOff = Array(0, 4, 8, 12, 16)
  private val sigCatOff = Array(0, 15, 29, 44, 47)
  private val lvlCatOff = Array(0, 10, 20, 30, 39)

  private def sigCtx(cat: Int, i: Int): Int =
    105 + sigCatOff(cat) + (if (cat == 3) math.min(i, 2) else i)
  private def lastCtx(cat: Int, i: Int): Int =
    166 + sigCatOff(cat) + (if (cat == 3) math.min(i, 2) else i)

  // ------------------------------------------------------------ decoder ---

  /** Decode the zigzag levels of one residual block (9.3.2.3): returns
    * (levels, codedBlockFlag).
    */
  private def decodeResidual(d: ArithDecoder, cat: Int, maxCoeff: Int,
      cbfInc: Int): (Array[Int], Int) = {
    val levels = new Array[Int](maxCoeff)
    val cbf = d.decision(85 + cbfCatOff(cat) + cbfInc)
    if (cbf == 0) return (levels, 0)
    val sig = new Array[Boolean](maxCoeff)
    var last = maxCoeff - 1
    var i = 0
    var done = false
    while (!done && i < maxCoeff - 1) {
      sig(i) = d.decision(sigCtx(cat, i)) == 1
      if (sig(i) && d.decision(lastCtx(cat, i)) == 1) { last = i; done = true }
      i += 1
    }
    if (!done) sig(maxCoeff - 1) = true // implicit when no last fired
    var numEq1 = 0; var numGt1 = 0
    var idx = last
    while (idx >= 0) {
      if (sig(idx)) {
        val ctx0 = 227 + lvlCatOff(cat) +
          (if (numGt1 > 0) 0 else math.min(4, 1 + numEq1))
        var value = 0
        if (d.decision(ctx0) == 1) {
          value = 1
          val ctxN = 227 + lvlCatOff(cat) + 5 +
            math.min(if (cat == 3) 3 else 4, numGt1)
          while (value < 14 && d.decision(ctxN) == 1) value += 1
          if (value == 14) value += d.eg0()
        }
        val neg = d.bypass() == 1
        levels(idx) = if (neg) -(value + 1) else value + 1
        if (value == 0) numEq1 += 1 else numGt1 += 1
      }
      idx -= 1
    }
    (levels, 1)
  }

  /** Encode one residual block; returns the coded_block_flag it wrote. */
  private def encodeResidual(e: ArithEncoder, cat: Int, maxCoeff: Int,
      cbfInc: Int, levels: Array[Int]): Int = {
    val nz = levels.count(_ != 0)
    val cbf = if (nz > 0) 1 else 0
    e.decision(85 + cbfCatOff(cat) + cbfInc, cbf)
    if (cbf == 0) return 0
    val last = levels.lastIndexWhere(_ != 0)
    var i = 0
    while (i < maxCoeff - 1 && i <= last) {
      val s = if (levels(i) != 0) 1 else 0
      e.decision(sigCtx(cat, i), s)
      if (s == 1) e.decision(lastCtx(cat, i), if (i == last) 1 else 0)
      i += 1
    }
    var numEq1 = 0; var numGt1 = 0
    var idx = last
    while (idx >= 0) {
      val lvl = levels(idx)
      if (lvl != 0) {
        val value = math.abs(lvl) - 1
        val ctx0 = 227 + lvlCatOff(cat) +
          (if (numGt1 > 0) 0 else math.min(4, 1 + numEq1))
        if (value == 0) e.decision(ctx0, 0)
        else {
          e.decision(ctx0, 1)
          val ctxN = 227 + lvlCatOff(cat) + 5 +
            math.min(if (cat == 3) 3 else 4, numGt1)
          val pre = math.min(value, 14)
          var j = 1
          while (j < pre) { e.decision(ctxN, 1); j += 1 }
          if (value < 14) e.decision(ctxN, 0)
          else e.eg0(value - 14)
        }
        e.bypass(if (lvl < 0) 1 else 0)
        if (value == 0) numEq1 += 1 else numGt1 += 1
      }
      idx -= 1
    }
    1
  }

  // --------------------------------------------------------- stream layer ---

  /** Encode planted I-slice frames as a CABAC Annex-B stream — the
    * [[H264Cavlc.encodeIntra]] counterpart (same [[H264Cavlc.MbPlan]]s,
    * same SPS/slice headers, PPS with entropy_coding_mode_flag = 1).
    * I_PCM plans are rejected (engine re-init unimplemented).
    */
  def encodeIntra(mbsX: Int, mbsY: Int, qp: Int,
      frames: Seq[Seq[H264Cavlc.MbPlan]], deblockIdc: Int = 1,
      aOffD2: Int = 0, bOffD2: Int = 0): Array[Byte] = {
    require(qp >= 12 && qp <= 51, s"planted-stream QP $qp outside [12,51]")
    val out = new java.io.ByteArrayOutputStream()
    H264.writeNal(out, 3, 7,
      H264.writeSps(H264.Sps(66, 20, 4, 2, mbsX, mbsY, 0, 0, frameMbsOnly = true, maxNumRefFrames = 0)))
    H264.writeNal(out, 3, 8, H264.writePps(cabac = true))
    frames.zipWithIndex.foreach { case (mbs, k) =>
      require(mbs.length == mbsX * mbsY, "frame must plant every MB")
      val w = new BitWriter
      w.ue(0); w.ue(7); w.ue(0)
      w.u(0, 4)
      w.ue(k % 2)
      w.u(0, 1); w.u(0, 1)
      w.se(qp - 26)
      w.ue(deblockIdc)
      if (deblockIdc != 1) { w.se(aOffD2); w.se(bOffD2) }
      while (!w.byteAligned) w.u(1, 1) // cabac_alignment_one_bit (7.3.4)
      val e = new ArithEncoder(w, qp)
      val model = new Model(mbsX, mbsY)
      var qpY = qp
      mbs.zipWithIndex.foreach { case (plan, mbIdx) =>
        val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
        plan match {
          case p: H264Cavlc.I16x16 =>
            val hasAc = p.ac != null && p.ac.exists(b => b != null && b.exists(_ != 0))
            val cbpL = if (hasAc) 15 else 0
            val cbpC = if (p.chromaDc != null) 1 else 0
            // mb_type: bin0=1, terminate 0 (not PCM), cbpLuma!=0,
            // chroma TU, pred mode 2 bins
            e.decision(3 + model.mbTypeInc(mbX, mbY), 1)
            e.terminate(0)
            e.decision(6, if (hasAc) 1 else 0)
            e.decision(7, if (cbpC > 0) 1 else 0)
            if (cbpC > 0) e.decision(8, cbpC - 1)
            e.decision(9, (p.predMode >> 1) & 1)
            e.decision(10, p.predMode & 1)
            // intra_chroma_pred_mode = 0 (DC): TU bin0 = 0
            e.decision(64 + model.chromaModeInc(mbX, mbY), 0)
            encodeQpDelta(e, model, p.qpDelta)
            qpY = (qpY + p.qpDelta + 52) % 52
            // DC block (cat0)
            val dcLv = p.dc.padTo(16, 0).take(16)
            model.dcCbf(mbY)(mbX) =
              encodeResidual(e, 0, 16, model.cbfIncDc(mbX, mbY), dcLv)
            if (hasAc) {
              var b = 0
              while (b < 16) {
                val (bx, by) = H264Cavlc.blk4x4(b)
                val gx = mbX * 4 + bx; val gy = mbY * 4 + by
                val lv = (if (p.ac(b) == null) Array.empty[Int]
                  else p.ac(b)).padTo(15, 0).take(15)
                model.lumaCbf(gy)(gx) =
                  encodeResidual(e, 1, 15, model.cbfIncLuma(gx, gy), lv)
                b += 1
              }
            }
            encodeChromaResidual(e, model, mbX, mbY, cbpC, p.chromaDc)
            model.isI16(mbY)(mbX) = true
            model.cbpLuma(mbY)(mbX) = cbpL
            model.cbpChroma(mbY)(mbX) = cbpC
          case p: H264Cavlc.I4x4 =>
            require(p.modes.length == 16 && p.levels.length == 16)
            e.decision(3 + model.mbTypeInc(mbX, mbY), 0) // I_NxN
            model.isI4x4(mbY)(mbX) = true
            var b = 0
            while (b < 16) {
              val (bx, by) = H264Cavlc.blk4x4(b)
              val predicted = model.predictedMode(mbX, mbY, b)
              val mode = p.modes(b)
              if (mode == predicted) e.decision(68, 1)
              else {
                e.decision(68, 0)
                val rem = if (mode < predicted) mode else mode - 1
                e.decision(69, rem & 1)
                e.decision(69, (rem >> 1) & 1)
                e.decision(69, (rem >> 2) & 1)
              }
              model.mode4x4(mbY * 4 + by)(mbX * 4 + bx) = mode
              b += 1
            }
            e.decision(64 + model.chromaModeInc(mbX, mbY), 0) // DC
            val cbpC = if (p.chromaDc != null) 1 else 0
            var partial = 0
            var i = 0
            while (i < 4) {
              val bit = (p.cbpLuma >> i) & 1
              e.decision(73 + model.cbpLumaInc(mbX, mbY, i, partial), bit)
              partial |= bit << i
              i += 1
            }
            e.decision(77 + model.cbpChromaInc(mbX, mbY, 0),
              if (cbpC > 0) 1 else 0)
            if (cbpC > 0)
              e.decision(77 + 4 + model.cbpChromaInc(mbX, mbY, 1), cbpC - 1)
            val cbp = p.cbpLuma | (cbpC << 4)
            if (cbp > 0) {
              encodeQpDelta(e, model, p.qpDelta)
              qpY = (qpY + p.qpDelta + 52) % 52
            } else model.prevQpDeltaNz = false
            b = 0
            while (b < 16) {
              val (bx, by) = H264Cavlc.blk4x4(b)
              val gx = mbX * 4 + bx; val gy = mbY * 4 + by
              if ((p.cbpLuma & (1 << (b / 4))) != 0) {
                val lv = (if (p.levels(b) == null) Array.empty[Int]
                  else p.levels(b)).padTo(16, 0).take(16)
                model.lumaCbf(gy)(gx) =
                  encodeResidual(e, 2, 16, model.cbfIncLuma(gx, gy), lv)
              }
              b += 1
            }
            if (cbp > 0) encodeChromaResidual(e, model, mbX, mbY, cbpC, p.chromaDc)
            model.cbpLuma(mbY)(mbX) = p.cbpLuma
            model.cbpChroma(mbY)(mbX) = cbpC
          case _ =>
            throw new IllegalArgumentException(
              "CABAC encoder: I_PCM plans unsupported (engine re-init)")
        }
        model.chromaMode(mbY)(mbX) = 0
        model.decoded(mbY)(mbX) = true
        e.terminate(if (mbIdx == mbs.length - 1) 1 else 0) // end_of_slice
      }
      w.alignZero() // flush already wrote the rbsp stop bit
      H264.writeNal(out, 3, 5, w.toBytes)
    }
    out.toByteArray
  }

  private def encodeQpDelta(e: ArithEncoder, model: Model, delta: Int): Unit = {
    val code = if (delta > 0) 2 * delta - 1 else -2 * delta
    if (code == 0) e.decision(60 + model.qpDeltaInc, 0)
    else {
      e.decision(60 + model.qpDeltaInc, 1)
      if (code == 1) e.decision(62, 0)
      else {
        e.decision(62, 1)
        var i = 2
        while (i < code) { e.decision(63, 1); i += 1 }
        e.decision(63, 0)
      }
    }
    model.prevQpDeltaNz = delta != 0
  }

  private def encodeChromaResidual(e: ArithEncoder, model: Model,
      mbX: Int, mbY: Int, cbpC: Int, chromaDc: Array[Array[Int]]): Unit = {
    if (cbpC > 0) {
      var c = 0
      while (c < 2) {
        val lv = chromaDc(c).padTo(4, 0).take(4)
        model.cdcCbf(c)(mbY)(mbX) =
          encodeResidual(e, 3, 4, model.cbfIncCdc(mbX, mbY, c), lv)
        c += 1
      }
    }
    // cbpC == 2 (chroma AC) is never planted; decoder supports it
  }

  /** Decode every I slice of a CABAC Annex-B stream — the
    * [[H264Cavlc.decodeIntraFrames]] counterpart; one luma plane per
    * picture, chroma fully decoded internally, deblocking per the slice
    * header through the shared [[H264Deblock]].
    */
  def decodeIntraFrames(annexB: Array[Byte]): Seq[Array[Array[Int]]] = {
    val nals = H264.splitNals(annexB)
    val sps = nals.collectFirst { case (7, _, rbsp) => H264.parseSps(rbsp) }
      .getOrElse(throw new IllegalArgumentException("no SPS in stream"))
    require(sps.cropX == 0 && sps.cropY == 0, "cabac decoder: cropping unsupported")
    require(sps.picOrderCntType == 2, "cabac decoder: pic_order_cnt_type must be 2")
    require(sps.frameMbsOnly, "cabac decoder: interlaced streams unsupported")
    val ppsId = H264.requireSingleParamSets(nals, "cabac decoder")
    val pps = nals.collectFirst { case (8, _, rbsp) => rbsp }
      .getOrElse(throw new IllegalArgumentException("no PPS in stream"))
    val (initQp, chromaOff, deblock) = {
      val r = new BitReader(pps)
      r.ue(); r.ue()
      require(r.u(1) == 1,
        "cabac decoder: stream is CAVLC — use H264Cavlc.decodeIntraFrames")
      r.u(1)
      require(r.ue() == 0, "cabac decoder: slice groups unsupported")
      r.ue(); r.ue(); r.u(1); r.u(2)
      val q = r.se() + 26
      r.se()
      val co = r.se()
      (q, co, r.u(1) == 1)
    }
    val mbsX = sps.widthMbs; val mbsY = sps.heightMbs
    nals.filter(n => n._1 == 1 || n._1 == 5).map { case (nalType, refIdc, rbsp) =>
      val r = new BitReader(rbsp)
      require(r.ue() == 0, "cabac decoder: one slice per picture")
      val sliceType = r.ue()
      require(sliceType % 5 == 2, s"cabac decoder: not an I slice ($sliceType)")
      H264.requireSlicePps(r.ue(), ppsId, "cabac decoder")
      r.u(sps.log2MaxFrameNum)
      if (nalType == 5) r.ue()
      if (nalType == 5) { r.u(1); r.u(1) }
      else if (refIdc != 0)
        require(r.u(1) == 0, "cabac decoder: MMCO unsupported")
      val sliceQp = initQp + r.se()
      val (filterOn, offA, offB) = H264.sliceDeblocking(r, deblock)
      r.alignToByte(1) // cabac_alignment_one_bit: each padding bit MUST
      // be 1 (7.3.3) — a zero bit is a non-conformant stream, rejected
      val d = new ArithDecoder(r, sliceQp)
      val model = new Model(mbsX, mbsY)
      val luma = Array.ofDim[Int](mbsY * 16, mbsX * 16)
      val cb = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val cr = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val info = if (filterOn) new H264Deblock.PicInfo(mbsX, mbsY) else null
      var qpY = sliceQp
      var mbIdx = 0
      while (mbIdx < mbsX * mbsY) {
        val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
        val leftAvail = mbX > 0; val topAvail = mbY > 0
        val bin0 = d.decision(3 + model.mbTypeInc(mbX, mbY))
        if (bin0 == 0) {
          // ------------------------------------------------- Intra_4x4 ---
          model.isI4x4(mbY)(mbX) = true
          val modes = new Array[Int](16)
          var b = 0
          while (b < 16) {
            val (bx, by) = H264Cavlc.blk4x4(b)
            val predicted = model.predictedMode(mbX, mbY, b)
            val mode =
              if (d.decision(68) == 1) predicted
              else {
                val rem = d.decision(69) | (d.decision(69) << 1) |
                  (d.decision(69) << 2)
                if (rem < predicted) rem else rem + 1
              }
            modes(b) = mode
            model.mode4x4(mbY * 4 + by)(mbX * 4 + bx) = mode
            b += 1
          }
          val chromaPredMode = decodeChromaMode(d, model, mbX, mbY)
          var cbpLuma = 0
          var i = 0
          while (i < 4) {
            cbpLuma |= d.decision(73 + model.cbpLumaInc(mbX, mbY, i, cbpLuma)) << i
            i += 1
          }
          var cbpChroma = 0
          if (d.decision(77 + model.cbpChromaInc(mbX, mbY, 0)) == 1)
            cbpChroma = 1 + d.decision(77 + 4 + model.cbpChromaInc(mbX, mbY, 1))
          if ((cbpLuma | cbpChroma) > 0) qpY = decodeQpDelta(d, model, qpY)
          else model.prevQpDeltaNz = false
          b = 0
          while (b < 16) {
            val (bx, by) = H264Cavlc.blk4x4(b)
            val gx = mbX * 4 + bx; val gy = mbY * 4 + by
            val levels =
              if ((cbpLuma & (1 << (b / 4))) != 0) {
                val (lv, cbf) = decodeResidual(d, 2, 16, model.cbfIncLuma(gx, gy))
                model.lumaCbf(gy)(gx) = cbf
                lv
              } else new Array[Int](16)
            H264Cavlc.reconI4x4Block(luma, mbsX, mbX, mbY, b, modes(b), levels, qpY)
            b += 1
          }
          decodeChromaResidual(d, model, mbX, mbY, cbpChroma, chromaPredMode,
            qpY, chromaOff, cb, cr, leftAvail, topAvail)
          model.cbpLuma(mbY)(mbX) = cbpLuma
          model.cbpChroma(mbY)(mbX) = cbpChroma
        } else {
          // I_PCM or Intra_16x16
          require(d.terminate() == 0,
            "cabac decoder: I_PCM in CABAC slices unsupported (engine re-init)")
          val hasAc = d.decision(6) == 1
          var cbpChroma = 0
          if (d.decision(7) == 1) cbpChroma = 1 + d.decision(8)
          val predMode = (d.decision(9) << 1) | d.decision(10)
          val chromaPredMode = decodeChromaMode(d, model, mbX, mbY)
          qpY = decodeQpDelta(d, model, qpY)
          val (dcLv, dcCbf) = decodeResidual(d, 0, 16, model.cbfIncDc(mbX, mbY))
          model.dcCbf(mbY)(mbX) = dcCbf
          val acLevels = Array.ofDim[Int](16, 15)
          if (hasAc) {
            var b = 0
            while (b < 16) {
              val (bx, by) = H264Cavlc.blk4x4(b)
              val gx = mbX * 4 + bx; val gy = mbY * 4 + by
              val (lv, cbf) = decodeResidual(d, 1, 15, model.cbfIncLuma(gx, gy))
              acLevels(b) = lv
              model.lumaCbf(gy)(gx) = cbf
              b += 1
            }
          }
          H264Cavlc.reconI16x16(luma, mbX, mbY, predMode, dcLv, acLevels, qpY,
            leftAvail, topAvail)
          decodeChromaResidual(d, model, mbX, mbY, cbpChroma, chromaPredMode,
            qpY, chromaOff, cb, cr, leftAvail, topAvail)
          model.isI16(mbY)(mbX) = true
          model.cbpLuma(mbY)(mbX) = if (hasAc) 15 else 0
          model.cbpChroma(mbY)(mbX) = cbpChroma
        }
        model.decoded(mbY)(mbX) = true
        if (info != null) {
          info.intra(mbY)(mbX) = true
          info.qp(mbY)(mbX) = qpY
          var by = 0
          while (by < 4) {
            var bx = 0
            while (bx < 4) {
              info.nz(mbY * 4 + by)(mbX * 4 + bx) =
                model.lumaCbf(mbY * 4 + by)(mbX * 4 + bx) > 0
              bx += 1
            }
            by += 1
          }
        }
        val eos = d.terminate()
        require((eos == 1) == (mbIdx == mbsX * mbsY - 1),
          s"cabac decoder: end_of_slice_flag $eos at MB $mbIdx")
        mbIdx += 1
      }
      if (filterOn) H264Deblock.filter(luma, cb, cr, info, offA, offB, chromaOff)
      luma
    }
  }

  private def decodeChromaMode(d: ArithDecoder, model: Model,
      mbX: Int, mbY: Int): Int = {
    val mode =
      if (d.decision(64 + model.chromaModeInc(mbX, mbY)) == 0) 0
      else if (d.decision(67) == 0) 1
      else if (d.decision(67) == 0) 2
      else 3
    model.chromaMode(mbY)(mbX) = mode
    mode
  }

  private def decodeQpDelta(d: ArithDecoder, model: Model, qpY: Int): Int = {
    var code = 0
    if (d.decision(60 + model.qpDeltaInc) == 1) {
      code = 1
      if (d.decision(62) == 1) {
        code = 2
        while (code < 53 && d.decision(63) == 1) code += 1
        // 7.4.5 bounds mb_qp_delta to [-26, +25]: unary code 52 maps to
        // -26 (legal) but 51 maps to +26 — reject it rather than let the
        // mod-52 wrap silently tolerate an illegal stream
        require(code < 53 && code != 51,
          "mb_qp_delta out of range (corrupt stream)")
      }
    }
    val delta = if ((code & 1) == 1) (code + 1) / 2 else -(code / 2)
    model.prevQpDeltaNz = delta != 0
    (qpY + delta + 52) % 52
  }

  /** Parse + reconstruct the chroma residual of one MB (DC cat3, AC cat4)
    * through the shared [[H264Cavlc.reconChroma]].
    */
  private def decodeChromaResidual(d: ArithDecoder, model: Model,
      mbX: Int, mbY: Int, cbpChroma: Int, chromaPredMode: Int, qpY: Int,
      chromaOff: Int, cb: Array[Array[Int]], cr: Array[Array[Int]],
      leftAvail: Boolean, topAvail: Boolean): Unit = {
    val qpc = H264Cavlc.chromaQp(qpY + chromaOff)
    val dcLevels = Array.ofDim[Int](2, 4)
    val acLevels = Array.ofDim[Int](2, 4, 15)
    if (cbpChroma > 0) {
      var c = 0
      while (c < 2) {
        val (lv, cbf) = decodeResidual(d, 3, 4, model.cbfIncCdc(mbX, mbY, c))
        dcLevels(c) = lv
        model.cdcCbf(c)(mbY)(mbX) = cbf
        c += 1
      }
      if (cbpChroma == 2) {
        var c = 0
        while (c < 2) {
          var b = 0
          while (b < 4) {
            val bx = b % 2; val by = b / 2
            val (lv, cbf) =
              decodeResidual(d, 4, 15, model.cbfIncCac(mbX * 2 + bx, mbY * 2 + by, c))
            acLevels(c)(b) = lv
            model.cacCbf(c)(mbY * 2 + by)(mbX * 2 + bx) = cbf
            b += 1
          }
          c += 1
        }
      }
    }
    H264Cavlc.reconChroma(cb, cr, mbX, mbY, chromaPredMode, dcLevels, acLevels,
      qpc, leftAvail, topAvail)
  }
}
