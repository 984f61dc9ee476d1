package graft.ops

import H264.{BitReader, BitWriter}

/** Pure-JVM H.264 **CABAC entropy codec for I and P slices** (ITU-T Rec.
  * H.264, clause 9.3) — the last named entropy seam (VERDICT r11 item 5;
  * P slices VERDICT r13 item 3). Real-world encoders default to CABAC;
  * with this module the engine natively decodes I slices (q239) and P
  * slices (q244 — via [[PSliceDecoder]], driven by [[H264Inter]]'s
  * picture loop) whose PPS sets entropy_coding_mode_flag = 1, through
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
  * rejected loudly, as are CABAC B slices; P_8x8 sub-partitions decode
  * natively since round 14 (PSliceDecoder.subMbTypeP, q245).
  * The P-slice layer adds (9.3.2/9.3.3, round 14): mb_skip_flag
  * (ctx 11..13), P mb_type (14..17), ref_idx unary (54..59), mvd as
  * UEG3 with uCoff 9 (40..53 + EG3 bypass escapes), the inter
  * coded_block_flag edge rule, and the cabac_init_idc-0 P column
  * ([[initMNP]] — same transcription caveat).
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

  /** P-slice context initialization constants (m, n) for ctxIdx 0..275 —
    * the **cabac_init_idc = 0** column of Tables 9-13..9-23 (ctxIdx 0..10
    * are slice-type-independent, Table 9-12; the encoder always writes
    * cabac_init_idc 0, and the decoder rejects the other two columns
    * loudly rather than initialize from untranscribed tables).
    *
    * TRANSCRIPTION CONFIDENCE: same class as [[initMN]] and weaker —
    * NO in-container witness exists (any values round-trip and every
    * oracle passes), and this column was transcribed without the
    * original at hand. The contexts the P subset actually reads
    * (11..23 skip/mb_type, 40..59 mvd/ref_idx, 60..63 qp_delta,
    * 73..104 cbp/cbf, 105..275 residual) are all present; 24..39 are
    * the B contexts, transcribed for index stability but never read
    * (CABAC B slices reject loudly). External CABAC streams stay on
    * the MediaDecoder seam regardless, so a deviation here affects
    * NOTHING in-container — it would only surface once conformance
    * vectors can be run, exactly like the I column's declared risk.
    */
  private val initMNP: Array[(Int, Int)] = {
    val t = Array.fill[(Int, Int)](276)((0, 0))
    val known: Seq[(Int, Seq[(Int, Int)])] = Seq(
      // 0..10: mb_type (SI/I prefix) — slice-type-independent (Table 9-12)
      0 -> Seq((20, -15), (2, 54), (3, 74), (20, -15), (2, 54), (3, 74),
        (-28, 127), (-23, 104), (-6, 53), (-1, 54), (7, 51)),
      // 11..23: mb_skip_flag (P) + mb_type (P) — Table 9-13, idc 0
      11 -> Seq((23, 33), (23, 2), (21, 0), (1, 9), (0, 49), (-37, 118),
        (5, 57), (-13, 78), (-11, 65), (1, 62), (12, 49), (-4, 73), (17, 50)),
      // 24..39: mb_skip_flag (B) + mb_type (B) — Table 9-14, idc 0 (unread)
      24 -> Seq((18, 64), (9, 43), (29, 0), (26, 67), (16, 90), (9, 104),
        (-46, 127), (-20, 104), (1, 67), (-13, 78), (-11, 65), (1, 62),
        (-6, 86), (-17, 95), (-6, 61), (9, 45)),
      // 40..53: mvd_l0/l1 x then y — Table 9-15, idc 0
      40 -> Seq((-3, 69), (-6, 81), (-11, 96), (6, 55), (7, 67), (-5, 86),
        (2, 88), (0, 58), (-3, 76), (-10, 94), (5, 54), (4, 69), (-3, 81),
        (0, 88)),
      // 54..59: ref_idx — Table 9-16, idc 0
      54 -> Seq((-7, 67), (-5, 74), (-4, 74), (-5, 80), (-7, 72), (1, 58)),
      // 60..69: mb_qp_delta + intra pred modes — Table 9-17, idc 0
      60 -> Seq((0, 41), (0, 63), (0, 63), (0, 63),
        (-9, 83), (4, 86), (0, 97), (-7, 72), (13, 41), (3, 62)),
      // 70..72: mb_field_decoding_flag; 73..84: coded_block_pattern
      70 -> Seq((0, 45), (-4, 78), (-3, 96),
        (-27, 126), (-28, 98), (-25, 101), (-23, 67),
        (-28, 82), (-20, 94), (-16, 83), (-22, 110),
        (-21, 91), (-18, 102), (-13, 93), (-29, 127)),
      // 85..104: coded_block_flag — Table 9-18, idc 0
      85 -> Seq((-7, 92), (-5, 89), (-7, 96), (-13, 108),
        (-3, 46), (-1, 65), (-1, 57), (-9, 93),
        (-3, 74), (-9, 92), (-8, 87), (-23, 126),
        (5, 54), (6, 60), (6, 59), (6, 69),
        (-1, 48), (0, 68), (-4, 69), (-8, 88)),
      // 105..165: significant_coeff_flag (frame) — Table 9-19, idc 0
      105 -> Seq((-2, 85), (-6, 78), (-1, 75), (-7, 77),
        (2, 54), (5, 50), (-3, 68), (1, 50),
        (6, 42), (-4, 81), (1, 63), (-4, 70),
        (0, 67), (2, 57), (-2, 76), (11, 35),
        (4, 64), (1, 61), (11, 35), (18, 25),
        (12, 24), (13, 29), (13, 36), (-10, 93),
        (-7, 73), (-2, 73), (13, 46), (9, 49),
        (-7, 100), (9, 53), (2, 53), (5, 53),
        (-2, 61), (0, 56), (0, 56), (-13, 63),
        (-5, 60), (-1, 62), (4, 57), (-6, 69),
        (4, 57), (14, 39), (4, 51), (13, 68),
        (3, 64), (1, 61), (9, 63), (7, 50),
        (16, 39), (5, 44), (4, 52), (11, 48),
        (-5, 60), (-1, 59), (0, 59), (22, 33),
        (5, 44), (14, 43), (-1, 78), (0, 60), (9, 69)),
      // 166..226: last_significant_coeff_flag (frame) — Table 9-20, idc 0
      166 -> Seq((11, 28), (2, 40), (3, 44), (0, 49),
        (0, 46), (2, 44), (2, 51), (0, 47),
        (4, 39), (2, 62), (6, 46), (0, 54),
        (3, 54), (2, 58), (4, 63), (6, 51),
        (6, 57), (7, 53), (6, 52), (6, 55),
        (11, 45), (14, 36), (8, 53), (-1, 82),
        (7, 55), (-3, 78), (15, 46), (22, 31),
        (-1, 84), (25, 7), (30, -7), (28, 3),
        (28, 4), (32, 0), (34, -1), (30, 6),
        (30, 6), (32, 9), (31, 19), (26, 27),
        (26, 30), (37, 20), (28, 34), (17, 70),
        (1, 67), (5, 59), (9, 67), (16, 30),
        (18, 32), (18, 35), (22, 29), (24, 31),
        (23, 38), (18, 43), (20, 41), (11, 63),
        (9, 59), (9, 64), (-1, 94), (-2, 89), (-9, 108)),
      // 227..275: coeff_abs_level_minus1 — Table 9-21, idc 0
      227 -> Seq((-6, 76), (-2, 44), (0, 45), (0, 52),
        (-3, 64), (-2, 59), (-4, 70), (-4, 75),
        (-8, 82), (-17, 102), (-9, 77), (3, 24),
        (0, 42), (0, 48), (0, 55), (-6, 59),
        (-7, 71), (-12, 83), (-11, 87), (-30, 119),
        (1, 58), (-3, 29), (-1, 36), (1, 38),
        (2, 43), (-6, 55), (0, 58), (0, 64),
        (-3, 74), (-10, 90), (0, 70), (-4, 29),
        (5, 31), (7, 42), (1, 59), (-2, 58),
        (-3, 72), (-3, 81), (-11, 97), (0, 58),
        (8, 5), (10, 14), (14, 18), (13, 27),
        (2, 40), (0, 58), (-3, 70), (-6, 79), (-8, 85)))
    known.foreach { case (base, vals) =>
      vals.zipWithIndex.foreach { case (v, i) => t(base + i) = v }
    }
    t
  }

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** 9.3.1.1: initialize all context states/valMPS for SliceQPY from the
    * I column or (`pSlice`) the P cabac_init_idc-0 column.
    */
  private def initContexts(qp: Int, pSlice: Boolean): (Array[Int], Array[Int]) = {
    val tab = if (pSlice) initMNP else initMN
    val state = new Array[Int](276)
    val mps = new Array[Int](276)
    val q = clip3(0, 51, qp)
    var i = 0
    while (i < 276) {
      val (m, n) = tab(i)
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
  private[ops] final class ArithDecoder(r: BitReader, qp: Int,
      pSlice: Boolean = false) {
    private var range = 510
    private var offset = r.u(9).toInt
    require(offset < 510, "CABAC init: codIOffset must be < codIRange")
    private val (state, mps) = initContexts(qp, pSlice)

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

    /** UEGk suffix (9.3.2.4), bypass-coded, starting exponent `k0`
      * (k = 0 for coeff levels, k = 3 for mvd).
      */
    def egk(k0: Int): Int = {
      var k = k0; var v = 0
      while (bypass() == 1) {
        v += 1 << k; k += 1
        require(k <= 24, s"EG$k0 escape out of range (corrupt stream)")
      }
      while (k > 0) { k -= 1; v += bypass() << k }
      v
    }

    /** UEG0 suffix — the coeff-level escape. */
    def eg0(): Int = egk(0)
  }

  // ------------------------------------------------------ encoder engine ---

  /** 9.3.4 binary arithmetic encoder emitting into a [[BitWriter]] that is
    * byte-aligned at construction (after cabac_alignment_one_bit).
    */
  private[ops] final class ArithEncoder(w: BitWriter, qp: Int,
      pSlice: Boolean = false) {
    private var low = 0
    private var range = 510
    private var firstBit = true
    private var outstanding = 0
    private val (state, mps) = initContexts(qp, pSlice)

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

    def egk(k0: Int, value: Int): Unit = {
      var v = value; var k = k0
      while (v >= (1 << k)) { bypass(1); v -= 1 << k; k += 1 }
      bypass(0)
      while (k > 0) { k -= 1; bypass((v >> k) & 1) }
    }

    def eg0(value: Int): Unit = egk(0, value)
  }

  // -------------------------------------------------- ctx model (grids) ---

  /** Per-picture neighbor state shared by the encoder and decoder loops so
    * every ctxIdxInc derivation has exactly one implementation. (Shared-
    * derivation caveat as for the inter codec's mv predictor: a slip here
    * round-trips invisibly; only the context CHOICE is affected, never
    * decoded values of our own streams.)
    */
  private final class Model(mbsX: Int, mbsY: Int, interPic: Boolean = false) {
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

    // ----- inter (P-slice) syntax state: contexts depend only on these,
    // never on reconstructed motion or pixels, so the entropy layer is
    // fully self-contained (the picture loop lives in H264Inter)
    val skipFlag = Array.ofDim[Boolean](mbsY, mbsX)
    val absMvdX = Array.ofDim[Int](mbsY * 4, mbsX * 4) // |mvd| per 4x4 cell
    val absMvdY = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    val refIdxG = Array.ofDim[Int](mbsY * 4, mbsX * 4)

    /** mb_skip_flag ctxIdxInc (9.3.3.1.1.1): condTermFlagN = 1 iff the
      * neighbor MB is available and NOT itself skipped.
      */
    def skipInc(mbX: Int, mbY: Int): Int = {
      def c(x: Int, y: Int) = if (avail(x, y) && !skipFlag(y)(x)) 1 else 0
      c(mbX - 1, mbY) + c(mbX, mbY - 1)
    }

    /** ref_idx ctxIdxInc (9.3.3.1.1.6) for the partition at 4x4 origin
      * (gx, gy): condTermFlagN = 1 iff neighbor cell N exists and its
      * refIdx > 0 (skipped / unfilled cells hold 0). inc = A + 2·B.
      */
    def refIdxInc(gx: Int, gy: Int): Int = {
      def c(x: Int, y: Int) =
        if (x < 0 || y < 0 || x >= mbsX * 4 || refIdxG(y)(x) <= 0) 0 else 1
      c(gx - 1, gy) + 2 * c(gx, gy - 1)
    }

    /** mvd ctxIdxInc (9.3.3.1.1.7) for component `comp` (0 = x, 1 = y)
      * of the partition at (gx, gy): sum the neighbor cells' |mvd|,
      * threshold at 3 / 32.
      */
    def mvdInc(gx: Int, gy: Int, comp: Int): Int = {
      val grid = if (comp == 0) absMvdX else absMvdY
      def c(x: Int, y: Int) =
        if (x < 0 || y < 0 || x >= mbsX * 4) 0 else grid(y)(x)
      val sum = c(gx - 1, gy) + c(gx, gy - 1)
      if (sum < 3) 0 else if (sum <= 32) 1 else 2
    }

    /** Record a decoded/encoded partition's syntax state. */
    def noteRefIdx(gx: Int, gy: Int, w4: Int, h4: Int, refIdx: Int): Unit = {
      var j = 0
      while (j < h4) {
        var i = 0
        while (i < w4) { refIdxG(gy + j)(gx + i) = refIdx; i += 1 }
        j += 1
      }
    }
    def noteMvd(gx: Int, gy: Int, w4: Int, h4: Int, ax: Int, ay: Int): Unit = {
      var j = 0
      while (j < h4) {
        var i = 0
        while (i < w4) {
          absMvdX(gy + j)(gx + i) = ax; absMvdY(gy + j)(gx + i) = ay
          i += 1
        }
        j += 1
      }
    }
    def noteSkip(mbX: Int, mbY: Int): Unit = {
      skipFlag(mbY)(mbX) = true
      decoded(mbY)(mbX) = true
      prevQpDeltaNz = false // 9.3.3.1.1.5: a skipped MB resets the chain
    }

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
      // 9.3.3.1.1.9 out-of-picture rule: condTermFlagN = 1 when the
      // current MB is INTRA coded, 0 when inter (P pictures here hold
      // only inter MBs — intra-in-P rejects loudly)
      val edge = if (interPic) 0 else 1
      def c(x: Int, y: Int) =
        if (x < 0 || y < 0) edge else lumaCbf(y)(x)
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

  // ----------------------------------------------- P-slice entropy layer ---
  //
  // CABAC parsing is fully self-contained: every ctxIdxInc depends only
  // on SYNTAX-level neighbor state (skip flags, |mvd|, refIdx, cbp, cbf)
  // — never on reconstructed motion or pixels — so these two classes own
  // the entire entropy side while H264Inter keeps the picture loop
  // (prediction, MC, DPB, deblocking) it already shares with CAVLC.
  // Element geometry (partition origins) comes IN from that loop, so
  // Table 7-13 has exactly one implementation (H264Inter.partsOf).

  /** Decode-side P-slice syntax reader; `r` must be positioned right
    * after cabac_alignment_one_bit. Call order per MB (7.3.5/9.3.3):
    * skipFlag → [mbTypeP → refIdx* → mvd* → cbpLuma → qpDelta? →
    * lumaBlock*] → finishMb → endOfSlice.
    */
  private[ops] final class PSliceDecoder(r: BitReader, sliceQp: Int,
      mbsX: Int, mbsY: Int) {
    private val d = new ArithDecoder(r, sliceQp, pSlice = true)
    private val m = new Model(mbsX, mbsY, interPic = true)

    def skipFlag(mbX: Int, mbY: Int): Boolean = {
      val s = d.decision(11 + m.skipInc(mbX, mbY)) == 1
      if (s) m.noteSkip(mbX, mbY)
      s
    }

    /** P mb_type (9.3.2.5): bin0 = 1 is the intra prefix — rejected, as
      * in the CAVLC inter subset. Returns 0 (16x16), 1 (16x8), 2 (8x16)
      * or 3 (P_8x8 — sub_mb_types follow via [[subMbTypeP]]).
      */
    def mbTypeP(): Int = {
      require(d.decision(14) == 0,
        "cabac inter decoder: intra-in-P unsupported (MediaDecoder seam)")
      // Table 9-37 bin strings: '000'→16x16, '001'→P_8x8, '010'→8x16,
      // '011'→16x8 (bins at ctx 15 then 16/17; pinned bin-exactly by
      // the mbTypeP known-answer spec — a shared-tree slip here would
      // round-trip invisibly)
      if (d.decision(15) == 0) {
        if (d.decision(16) == 0) 0 else 3 // P_L0_16x16 : P_8x8
      } else {
        if (d.decision(17) == 1) 1 else 2 // P_L0_L0_16x8 : P_L0_L0_8x16
      }
    }

    /** P sub_mb_type (9.3.2.5, ctx 21..23): '1' → 8x8, '00' → 8x4,
      * '011' → 4x8, '010' → 4x4.
      */
    def subMbTypeP(): Int =
      if (d.decision(21) == 1) 0
      else if (d.decision(22) == 0) 1
      else if (d.decision(23) == 1) 2
      else 3

    /** ref_idx_l0 for the partition at 4x4 origin (gx, gy): unary over
      * ctx 54 + inc (bin0), 58 (bin1), 59 (bin ≥2) — 9.3.3.1.1.6.
      */
    def refIdx(gx: Int, gy: Int, w4: Int, h4: Int): Int = {
      var v = 0
      if (d.decision(54 + m.refIdxInc(gx, gy)) == 1) {
        v = 1
        while (v < 32 && d.decision(if (v == 1) 58 else 59) == 1) v += 1
        require(v < 32, "cabac inter decoder: ref_idx unary out of range")
      }
      m.noteRefIdx(gx, gy, w4, h4, v)
      v
    }

    /** mvd_l0 pair for the partition at (gx, gy): per component, UEG3
      * with uCoff 9 (9.3.2.3) over ctx base 40 (x) / 47 (y): bin0 at
      * base + inc(|mvd| neighbor sum), bins 1..3 at base+3..base+5,
      * bins ≥4 at base+6; EG3 bypass suffix past 9; bypass sign.
      */
    def mvd(gx: Int, gy: Int, w4: Int, h4: Int): (Int, Int) = {
      def comp(c: Int): Int = {
        val base = if (c == 0) 40 else 47
        if (d.decision(base + m.mvdInc(gx, gy, c)) == 0) 0
        else {
          var v = 1
          while (v < 9 && d.decision(base + 3 + math.min(v - 1, 3)) == 1)
            v += 1
          if (v == 9) v += d.egk(3)
          if (d.bypass() == 1) -v else v
        }
      }
      val x = comp(0)
      val y = comp(1)
      m.noteMvd(gx, gy, w4, h4, math.abs(x), math.abs(y))
      (x, y)
    }

    /** coded_block_pattern: 4 luma bins + the chroma prefix bin, which
      * must be 0 (the inter subset carries no chroma residual, matching
      * CAVLC — 8.4.2.3 chroma is motion-compensated only).
      */
    def cbpLuma(mbX: Int, mbY: Int): Int = {
      var cbp = 0
      var i = 0
      while (i < 4) {
        cbp |= d.decision(73 + m.cbpLumaInc(mbX, mbY, i, cbp)) << i
        i += 1
      }
      require(d.decision(77 + m.cbpChromaInc(mbX, mbY, 0)) == 0,
        "cabac inter decoder: chroma residual unsupported (cbpChroma must be 0)")
      cbp
    }

    def qpDelta(qpY: Int): Int = decodeQpDelta(d, m, qpY)
    def noQpDelta(): Unit = m.prevQpDeltaNz = false

    /** One coded luma 4x4 block (ctxBlockCat 2) at grid cell (gx, gy). */
    def lumaBlock(gx: Int, gy: Int): Array[Int] = {
      val (lv, cbf) = decodeResidual(d, 2, 16, m.cbfIncLuma(gx, gy))
      m.lumaCbf(gy)(gx) = cbf
      lv
    }

    def finishMb(mbX: Int, mbY: Int, cbp: Int): Unit = {
      m.cbpLuma(mbY)(mbX) = cbp
      m.decoded(mbY)(mbX) = true
    }

    /** end_of_slice_flag after each MB — true terminates the slice (the
      * picture loop checks coverage; a premature flag just ends THIS
      * slice, and a missing one underruns loudly).
      */
    def endOfSlice(): Boolean = d.terminate() == 1
  }

  /** Encode-side mirror of [[PSliceDecoder]] — same Model, same call
    * order, writing into a byte-aligned BitWriter.
    */
  private[ops] final class PSliceEncoder(w: BitWriter, sliceQp: Int,
      mbsX: Int, mbsY: Int) {
    private val e = new ArithEncoder(w, sliceQp, pSlice = true)
    private val m = new Model(mbsX, mbsY, interPic = true)

    def skipFlag(mbX: Int, mbY: Int, skip: Boolean): Unit = {
      e.decision(11 + m.skipInc(mbX, mbY), if (skip) 1 else 0)
      if (skip) m.noteSkip(mbX, mbY)
    }

    def mbTypeP(t: Int): Unit = {
      require(t >= 0 && t <= 3, s"cabac inter encoder: P mb_type $t")
      e.decision(14, 0) // Table 9-37 — see the decoder-side comment
      if (t == 0) { e.decision(15, 0); e.decision(16, 0) }
      else if (t == 3) { e.decision(15, 0); e.decision(16, 1) } // P_8x8
      else if (t == 1) { e.decision(15, 1); e.decision(17, 1) }
      else { e.decision(15, 1); e.decision(17, 0) } // P_L0_L0_8x16
    }

    def subMbTypeP(t: Int): Unit = t match {
      case 0 => e.decision(21, 1)
      case 1 => e.decision(21, 0); e.decision(22, 0)
      case 2 => e.decision(21, 0); e.decision(22, 1); e.decision(23, 1)
      case _ => e.decision(21, 0); e.decision(22, 1); e.decision(23, 0)
    }

    def refIdx(gx: Int, gy: Int, w4: Int, h4: Int, v: Int): Unit = {
      e.decision(54 + m.refIdxInc(gx, gy), if (v > 0) 1 else 0)
      var k = 1
      while (k <= v) {
        e.decision(if (k == 1) 58 else 59, if (k < v) 1 else 0)
        k += 1
      }
      m.noteRefIdx(gx, gy, w4, h4, v)
    }

    def mvd(gx: Int, gy: Int, w4: Int, h4: Int, x: Int, y: Int): Unit = {
      def comp(c: Int, v: Int): Unit = {
        val base = if (c == 0) 40 else 47
        val a = math.abs(v)
        e.decision(base + m.mvdInc(gx, gy, c), if (a > 0) 1 else 0)
        if (a > 0) {
          var k = 1
          while (k < math.min(a, 9)) {
            e.decision(base + 3 + math.min(k - 1, 3), 1)
            k += 1
          }
          if (a < 9) e.decision(base + 3 + math.min(a - 1, 3), 0)
          else e.egk(3, a - 9)
          e.bypass(if (v < 0) 1 else 0)
        }
      }
      comp(0, x)
      comp(1, y)
      m.noteMvd(gx, gy, w4, h4, math.abs(x), math.abs(y))
    }

    def cbpLuma(mbX: Int, mbY: Int, cbp: Int): Unit = {
      require(cbp >= 0 && cbp <= 15, s"bad cbpLuma $cbp")
      var partial = 0
      var i = 0
      while (i < 4) {
        val bit = (cbp >> i) & 1
        e.decision(73 + m.cbpLumaInc(mbX, mbY, i, partial), bit)
        partial |= bit << i
        i += 1
      }
      e.decision(77 + m.cbpChromaInc(mbX, mbY, 0), 0) // chroma cbp 0
    }

    def qpDelta(delta: Int): Unit = encodeQpDelta(e, m, delta)
    def noQpDelta(): Unit = m.prevQpDeltaNz = false

    def lumaBlock(gx: Int, gy: Int, levels: Array[Int]): Unit =
      m.lumaCbf(gy)(gx) =
        encodeResidual(e, 2, 16, m.cbfIncLuma(gx, gy), levels)

    def finishMb(mbX: Int, mbY: Int, cbp: Int): Unit = {
      m.cbpLuma(mbY)(mbX) = cbp
      m.decoded(mbY)(mbX) = true
    }

    def endOfSlice(last: Boolean): Unit =
      e.terminate(if (last) 1 else 0)
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
      encodeISliceMbs(w, qp, mbsX, mbsY, mbs)
      H264.writeNal(out, 3, 5, w.toBytes)
    }
    out.toByteArray
  }

  /** Encode one CABAC I slice's macroblock layer into `w` (which must be
    * byte-aligned — after cabac_alignment_one_bit), including the final
    * flush + rbsp alignment — shared by [[encodeIntra]] and the inter
    * encoder's I pictures in CABAC streams.
    */
  private[ops] def encodeISliceMbs(w: BitWriter, qp: Int, mbsX: Int,
      mbsY: Int, mbs: Seq[H264Cavlc.MbPlan]): Unit = {
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
      val luma = Array.ofDim[Int](mbsY * 16, mbsX * 16)
      val cb = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val cr = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val info = if (filterOn) new H264Deblock.PicInfo(mbsX, mbsY) else null
      decodeISliceMbs(r, sliceQp, mbsX, mbsY, chromaOff, luma, cb, cr, info)
      if (filterOn) H264Deblock.filter(luma, cb, cr, info, offA, offB, chromaOff)
      luma
    }
  }

  /** Decode one CABAC I slice's macroblock layer (`r` positioned just
    * after cabac_alignment_one_bit) into the caller's planes — shared by
    * [[decodeIntraFrames]] and the inter decoder's I pictures in CABAC
    * streams ([[H264Inter]] owns the picture loop and the DPB there).
    */
  private[ops] def decodeISliceMbs(r: BitReader, sliceQp: Int, mbsX: Int,
      mbsY: Int, chromaOff: Int, luma: Array[Array[Int]],
      cb: Array[Array[Int]], cr: Array[Array[Int]],
      info: H264Deblock.PicInfo): Unit = {
    val d = new ArithDecoder(r, sliceQp)
    val model = new Model(mbsX, mbsY)
    var qpY = sliceQp
    locally {
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
