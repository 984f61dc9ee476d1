package graft.ops

import H264.{BitReader, BitWriter}

/** Pure-JVM H.264 baseline **P-slice (inter) codec** — temporal prediction
  * behind the [[H264]] bitstream layer and the [[H264Cavlc]] residual
  * machinery. With this module the engine natively decodes P slices
  * containing P_L0_16x16 and P_Skip macroblocks: motion-compensated
  * prediction from a reference picture at QUARTER-sample luma accuracy
  * (the 6-tap Wiener half-sample filter + quarter averaging of 8.4.2.2)
  * and eighth-sample bilinear chroma, with CAVLC inter residuals on top.
  *
  * What is implemented, per the public spec (ITU-T Rec. H.264, clauses
  * cited inline):
  *  - P slice headers (7.3.3): num_ref_idx override, ref_pic_list
  *    modification flag, dec_ref_pic_marking for non-IDR reference
  *    slices, frame_num progression;
  *  - P slice data (7.3.4): mb_skip_run before every coded macroblock
  *    and as slice tail;
  *  - macroblock layer (7.3.5): P mb_types (Table 7-13 — P_L0_16x16
  *    implemented; sub-partitioned types rejected loudly), mvd_l0,
  *    the me(v) coded_block_pattern INTER mapping (Table 9-4), and the
  *    CAVLC luma residual via [[H264Cavlc]]'s oracle-proven tables;
  *  - luma motion vector prediction (8.4.1.3): A/B/C neighbor
  *    derivation with the C→D substitution, the B/C/D-unavailable
  *    directional rule, the exactly-one-matching-refIdx rule, and the
  *    component-wise median; P_Skip motion inference (8.4.1.1) with the
  *    zero-mv conditions on A/B;
  *  - fractional-sample interpolation (8.4.2.2): unrounded 6-tap
  *    (1,−5,20,20,−5,1) horizontal/vertical half samples, the two-stage
  *    center sample j with its single (+512)>>10 rounding, all twelve
  *    quarter-sample averages, edge clamping of integer sample
  *    coordinates, and bilinear eighth-sample chroma;
  *  - reference handling: a real multi-picture DPB (8.2.4.2.1 list0 in
  *    descending PicNum = newest-decoded first, 8.2.5.3 sliding-window
  *    trimming to the SPS max_num_ref_frames), per-slice
  *    num_ref_idx_active override, per-MB ref_idx_l0 as te(v), and the
  *    8.4.1.3.2 equal-refIdx neighbor-match rule in the mv predictor —
  *    so P pictures can reference any retained picture, not just the
  *    previous one (q240).
  *
  * Subset boundary, stated plainly (same honesty contract as [[H264]] and
  * [[H264Cavlc]]): I pictures decode through the FULL shared intra surface
  * ([[H264Cavlc.decodeISliceMbs]] — I_PCM, Intra_4x4, Intra_16x16 CAVLC)
  * and serve as references, so real compressed-intra + P chains decode
  * natively (q237). Round 13 added a real multi-picture DPB (q240),
  * B slices with L0/L1/Bi 16x16 prediction (q241 — RefPicList1 via the
  * 8.2.4.2.3 first-two swap, default 8.4.2.3.1 bi averaging), explicit
  * P-slice weighted prediction (q242), and 16x8/8x16 partitions with
  * 4x4-granular motion state (q243). Round 14 closed the P surface:
  * CABAC P slices ([[H264Cabac.PSliceDecoder]], q244), P_8x8
  * sub-partitions down to 4x4 (q245), explicit short-term ref-list
  * modification with PicNum wrap (q246), and multi-slice P pictures
  * with slice-scoped neighbor state + real idc-2 boundary exclusion
  * (q247). What still exits through the external `MediaDecoder` seam:
  * CABAC B slices, direct-mode B macroblocks (B_Skip / B_Direct),
  * weighted BIprediction, long-term references / MMCO, B-slice list
  * modification, P_8x8ref0, multi-slice I/B pictures, and deblocking
  * across B pictures — all rejected loudly, never
  * mis-decoded. The inter CBP column of Table 9-4
  * is transcribed from the published standard; the oracle (q236) exercises
  * cbp ∈ {0, 1} and the permutation spec guards gross transcription slips
  * — the residual entry points are the q235-proven ones.
  *
  * The reference repo has no video surface (SURVEY.md §2.11); built from
  * the public spec alone.
  */
object H264Inter {

  // ------------------------------------------------------ inter CBP table ---

  /** Table 9-4 me(v) mapping, INTER column (ChromaArrayType 1): codeNum →
    * coded_block_pattern. The intra column lives in [[H264Cavlc]].
    */
  private[ops] val cbpInter: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)

  private val cbpInterInv: Map[Int, Int] =
    cbpInter.zipWithIndex.map { case (cbp, code) => cbp -> code }.toMap

  // ------------------------------------------------- fractional-sample MC ---

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Integer-sample fetch with the 8.4.2.2.1 coordinate clamp (frame-edge
    * samples repeat outward).
    */
  private def at(p: Array[Array[Int]], x: Int, y: Int): Int = {
    val yy = if (y < 0) 0 else if (y >= p.length) p.length - 1 else y
    val row = p(yy)
    val xx = if (x < 0) 0 else if (x >= row.length) row.length - 1 else x
    row(xx)
  }

  private def tap6(a: Int, b: Int, c: Int, d: Int, e: Int, f: Int): Int =
    a - 5 * b + 20 * c + 20 * d - 5 * e + f

  /** Quarter-sample luma prediction at integer base (x, y) plus fractional
    * offset (fx, fy) ∈ [0,3]² (8.4.2.2.1/8.4.2.2.2). The half samples b/h/
    * m/s round once with (+16)>>5; the center j keeps the horizontal sums
    * UNROUNDED and rounds once with (+512)>>10; quarter samples average
    * two neighbors with (+1)>>1. Every intermediate is clipped to [0,255]
    * before averaging, exactly as the spec's Clip1 placements demand.
    */
  private[ops] def lumaInterp(ref: Array[Array[Int]], x: Int, y: Int,
      fx: Int, fy: Int): Int = {
    if (fx == 0 && fy == 0) return at(ref, x, y)
    // unrounded horizontal 6-tap at (x+0.5, v)
    def hSum(v: Int): Int = tap6(at(ref, x - 2, v), at(ref, x - 1, v),
      at(ref, x, v), at(ref, x + 1, v), at(ref, x + 2, v), at(ref, x + 3, v))
    // unrounded vertical 6-tap at (u, y+0.5)
    def vSum(u: Int): Int = tap6(at(ref, u, y - 2), at(ref, u, y - 1),
      at(ref, u, y), at(ref, u, y + 1), at(ref, u, y + 2), at(ref, u, y + 3))
    lazy val b = clip255((hSum(y) + 16) >> 5)          // half H at (x+½, y)
    lazy val h = clip255((vSum(x) + 16) >> 5)          // half V at (x, y+½)
    lazy val m = clip255((vSum(x + 1) + 16) >> 5)      // half V at (x+1, y+½)
    lazy val s = clip255((hSum(y + 1) + 16) >> 5)      // half H at (x+½, y+1)
    lazy val j = {                                     // center (x+½, y+½)
      val jj = tap6(hSum(y - 2), hSum(y - 1), hSum(y),
        hSum(y + 1), hSum(y + 2), hSum(y + 3))
      clip255((jj + 512) >> 10)
    }
    def avg(p: Int, q: Int): Int = (p + q + 1) >> 1
    (fx, fy) match {
      case (1, 0) => avg(at(ref, x, y), b)             // a
      case (2, 0) => b
      case (3, 0) => avg(b, at(ref, x + 1, y))         // c
      case (0, 1) => avg(at(ref, x, y), h)             // d
      case (0, 2) => h
      case (0, 3) => avg(h, at(ref, x, y + 1))         // n
      case (1, 1) => avg(b, h)                         // e
      case (2, 1) => avg(b, j)                         // f
      case (3, 1) => avg(b, m)                         // g
      case (1, 2) => avg(h, j)                         // i
      case (2, 2) => j
      case (3, 2) => avg(j, m)                         // k
      case (1, 3) => avg(h, s)                         // p
      case (2, 3) => avg(j, s)                         // q
      case (3, 3) => avg(m, s)                         // r
      case other => throw new IllegalArgumentException(s"bad frac $other")
    }
  }

  /** Eighth-sample bilinear chroma prediction (8.4.2.2.2 eq. 8-266): the
    * quarter-luma mv applies unscaled as an eighth-chroma offset.
    */
  private[ops] def chromaInterp(ref: Array[Array[Int]], x: Int, y: Int,
      fx: Int, fy: Int): Int = {
    val a = at(ref, x, y); val b = at(ref, x + 1, y)
    val c = at(ref, x, y + 1); val d = at(ref, x + 1, y + 1)
    ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b +
      (8 - fx) * fy * c + fx * fy * d + 32) >> 6
  }

  // --------------------------------------------------- MV prediction (8.4.1) ---

  /** Per-4x4-cell motion state within the current picture (6.4.11.7
    * neighbor lookups are 4x4-granular once sub-MB partitions exist).
    * `filled` marks cells whose partition has DECODED — in this P/B
    * subset every decoded macroblock is inter, so filled ⇔ available
    * inter neighbor; an unfilled in-picture cell (a later MB, or the
    * later partition of the current MB) is address-unavailable, exactly
    * like an out-of-picture one.
    */
  private final class MvGrid(mbsX: Int, mbsY: Int,
      sharedDecoded: Array[Array[Boolean]] = null) {
    /** ADDRESS availability (6.4.11.7): the cell's partition has DECODED,
      * regardless of whether it predicted from THIS grid's list. B slices
      * share ONE decoded grid between the two list grids, so a neighbor
      * MB that used only the other list (e.g. a B_L1 MB during an L0
      * prediction) stays address-AVAILABLE — 8.4.1.3.2 gives it
      * refIdxLX −1 / mvLX (0,0) via predFlagLX = 0, it does NOT become
      * unavailable (which would wrongly trigger the C→D substitution and
      * the all-unavailable→mvA early-out). P slices pass no shared grid:
      * every decoded P MB fills list 0, so decoded ⇔ filled there.
      */
    val decoded: Array[Array[Boolean]] =
      if (sharedDecoded != null) sharedDecoded
      else Array.fill(mbsY * 4, mbsX * 4)(false)
    /** predFlagLX per cell: the partition predicted from THIS list. */
    val filled = Array.fill(mbsY * 4, mbsX * 4)(false)
    val mvx = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    val mvy = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    val ref = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    /** Fill a partition's cells: origin (gx, gy), size (w4, h4), in 4x4
      * units. */
    def fill(gx: Int, gy: Int, w4: Int, h4: Int,
        x: Int, y: Int, refIdx: Int): Unit = {
      var j = 0
      while (j < h4) {
        var i = 0
        while (i < w4) {
          decoded(gy + j)(gx + i) = true
          filled(gy + j)(gx + i) = true
          mvx(gy + j)(gx + i) = x; mvy(gy + j)(gx + i) = y
          ref(gy + j)(gx + i) = refIdx
          i += 1
        }
        j += 1
      }
    }
    /** Whole-MB convenience (16x16 partitions). */
    def set(mbX: Int, mbY: Int, x: Int, y: Int, refIdx: Int): Unit =
      fill(mbX * 4, mbY * 4, 4, 4, x, y, refIdx)
  }

  /** Partition shapes for [[mvPred]]'s 8.4.1.3 directional special
    * cases: 0 = 16x16 (no special case), 1/2 = 16x8 top/bottom, 3/4 =
    * 8x16 left/right.
    */
  private final val Part16x16 = 0
  private final val Part16x8Top = 1
  private final val Part16x8Bottom = 2
  private final val Part8x16Left = 3
  private final val Part8x16Right = 4

  /** Luma MV predictor (8.4.1.3) for the partition at 4x4-grid origin
    * (gx, gy) with width `w4` cells: neighbors A (left of the origin),
    * B (above the origin), C (above-right of the partition, D above-left
    * substituted when C's address is unavailable), all 4x4-granular
    * (6.4.11.7). The 16x8/8x16 DIRECTIONAL special cases fire first
    * (top→B, bottom→A, left→A, right→C, each only on a refIdx match);
    * otherwise: if B, C and D addresses are all unavailable and A's is
    * available the prediction is mvA; else if exactly one neighbor
    * references the SAME picture its mv is the predictor; else the
    * component-wise median.
    */
  private def mvPred(g: MvGrid, gx: Int, gy: Int, w4: Int, mbsX: Int,
      refIdx: Int, part: Int): (Int, Int) = {
    // (addrAvailable, ref-matched, mvx, mvy) per 8.4.1.3.2: a DECODED
    // cell whose partition didn't predict from this list (predFlagLX = 0,
    // B slices only) is address-available with refIdx −1 / mv (0,0)
    def nb(x: Int, y: Int): (Boolean, Boolean, Int, Int) =
      if (x < 0 || y < 0 || x >= mbsX * 4 || !g.decoded(y)(x)) (false, false, 0, 0)
      else if (!g.filled(y)(x)) (true, false, 0, 0)
      else (true, g.ref(y)(x) == refIdx, g.mvx(y)(x), g.mvy(y)(x))
    val a = nb(gx - 1, gy)
    val b = nb(gx, gy - 1)
    val cAddrOk = gy > 0 && gx + w4 < mbsX * 4 && g.decoded(gy - 1)(gx + w4)
    val dAddrOk = gy > 0 && gx > 0
    val cPos =
      if (cAddrOk) Some((gx + w4, gy - 1))
      else if (dAddrOk) Some((gx - 1, gy - 1))
      else None
    val c = cPos.map { case (x, y) => nb(x, y) }.getOrElse((false, false, 0, 0))
    // 8.4.1.3 clause 2: the non-square partitions take a DIRECTIONAL
    // predictor when the named neighbor references the same picture
    val special = part match {
      case Part16x8Top => b
      case Part16x8Bottom | Part8x16Left => a
      case Part8x16Right => c
      case _ => (false, false, 0, 0)
    }
    if (part != Part16x16 && special._2) return (special._3, special._4)
    // directional early-out (8.4.1.3.2 final substitution): B, C and D all
    // unavailable makes both B and C inherit A entirely
    val (bb, cc) = if (!b._1 && cPos.isEmpty && a._1) (a, a) else (b, c)
    val matches = Seq(a, bb, cc).filter(_._2)
    if (matches.length == 1) (matches.head._3, matches.head._4)
    else {
      def med(x: Int, y: Int, z: Int): Int =
        x + y + z - math.min(x, math.min(y, z)) - math.max(x, math.max(y, z))
      (med(a._3, bb._3, cc._3), med(a._4, bb._4, cc._4))
    }
  }

  /** 16x16 form. */
  private def mvPred(g: MvGrid, mbX: Int, mbY: Int, mbsX: Int,
      refIdx: Int): (Int, Int) =
    mvPred(g, mbX * 4, mbY * 4, 4, mbsX, refIdx, Part16x16)

  /** Partition layout of P mb_type 0/1/2 (Table 7-13): (gx, gy, w4, h4,
    * shape) in 4x4-cell units, decode order.
    */
  private def partsOf(mbType: Int, mbX: Int, mbY: Int)
      : Seq[(Int, Int, Int, Int, Int)] = mbType match {
    case 0 => Seq((mbX * 4, mbY * 4, 4, 4, Part16x16))
    case 1 => Seq((mbX * 4, mbY * 4, 4, 2, Part16x8Top),
      (mbX * 4, mbY * 4 + 2, 4, 2, Part16x8Bottom))
    case _ => Seq((mbX * 4, mbY * 4, 2, 4, Part8x16Left),
      (mbX * 4 + 2, mbY * 4, 2, 4, Part8x16Right))
  }

  /** RefPicList1 index → DPB index (8.2.4.2.3): with every retained
    * reference in the past and pic_order_cnt_type 2, the initial list1
    * equals list0, so its first two entries are swapped whenever the
    * FULL list holds more than one picture (truncation to
    * num_ref_idx_active happens after the swap).
    */
  private[ops] def l1ToDpb(idx: Int, dpbLen: Int): Int =
    if (dpbLen > 1) (if (idx == 0) 1 else if (idx == 1) 0 else idx) else idx

  /** P_Skip motion inference (8.4.1.1): zero mv when A or B is address-
    * unavailable or either is an inter MB referencing picture 0 with a
    * zero vector; otherwise the 16x16 predictor (for refIdx 0 — P_Skip
    * always references list0 picture 0).
    */
  private def skipMv(g: MvGrid, mbX: Int, mbY: Int, mbsX: Int): (Int, Int) = {
    def zeroRef(x: Int, y: Int): Boolean = // the MB's 4x4 neighbor cell
      g.filled(y)(x) && g.ref(y)(x) == 0 &&
        g.mvx(y)(x) == 0 && g.mvy(y)(x) == 0
    // availability is SLICE-scoped (6.4.8): a neighbor MB in a previous
    // slice has decoded=false in this slice's fresh grid — 8.4.1.1 then
    // forces the zero vector exactly like a picture edge
    val aUnavail = mbX == 0 || !g.decoded(mbY * 4)(mbX * 4 - 1)
    val bUnavail = mbY == 0 || !g.decoded(mbY * 4 - 1)(mbX * 4)
    if (aUnavail || bUnavail || zeroRef(mbX * 4 - 1, mbY * 4) ||
      zeroRef(mbX * 4, mbY * 4 - 1))
      (0, 0)
    else mvPred(g, mbX, mbY, mbsX, 0)
  }

  // -------------------------------------------------------- planted plans ---

  /** A planted P-slice macroblock. Levels are QUANTIZED zigzag coefficients
    * (the values CAVLC carries), as in [[H264Cavlc.MbPlan]].
    */
  sealed trait PMbPlan
  /** Skipped macroblock: motion inferred per 8.4.1.1, no residual. */
  case object PSkip extends PMbPlan
  /** P_L0_16x16 with an ABSOLUTE quarter-sample mv (the encoder derives
    * mvd against the 8.4.1.3 predictor); optional luma residual: `cbpLuma`
    * is the 4-bit per-8x8 pattern, `levels` 16 per-4x4 zigzag level arrays
    * (chroma CBP stays 0 — chroma is motion-compensated only). `refIdx`
    * selects the L0 reference picture (0 = the previously decoded
    * reference, 1 = the one before, … — 8.2.4.2.1 descending-PicNum
    * order); the encoder sizes num_ref_idx_active and the SPS DPB bound
    * from the largest index planted.
    */
  final case class P16x16(mvx: Int, mvy: Int, cbpLuma: Int = 0,
      levels: Array[Array[Int]] = null, qpDelta: Int = 0,
      refIdx: Int = 0) extends PMbPlan

  /** P_L0_L0_16x8 (mb_type 1, `wide = true`: top/bottom halves) or
    * P_L0_L0_8x16 (mb_type 2, `wide = false`: left/right halves): two L0
    * partitions in decode order, each with its own ABSOLUTE quarter-pel
    * mv and reference index — the second partition's mv predictor sees
    * the first's decoded motion (4x4-granular 6.4.11.7 neighbors) plus
    * the 8.4.1.3 directional special cases. Residual semantics match
    * [[P16x16]] (per-MB CBP over the partition-composed prediction).
    */
  final case class PPart(wide: Boolean,
      mv0x: Int, mv0y: Int, ref0: Int,
      mv1x: Int, mv1y: Int, ref1: Int,
      cbpLuma: Int = 0, levels: Array[Array[Int]] = null,
      qpDelta: Int = 0) extends PMbPlan

  /** One 8x8 sub-macroblock of [[P8x8]]: `subType` per Table 7-17
    * (0 = P_L0_8x8, 1 = P_L0_8x4 top/bottom, 2 = P_L0_4x8 left/right,
    * 3 = P_L0_4x4 raster order), ONE list-0 reference index shared by
    * its sub-partitions (7.3.5.1 reads ref_idx per 8x8), and ABSOLUTE
    * quarter-pel mvs, one per sub-partition in decode order.
    */
  final case class Sub8x8(subType: Int, refIdx: Int,
      mvs: Seq[(Int, Int)]) {
    require(subType >= 0 && subType <= 3, s"sub_mb_type $subType")
    require(mvs.length == Array(1, 2, 2, 4)(subType),
      s"sub_mb_type $subType needs ${Array(1, 2, 2, 4)(subType)} mvs")
  }

  /** P_8x8 (Table 7-13 mb_type 3): four 8x8 sub-macroblocks in raster
    * order, each independently sub-partitioned down to 4x4 — the last
    * baseline-profile inter geometry. Sub-partition mv predictors use
    * the GENERAL 8.4.1.3 rule (the 16x8/8x16 directional special cases
    * do not apply below 8x8), over the same 4x4-granular neighbor grid.
    * Residual semantics match [[P16x16]] (per-MB CBP over the composed
    * prediction, chroma CBP 0).
    */
  final case class P8x8(subs: Seq[Sub8x8], cbpLuma: Int = 0,
      levels: Array[Array[Int]] = null, qpDelta: Int = 0) extends PMbPlan {
    require(subs.length == 4, "P_8x8 needs exactly four sub-macroblocks")
  }

  /** Publish a decoded MB's 16 nC cells as AVAILABLE-with-0 where still
    * unavailable — skipped MBs and uncoded blocks carry total_coeff 0
    * (9.2.1) over the −1-sentinel grids multi-slice P pictures use
    * (prior-slice cells stay −1 = unavailable; single-slice pictures see
    * identical nC values either way).
    */
  private def fillNctxZero(nctx: Array[Array[Int]], mbX: Int, mbY: Int): Unit = {
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 4) {
        if (nctx(mbY * 4 + by)(mbX * 4 + bx) < 0)
          nctx(mbY * 4 + by)(mbX * 4 + bx) = 0
        bx += 1
      }
      by += 1
    }
  }

  /** Pre-publish the nC cells of cbp-UNCODED 8x8s of a coded MB as
    * available-with-0 BEFORE any residual block of that MB is decoded or
    * encoded: 9.2.1 infers TotalCoeff 0 for blocks of the current
    * (available) MB whose 8x8 carries no coded coefficients, so a coded
    * 4x4 whose left/up neighbor sits in an uncoded 8x8 of the SAME MB
    * must see nN = 0, not unavailable (ffmpeg likewise zeroes these
    * inside the MB loop). Clearing only AFTER the whole MB (the round-14
    * behavior) made e.g. up tc=4 + same-MB uncoded left yield nC=4
    * instead of (4+0+1)>>1=2, selecting the wrong coeff_token table on
    * conformant external streams with partial luma CBP.
    */
  private def fillUncodedNctxZero(nctx: Array[Array[Int]], mbX: Int,
      mbY: Int, cbpLuma: Int): Unit = {
    var b = 0
    while (b < 16) {
      if ((cbpLuma & (1 << (b / 4))) == 0) {
        val (bx, by) = H264Cavlc.blk4x4(b)
        nctx(mbY * 4 + by)(mbX * 4 + bx) = 0
      }
      b += 1
    }
  }

  /** Sub-partition layout of sub_mb_type (Table 7-17) within the 8x8 at
    * 4x4-cell origin (cx, cy): (gx, gy, w4, h4) in decode order.
    */
  private def subPartsOf(subType: Int, cx: Int, cy: Int)
      : Seq[(Int, Int, Int, Int)] = subType match {
    case 0 => Seq((cx, cy, 2, 2))
    case 1 => Seq((cx, cy, 2, 1), (cx, cy + 1, 2, 1))
    case 2 => Seq((cx, cy, 1, 2), (cx + 1, cy, 1, 2))
    case _ => Seq((cx, cy, 1, 1), (cx + 1, cy, 1, 1),
      (cx, cy + 1, 1, 1), (cx + 1, cy + 1, 1, 1))
  }

  /** B_{L0,L1,Bi}_16x16 (Table 7-14 mb_type 1..3; `mode` 0/1/2). A frame
    * containing any [[B16x16]] is emitted as a B SLICE — a non-reference
    * NAL that never enters the DPB — and must consist solely of B16x16
    * macroblocks (B_Skip / B_Direct_16x16 are direct-mode, outside the
    * subset). `ref0` indexes RefPicList0 (newest decoded reference
    * first); `ref1` indexes RefPicList1, which per 8.2.4.2.3 — with every
    * retained reference in the PAST and pic_order_cnt_type 2 — is
    * RefPicList0 with its first two entries SWAPPED whenever it holds
    * more than one picture. Bi prediction is the default 8.4.2.3.1
    * average (predL0 + predL1 + 1) >> 1, luma and chroma alike (no
    * weighted prediction). Residual semantics match [[P16x16]].
    */
  final case class B16x16(mode: Int,
      mv0x: Int = 0, mv0y: Int = 0, ref0: Int = 0,
      mv1x: Int = 0, mv1y: Int = 0, ref1: Int = 0,
      cbpLuma: Int = 0, levels: Array[Array[Int]] = null,
      qpDelta: Int = 0) extends PMbPlan {
    require(mode >= 0 && mode <= 2, s"B16x16 mode $mode (0=L0,1=L1,2=Bi)")
    def usesL0: Boolean = mode != 1
    def usesL1: Boolean = mode != 0
  }

  /** Explicit P-slice prediction weights (7.3.3.2): `luma(i)` is the
    * (weight, offset) pair for L0 index i — None/absent = the default
    * identity weight 2^denom with offset 0 — under shared log2
    * denominators; `chroma(i)` holds ((wCb, oCb), (wCr, oCr)).
    */
  final case class PredWeights(lumaLog2Denom: Int,
      luma: Seq[Option[(Int, Int)]] = Nil,
      chromaLog2Denom: Int = 0,
      chroma: Seq[Option[((Int, Int), (Int, Int))]] = Nil) {
    require(lumaLog2Denom >= 0 && lumaLog2Denom <= 7 &&
      chromaLog2Denom >= 0 && chromaLog2Denom <= 7, "log2 denom outside [0,7]")
  }

  /** Parsed weight table: per-L0-index luma/chroma (w, o). */
  private final class Wp(val logL: Int, val lw: Array[Int], val lo: Array[Int],
      val logC: Int, val cw: Array[Array[Int]], val co: Array[Array[Int]])

  /** 8.4.2.3.2 explicit single-list weighting of one predicted sample:
    * Clip1(((pred·w + 2^(logWD−1)) >> logWD) + o), the shift skipped at
    * logWD 0.
    */
  private def weight1(v: Int, logWD: Int, w: Int, o: Int): Int = {
    val t =
      if (logWD >= 1) ((v * w + (1 << (logWD - 1))) >> logWD) + o
      else v * w + o
    if (t < 0) 0 else if (t > 255) 255 else t
  }

  private def parseWp(r: BitReader, numActive: Int): Wp = {
    val logL = r.ue()
    val logC = r.ue()
    require(logL <= 7 && logC <= 7,
      s"inter decoder: weight denominators $logL/$logC outside [0,7]")
    val lw = Array.fill(numActive)(1 << logL)
    val lo = new Array[Int](numActive)
    val cw = Array.fill(2, numActive)(1 << logC)
    val co = Array.ofDim[Int](2, numActive)
    def inRange(v: Int): Int = {
      require(v >= -128 && v <= 127, s"weight/offset $v outside [-128,127]")
      v
    }
    var i = 0
    while (i < numActive) {
      if (r.u(1) == 1) { lw(i) = inRange(r.se()); lo(i) = inRange(r.se()) }
      if (r.u(1) == 1) {
        var j = 0
        while (j < 2) {
          cw(j)(i) = inRange(r.se()); co(j)(i) = inRange(r.se())
          j += 1
        }
      }
      i += 1
    }
    new Wp(logL, lw, lo, logC, cw, co)
  }

  // ------------------------------------------------------------- encoder ---

  /** Encode an IDR all-I_PCM reference picture from a raw luma plane
    * (mbsY·16 rows × mbsX·16 cols, flat `chromaFill` chroma) followed by
    * planted P pictures — convenience over the [[H264Cavlc.MbPlan]] entry.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      pcmLuma: Array[Array[Int]], pFrames: Seq[Seq[PMbPlan]],
      chromaFill: Int = 128): Array[Byte] = {
    require(pcmLuma.length == mbsY * 16 && pcmLuma.forall(_.length == mbsX * 16),
      "reference plane must match the MB grid")
    val iMbs = (0 until mbsX * mbsY).map { mb =>
      val x0 = (mb % mbsX) * 16; val y0 = (mb / mbsX) * 16
      H264Cavlc.PcmBlock(
        Array.tabulate(16, 16)((y, x) => pcmLuma(y0 + y)(x0 + x)), chromaFill)
    }
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames)
  }

  /** Filter-off form (the historical default; overloads cannot share
    * default arguments).
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]]): Array[Byte] =
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames, 1, 0, 0)

  /** Per-MB qp deltas are planted by the caller; see
    * [[H264Cavlc.qpRestoreDelta]] for the I_PCM chain rule. `deblockIdc`
    * is the slice disable_deblocking_filter_idc (1 = filter off; 0/2 =
    * on with the div2 offsets).
    */

  /** Encode an IDR I picture of arbitrary planted intra macroblocks
    * ([[H264Cavlc.MbPlan]] — I_PCM, Intra_4x4, Intra_16x16) followed by
    * planted P pictures into a conformant Annex-B stream: SPS
    * (max_num_ref_frames 1) + PPS + IDR + one P slice per frame. The P
    * pictures motion-compensate from the DECODED intra picture, so the
    * reference may be real compressed intra content, not just PCM.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]],
      deblockIdc: Int, aOffD2: Int, bOffD2: Int): Array[Byte] =
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames, deblockIdc, aOffD2, bOffD2, Nil)

  /** Weighted form: `weights(k)` is frame k's explicit P weight table
    * (7.3.3.2). Any Some entry turns the PPS weighted_pred_flag on, after
    * which EVERY P slice carries a table (None frames emit the identity:
    * zero denominators, all per-index flags 0). B frames must stay None —
    * weighted biprediction (weighted_bipred_idc) is outside the subset.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]],
      deblockIdc: Int, aOffD2: Int, bOffD2: Int,
      weights: Seq[Option[PredWeights]]): Array[Byte] =
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames, deblockIdc, aOffD2, bOffD2,
      weights, cabac = false)

  /** Entropy-selectable form: `cabac = true` emits the same planted
    * pictures as a CABAC stream (PPS entropy_coding_mode_flag 1, I
    * pictures through [[H264Cabac.encodeISliceMbs]], P pictures through
    * [[H264Cabac.PSliceEncoder]]); B slices and I_PCM plans reject.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]],
      deblockIdc: Int, aOffD2: Int, bOffD2: Int,
      weights: Seq[Option[PredWeights]],
      cabac: Boolean): Array[Byte] =
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames, deblockIdc, aOffD2, bOffD2,
      weights, cabac, Nil)

  /** Reorder-capable form: `reorders(k)` is P frame k's explicit
    * RefPicList0 as DPB indices (0 = newest decoded reference), emitted
    * as 7.3.3.1 short-term modification ops; the frame's planted refIdx
    * values then select positions in THAT list. `numActive` becomes the
    * reorder's length. B frames must stay None.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]],
      deblockIdc: Int, aOffD2: Int, bOffD2: Int,
      weights: Seq[Option[PredWeights]],
      cabac: Boolean, reorders: Seq[Option[Seq[Int]]]): Array[Byte] =
    encodeStream(mbsX, mbsY, qp, iMbs, pFrames, deblockIdc, aOffD2, bOffD2,
      weights, cabac, reorders, Nil)

  /** Multi-slice form: `sliceSplits(k)` lists P frame k's slice start
    * addresses (ascending, first 0; empty/absent = one slice). Every
    * slice of a picture shares frame_num and deblocking signalling but
    * gets FRESH neighbor state (slice independence, 6.4.8); with
    * deblockIdc 2 the loop filter skips the resulting slice-boundary
    * edges. B frames must stay single-slice.
    */
  def encodeStream(mbsX: Int, mbsY: Int, qp: Int,
      iMbs: Seq[H264Cavlc.MbPlan], pFrames: Seq[Seq[PMbPlan]],
      deblockIdc: Int, aOffD2: Int, bOffD2: Int,
      weights: Seq[Option[PredWeights]],
      cabac: Boolean, reorders: Seq[Option[Seq[Int]]],
      sliceSplits: Seq[Seq[Int]]): Array[Byte] = {
    require(qp >= 12 && qp <= 51, s"planted-stream QP $qp outside [12,51]")
    val wpOn = weights.exists(_.isDefined)
    if (weights.nonEmpty)
      require(weights.length == pFrames.length,
        "weights must align with pFrames when provided")
    if (cabac) {
      require(pFrames.forall(_.forall(!_.isInstanceOf[B16x16])),
        "CABAC B slices are outside the subset (MediaDecoder seam)")
      require(!iMbs.exists(p => p.isInstanceOf[H264Cavlc.PcmBlock] ||
        p.isInstanceOf[H264Cavlc.Pcm]),
        "CABAC I_PCM plans unsupported (engine re-init) — use " +
          "I16x16/I4x4 reference plans in CABAC streams")
    }
    // DPB bound: the deepest index any frame reaches, with B pictures
    // non-reference (they never enter the DPB, so only P frames grow the
    // reference count)
    var needDepth = 1
    var refCount = 1 // the IDR
    pFrames.zipWithIndex.foreach { case (mbs, k) =>
      val isB = mbs.exists(_.isInstanceOf[B16x16])
      if (isB) require(mbs.forall(_.isInstanceOf[B16x16]),
        s"frame $k mixes B16x16 with P macroblocks — a slice has one type")
      mbs.foreach {
        case p: P16x16 =>
          require(p.refIdx >= 0 && p.refIdx < refCount,
            s"frame $k references picture ${p.refIdx} before it was decoded")
          needDepth = math.max(needDepth, p.refIdx + 1)
        case p: PPart =>
          require(p.ref0 >= 0 && p.ref0 < refCount &&
            p.ref1 >= 0 && p.ref1 < refCount,
            s"frame $k references pictures ${p.ref0}/${p.ref1} beyond the " +
              s"$refCount decoded refs")
          needDepth = math.max(needDepth, math.max(p.ref0, p.ref1) + 1)
        case p: P8x8 =>
          p.subs.foreach { s =>
            require(s.refIdx >= 0 && s.refIdx < refCount,
              s"frame $k references picture ${s.refIdx} before it was decoded")
            needDepth = math.max(needDepth, s.refIdx + 1)
          }
        case b: B16x16 =>
          if (b.usesL0) {
            require(b.ref0 >= 0 && b.ref0 < refCount,
              s"frame $k L0 index ${b.ref0} beyond the $refCount decoded refs")
            needDepth = math.max(needDepth, b.ref0 + 1)
          }
          if (b.usesL1) {
            val d = l1ToDpb(b.ref1, refCount)
            require(b.ref1 >= 0 && d < refCount && b.ref1 < refCount,
              s"frame $k L1 index ${b.ref1} beyond the $refCount decoded refs")
            // both the mapped DPB slot AND ref1 itself bound the window:
            // the slice writes num_ref_idx_l1_active = ref1 + 1, and the
            // decoder requires that many retained pictures
            needDepth = math.max(needDepth, math.max(d, b.ref1) + 1)
          }
        case PSkip =>
          require(!isB, s"frame $k: B_Skip is direct-mode (unsupported)")
      }
      if (sliceSplits.lift(k).exists(_.length > 1))
        require(!isB, s"frame $k: B pictures must stay single-slice")
      reorders.lift(k).flatten.foreach { picks =>
        require(!isB, s"frame $k: B slices cannot carry a list reorder")
        require(picks.nonEmpty && picks.distinct.length == picks.length &&
          picks.forall(i => i >= 0 && i < refCount),
          s"frame $k: reorder must pick distinct decoded DPB indices")
        needDepth = math.max(needDepth, picks.max + 1)
      }
      if (!isB) refCount += 1
    }
    val maxRef = needDepth
    require(maxRef <= 16, s"refIdx ${maxRef - 1} beyond the 16-frame DPB")
    val out = new java.io.ByteArrayOutputStream()
    H264.writeNal(out, 3, 7, H264.writeSps(H264.Sps(66, 20, 4, 2, mbsX, mbsY,
      0, 0, frameMbsOnly = true, maxNumRefFrames = maxRef)))
    H264.writeNal(out, 3, 8, H264.writePps(cabac = cabac, weightedPred = wpOn))
    // --- IDR intra reference picture (PCM and/or CAVLC macroblocks; in a
    // CABAC stream the same plans go through the CABAC I-slice codec) ---
    val iw = new BitWriter
    iw.ue(0); iw.ue(7); iw.ue(0)   // first_mb, slice_type I(all), pps
    iw.u(0, 4)                     // frame_num 0
    iw.ue(0)                       // idr_pic_id
    iw.u(0, 1); iw.u(0, 1)         // dec_ref_pic_marking (IDR)
    iw.se(qp - 26)                 // slice_qp_delta
    iw.ue(deblockIdc)              // disable_deblocking_filter_idc
    if (deblockIdc != 1) { iw.se(aOffD2); iw.se(bOffD2) }
    if (cabac) {
      while (!iw.byteAligned) iw.u(1, 1) // cabac_alignment_one_bit (7.3.4)
      H264Cabac.encodeISliceMbs(iw, qp, mbsX, mbsY, iMbs)
    } else {
      H264Cavlc.writeISliceMbs(iw, mbsX, mbsY, iMbs)
      iw.trailingBits()
    }
    H264.writeNal(out, 3, 5, iw.toBytes)
    // --- P / B pictures ---
    var prevRefFrameNum = 0 // the IDR
    // frame_num per DPB slot (newest first), mirroring the decoder's
    // sliding window — the PicNum source for reorder op emission
    val refFns = scala.collection.mutable.ArrayBuffer[Int](0)
    def noteRefFrame(fn: Int): Unit = {
      refFns.prepend(fn)
      if (refFns.length > maxRef)
        refFns.remove(maxRef, refFns.length - maxRef)
    }
    pFrames.zipWithIndex.foreach { case (mbs, fi) =>
      require(mbs.length == mbsX * mbsY, "frame must plant every MB")
      val isB = mbs.exists(_.isInstanceOf[B16x16])
      val fw = weights.lift(fi).flatten
      if (isB) require(fw.isEmpty,
        s"frame $fi: B slices cannot carry explicit weights (bipred idc 0)")
      var w = new BitWriter

      /** pred_weight_table (7.3.3.2) for this P slice. */
      def writeWpTable(numActive: Int): Unit = {
        w.ue(fw.map(_.lumaLog2Denom).getOrElse(0))
        w.ue(fw.map(_.chromaLog2Denom).getOrElse(0))
        var i = 0
        while (i < numActive) {
          fw.flatMap(_.luma.lift(i).flatten) match {
            case Some((wt, o)) => w.u(1, 1); w.se(wt); w.se(o)
            case None => w.u(0, 1)
          }
          fw.flatMap(_.chroma.lift(i).flatten) match {
            case Some(((wb, ob), (wr, orr))) =>
              w.u(1, 1); w.se(wb); w.se(ob); w.se(wr); w.se(orr)
            case None => w.u(0, 1)
          }
          i += 1
        }
      }

      /** Shared residual writer (7.3.5.3 luma path, chroma CBP 0). */
      def writeResidual(mbX: Int, mbY: Int, cbpLuma: Int,
          levels: Array[Array[Int]], qpDelta: Int,
          nctx: Array[Array[Int]]): Unit = {
        require(cbpLuma >= 0 && cbpLuma <= 15, "bad cbpLuma")
        w.ue(cbpInterInv(cbpLuma)) // me(v), inter column, cbpChroma 0
        // 9.2.1: uncoded 8x8s of THIS MB are available-with-0 to its own
        // coded blocks — publish before the block loop, not after it
        fillUncodedNctxZero(nctx, mbX, mbY, cbpLuma)
        if (cbpLuma > 0) {
          w.se(qpDelta)
          var b = 0
          while (b < 16) {
            if ((cbpLuma & (1 << (b / 4))) != 0) {
              val (bx, by) = H264Cavlc.blk4x4(b)
              val lv = (if (levels == null || levels(b) == null)
                Array.empty[Int] else levels(b)).padTo(16, 0).take(16)
              val tc = H264Cavlc.encodeResidual(w, lv,
                H264Cavlc.ncAt(nctx, mbX * 4 + bx, mbY * 4 + by))
              nctx(mbY * 4 + by)(mbX * 4 + bx) = tc
            }
            b += 1
          }
        }
        // all 16 cells are published: uncoded 8x8s by the pre-pass above,
        // coded blocks by the loop — nothing left at -1 in this MB
      }

      /** te(v) for a reference index with numActive entries. */
      def writeRefIdx(idx: Int, numActive: Int): Unit =
        if (numActive > 1) {
          if (numActive == 2) w.u(1 - idx, 1) else w.ue(idx)
        }

      if (!isB) {
        val reorder = reorders.lift(fi).flatten
        val planMax = math.max(1, (mbs.collect {
          case p: P16x16 => p.refIdx + 1
          case p: PPart => math.max(p.ref0, p.ref1) + 1
          case p: P8x8 => p.subs.map(_.refIdx).max + 1
        } :+ 1).max)
        val numActive = reorder.map { picks =>
          require(picks.length >= planMax,
            s"frame $fi: reorder of ${picks.length} entries but a plan " +
              s"references list position ${planMax - 1}")
          picks.length
        }.getOrElse(planMax)
        val fn = (prevRefFrameNum + 1) % 16
        val total = mbsX * mbsY
        // multi-slice split points (7.4.3 first_mb_in_slice): one slice
        // from each start to the next; every slice carries the SAME
        // frame_num / deblocking signalling and FRESH neighbor state
        // (slice independence — 6.4.8 availability stops at the boundary)
        val starts = sliceSplits.lift(fi).filter(_.nonEmpty).getOrElse(Seq(0))
        require(starts.head == 0 && starts == starts.sorted &&
          starts.distinct == starts && starts.forall(s => s >= 0 && s < total),
          s"frame $fi: slice starts must be distinct ascending MB addresses from 0")
        starts.zipWithIndex.foreach { case (s0, si) =>
          val s1 = if (si + 1 < starts.length) starts(si + 1) else total
          w = new BitWriter
          w.ue(s0)                 // first_mb_in_slice
          w.ue(5)                  // slice_type = P (all)
          w.ue(0)                  // pps id
          w.u(fn.toLong, 4)        // frame_num
          if (numActive == 1) w.u(0, 1) // num_ref_idx_active_override_flag
          else { w.u(1, 1); w.ue(numActive - 1) }
          reorder match {
            case Some(picks) =>
              // 7.3.3.1: one short-term op per desired list position,
              // computed against the running picNumLXPred in PicNum space
              // (the decoder's noWrap arithmetic lands identically)
              w.u(1, 1)            // ref_pic_list_modification_flag_l0
              def pn(i: Int) = { val f = refFns(i); if (f > fn) f - 16 else f }
              var pred = fn
              picks.foreach { di =>
                val p = pn(di)
                if (p < pred) { w.ue(0); w.ue(pred - p - 1) }
                else { w.ue(1); w.ue(p - pred - 1) }
                pred = p
              }
              w.ue(3)              // end of modification ops
            case None => w.u(0, 1) // ref_pic_list_modification_flag_l0
          }
          if (wpOn) writeWpTable(numActive) // pred_weight_table (7.3.3)
          w.u(0, 1)                // adaptive_ref_pic_marking_mode_flag (7.3.3.3)
          w.se(qp - 26)            // slice_qp_delta
          w.ue(deblockIdc)         // disable_deblocking_filter_idc
          if (deblockIdc != 1) { w.se(aOffD2); w.se(bOffD2) }
          val g = new MvGrid(mbsX, mbsY)
          if (cabac) {
            // --- CABAC P slice (7.3.4 CABAC framing): per-MB skip FLAGS
            // and end_of_slice terminates instead of skip runs; motion /
            // partition geometry and residual semantics identical
            while (!w.byteAligned) w.u(1, 1) // cabac_alignment_one_bit
            val pe = new H264Cabac.PSliceEncoder(w, qp, mbsX, mbsY)
            def residual(mbX: Int, mbY: Int, cbpLuma: Int,
                levels: Array[Array[Int]], qpDelta: Int): Unit = {
              pe.cbpLuma(mbX, mbY, cbpLuma)
              if (cbpLuma > 0) {
                pe.qpDelta(qpDelta)
                var b = 0
                while (b < 16) {
                  if ((cbpLuma & (1 << (b / 4))) != 0) {
                    val (bx, by) = H264Cavlc.blk4x4(b)
                    val lv = (if (levels == null || levels(b) == null)
                      Array.empty[Int] else levels(b)).padTo(16, 0).take(16)
                    pe.lumaBlock(mbX * 4 + bx, mbY * 4 + by, lv)
                  }
                  b += 1
                }
              } else pe.noQpDelta()
              pe.finishMb(mbX, mbY, cbpLuma)
            }
            (s0 until s1).foreach { mbIdx =>
              val plan = mbs(mbIdx)
              val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
              plan match {
                case PSkip =>
                  pe.skipFlag(mbX, mbY, skip = true)
                  val (sx, sy) = skipMv(g, mbX, mbY, mbsX)
                  g.set(mbX, mbY, sx, sy, 0)
                case p: P16x16 =>
                  pe.skipFlag(mbX, mbY, skip = false)
                  pe.mbTypeP(0)
                  if (numActive > 1) pe.refIdx(mbX * 4, mbY * 4, 4, 4, p.refIdx)
                  val (px, py) = mvPred(g, mbX, mbY, mbsX, p.refIdx)
                  pe.mvd(mbX * 4, mbY * 4, 4, 4, p.mvx - px, p.mvy - py)
                  g.set(mbX, mbY, p.mvx, p.mvy, p.refIdx)
                  residual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta)
                case p: PPart =>
                  pe.skipFlag(mbX, mbY, skip = false)
                  val mbType = if (p.wide) 1 else 2
                  pe.mbTypeP(mbType)
                  val ps = partsOf(mbType, mbX, mbY)
                  // 7.3.5.1: ALL ref_idx_l0 first, then ALL mvd_l0
                  if (numActive > 1)
                    ps.zip(Seq(p.ref0, p.ref1)).foreach {
                      case ((gx, gy, w4, h4, _), rf) =>
                        pe.refIdx(gx, gy, w4, h4, rf)
                    }
                  ps.zip(Seq(
                    (p.mv0x, p.mv0y, p.ref0), (p.mv1x, p.mv1y, p.ref1))).foreach {
                    case ((gx, gy, w4, h4, shape), (mx, my, rf)) =>
                      val (px, py) = mvPred(g, gx, gy, w4, mbsX, rf, shape)
                      pe.mvd(gx, gy, w4, h4, mx - px, my - py)
                      g.fill(gx, gy, w4, h4, mx, my, rf)
                  }
                  residual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta)
                case p: P8x8 =>
                  pe.skipFlag(mbX, mbY, skip = false)
                  pe.mbTypeP(3)
                  p.subs.foreach(s => pe.subMbTypeP(s.subType))
                  if (numActive > 1)
                    p.subs.zipWithIndex.foreach { case (s, i) =>
                      val cx = mbX * 4 + (i % 2) * 2
                      val cy = mbY * 4 + (i / 2) * 2
                      pe.refIdx(cx, cy, 2, 2, s.refIdx)
                    }
                  p.subs.zipWithIndex.foreach { case (s, i) =>
                    val cx = mbX * 4 + (i % 2) * 2; val cy = mbY * 4 + (i / 2) * 2
                    subPartsOf(s.subType, cx, cy).zip(s.mvs).foreach {
                      case ((gx, gy, w4, h4), (mx, my)) =>
                        val (px, py) =
                          mvPred(g, gx, gy, w4, mbsX, s.refIdx, Part16x16)
                        pe.mvd(gx, gy, w4, h4, mx - px, my - py)
                        g.fill(gx, gy, w4, h4, mx, my, s.refIdx)
                    }
                  }
                  residual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta)
                case _: B16x16 => throw new IllegalStateException("checked above")
              }
              pe.endOfSlice(mbIdx == s1 - 1)
            }
            w.alignZero() // flush already wrote the rbsp stop bit
          } else {
            // nC grid starts UNAVAILABLE (-1): prior-slice blocks must not
            // contribute to 9.2.1 nC; every decoded MB publishes its 16
            // cells (total_coeff for coded blocks, 0 for the rest / skips)
            val nctx = Array.fill(mbsY * 4, mbsX * 4)(-1)
            var skipRun = 0
            (s0 until s1).foreach { mbIdx =>
              val plan = mbs(mbIdx)
              val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
              plan match {
                case PSkip =>
                  val (sx, sy) = skipMv(g, mbX, mbY, mbsX)
                  g.set(mbX, mbY, sx, sy, 0)
                  fillNctxZero(nctx, mbX, mbY) // skipped MB: nN = 0 (9.2.1)
                  skipRun += 1
                case p: P16x16 =>
                  w.ue(skipRun); skipRun = 0
                  w.ue(0)          // mb_type P_L0_16x16
                  writeRefIdx(p.refIdx, numActive)
                  val (px, py) = mvPred(g, mbX, mbY, mbsX, p.refIdx)
                  w.se(p.mvx - px); w.se(p.mvy - py) // mvd_l0
                  g.set(mbX, mbY, p.mvx, p.mvy, p.refIdx)
                  writeResidual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta, nctx)
                case p: PPart =>
                  w.ue(skipRun); skipRun = 0
                  val mbType = if (p.wide) 1 else 2
                  w.ue(mbType)
                  // 7.3.5.1: ALL ref_idx_l0 first, then ALL mvd_l0
                  writeRefIdx(p.ref0, numActive)
                  writeRefIdx(p.ref1, numActive)
                  partsOf(mbType, mbX, mbY).zip(Seq(
                    (p.mv0x, p.mv0y, p.ref0), (p.mv1x, p.mv1y, p.ref1))).foreach {
                    case ((gx, gy, w4, h4, shape), (mx, my, rf)) =>
                      val (px, py) = mvPred(g, gx, gy, w4, mbsX, rf, shape)
                      w.se(mx - px); w.se(my - py)
                      g.fill(gx, gy, w4, h4, mx, my, rf)
                  }
                  writeResidual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta, nctx)
                case p: P8x8 =>
                  w.ue(skipRun); skipRun = 0
                  w.ue(3) // mb_type P_8x8
                  // 7.3.5: four sub_mb_type, then four ref_idx, then all mvds
                  p.subs.foreach(s => w.ue(s.subType))
                  p.subs.foreach(s => writeRefIdx(s.refIdx, numActive))
                  p.subs.zipWithIndex.foreach { case (s, i) =>
                    val cx = mbX * 4 + (i % 2) * 2; val cy = mbY * 4 + (i / 2) * 2
                    subPartsOf(s.subType, cx, cy).zip(s.mvs).foreach {
                      case ((gx, gy, w4, h4), (mx, my)) =>
                        val (px, py) =
                          mvPred(g, gx, gy, w4, mbsX, s.refIdx, Part16x16)
                        w.se(mx - px); w.se(my - py)
                        g.fill(gx, gy, w4, h4, mx, my, s.refIdx)
                    }
                  }
                  writeResidual(mbX, mbY, p.cbpLuma, p.levels, p.qpDelta, nctx)
                case _: B16x16 => throw new IllegalStateException("checked above")
              }
            }
            if (skipRun > 0) w.ue(skipRun) // trailing skip run (7.3.4)
            w.trailingBits()
          }
          H264.writeNal(out, 2, 1, w.toBytes) // non-IDR reference slice
        }
        prevRefFrameNum = fn
        noteRefFrame(fn)
      } else {
        val bs = mbs.collect { case b: B16x16 => b }
        val numL0 = math.max(1, (bs.filter(_.usesL0).map(_.ref0 + 1) :+ 1).max)
        val numL1 = math.max(1, (bs.filter(_.usesL1).map(_.ref1 + 1) :+ 1).max)
        w.ue(0)                  // first_mb_in_slice
        w.ue(6)                  // slice_type = B (all)
        w.ue(0)                  // pps id
        w.u(((prevRefFrameNum + 1) % 16).toLong, 4) // frame_num (7.4.3:
        // a non-reference picture carries PrevRefFrameNum + 1)
        w.u(1, 1)                // direct_spatial_mv_pred_flag (no direct MBs)
        if (numL0 == 1 && numL1 == 1) w.u(0, 1)
        else { w.u(1, 1); w.ue(numL0 - 1); w.ue(numL1 - 1) }
        w.u(0, 1)                // ref_pic_list_modification_flag_l0
        w.u(0, 1)                // ref_pic_list_modification_flag_l1
        // nal_ref_idc 0: no dec_ref_pic_marking in a non-reference slice
        w.se(qp - 26)            // slice_qp_delta
        w.ue(deblockIdc)         // disable_deblocking_filter_idc
        if (deblockIdc != 1) { w.se(aOffD2); w.se(bOffD2) }
        // one ADDRESS-availability grid shared by both lists (6.4.11.7):
        // a decoded B_L1 neighbor must stay available to an L0 prediction
        val decoded = Array.fill(mbsY * 4, mbsX * 4)(false)
        val g0 = new MvGrid(mbsX, mbsY, decoded) // list-0 motion state
        val g1 = new MvGrid(mbsX, mbsY, decoded) // list-1 motion state
        val nctx = Array.fill(mbsY * 4, mbsX * 4)(0)
        mbs.zipWithIndex.foreach { case (plan, mbIdx) =>
          val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
          val b = plan.asInstanceOf[B16x16]
          w.ue(0)                           // mb_skip_run (no B_Skip)
          w.ue(1 + b.mode)                  // B_L0/L1/Bi_16x16 (Table 7-14)
          if (b.usesL0) writeRefIdx(b.ref0, numL0)
          if (b.usesL1) writeRefIdx(b.ref1, numL1)
          if (b.usesL0) {
            val (px, py) = mvPred(g0, mbX, mbY, mbsX, b.ref0)
            w.se(b.mv0x - px); w.se(b.mv0y - py)
            g0.set(mbX, mbY, b.mv0x, b.mv0y, b.ref0)
          }
          if (b.usesL1) {
            val (px, py) = mvPred(g1, mbX, mbY, mbsX, b.ref1)
            w.se(b.mv1x - px); w.se(b.mv1y - py)
            g1.set(mbX, mbY, b.mv1x, b.mv1y, b.ref1)
          }
          writeResidual(mbX, mbY, b.cbpLuma, b.levels, b.qpDelta, nctx)
        }
        w.trailingBits()
        H264.writeNal(out, 0, 1, w.toBytes) // non-reference B slice
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- decoder ---

  /** Decode an Annex-B stream of intra pictures (the FULL shared surface:
    * I_PCM, Intra_4x4, Intra_16x16 CAVLC) interleaved with P pictures
    * (all baseline partition geometries down to 4x4, P_Skip, luma
    * residuals in EITHER entropy, multi-picture DPB, explicit list
    * reordering, multi-slice assembly) and B pictures (B_L0/L1/Bi_16x16);
    * returns one luma plane per picture. Constraints are enforced
    * loudly — intra-in-P / direct-mode macroblocks, CABAC B slices,
    * multi-slice I/B pictures, and slice gaps/ASO throw, never
    * mis-decode.
    */
  def decodeFrames(annexB: Array[Byte]): Seq[Array[Array[Int]]] =
    decodeInternal(annexB)((l, _, _) => l) // chroma stays collectable per picture

  /** Full-plane variant: (luma, cb, cr) per picture — the chroma planes
    * are first-class decode state (motion-compensated and referenced),
    * exposed package-private so specs can pin the chroma MC arithmetic
    * that the luma-only public surface would otherwise leave unobserved.
    */
  private[ops] def decodeFramesFull(annexB: Array[Byte])
      : Seq[(Array[Array[Int]], Array[Array[Int]], Array[Array[Int]])] =
    decodeInternal(annexB)((l, cb, cr) => (l, cb, cr))

  /** The decode loop, projecting each picture's planes as they complete so
    * the luma-only public path never retains every picture's chroma.
    */
  private def decodeInternal[T](annexB: Array[Byte])(
      project: (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) => T): Seq[T] = {
    val nals = H264.splitNals(annexB)
    val sps = nals.collectFirst { case (7, _, rbsp) => H264.parseSps(rbsp) }
      .getOrElse(throw new IllegalArgumentException("no SPS in stream"))
    require(sps.cropX == 0 && sps.cropY == 0, "inter decoder: cropping unsupported")
    require(sps.picOrderCntType == 2, "inter decoder: pic_order_cnt_type must be 2")
    require(sps.frameMbsOnly,
      "inter decoder: interlaced (field) streams unsupported — slice" +
        " headers would carry an unparsed field_pic_flag")
    val ppsId = H264.requireSingleParamSets(nals, "inter decoder")
    val pps = nals.collectFirst { case (8, _, rbsp) => rbsp }
      .getOrElse(throw new IllegalArgumentException("no PPS in stream"))
    // one canonical PPS walk: init QP, the chroma QP offset (the intra
    // reference pictures carry chroma residuals), the default L0 depth
    // and the slice-deblocking flag all come from the same pass
    val (initQp, chromaOff, deblock, numRefDefault, numRefL1Default, wpFlag,
        cabacMode) = {
      val r = new BitReader(pps)
      r.ue(); r.ue()
      val cab = r.u(1) == 1 // entropy_coding_mode_flag
      r.u(1)
      require(r.ue() == 0, "inter decoder: slice groups unsupported")
      val nr = r.ue() + 1 // num_ref_idx_l0_default_active
      require(nr <= 16, s"inter decoder: bad default L0 depth $nr")
      val nr1 = r.ue() + 1 // num_ref_idx_l1_default_active
      require(nr1 <= 16, s"inter decoder: bad default L1 depth $nr1")
      val wp = r.u(1) == 1 // weighted_pred_flag: explicit P weighting (7.3.3.2)
      require(r.u(2) == 0, "inter decoder: weighted biprediction unsupported")
      val q = r.se() + 26
      r.se()
      val co = r.se()
      (q, co, r.u(1) == 1, nr, nr1, wp, cab)
    }
    val mbsX = sps.widthMbs; val mbsY = sps.heightMbs
    // decoded-picture buffer, most recent reference FIRST (8.2.4.2.1: P
    // list0 is descending PicNum — with per-picture frame_num increments
    // and sliding-window marking that is exactly decode order, newest
    // first), trimmed to the SPS DPB bound
    val dpb = scala.collection.mutable.ArrayBuffer
      .empty[(Array[Array[Int]], Array[Array[Int]], Array[Array[Int]])]
    // frame_num of each DPB entry, same order — the PicNum source for
    // explicit reference-list modification (8.2.4.3)
    val dpbFn = scala.collection.mutable.ArrayBuffer.empty[Int]
    val maxFrameNum = 1 << sps.log2MaxFrameNum
    // multi-slice P-picture carry state: the PLANES and PicInfo accumulate
    // across a picture's slices; all entropy/prediction neighbor state is
    // per-slice (6.4.8: availability stops at the slice boundary)
    var curPic: (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) = null
    var curInfo: H264Deblock.PicInfo = null
    var curNextMb = 0
    var curSliceIdx = 0
    var curFrameNum = 0
    var curRefIdc = -1
    var curDbIdc = 0; var curOffA = 0; var curOffB = 0
    val pics = scala.collection.mutable.ArrayBuffer.empty[T]
    nals.filter(n => n._1 == 1 || n._1 == 5).foreach { case (nalType, refIdc, rbsp) =>
      val r = new BitReader(rbsp)
      val firstMb = r.ue() // first_mb_in_slice (7.3.3)
      val sliceType = r.ue() % 5
      H264.requireSlicePps(r.ue(), ppsId, "inter decoder")
      val currFrameNum = r.u(sps.log2MaxFrameNum).toInt // frame_num
      if (nalType == 5) r.ue()    // idr_pic_id
      var numActive = numRefDefault
      var numActiveL1 = numRefL1Default
      val l0Mods = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      if (sliceType == 1) r.u(1) // direct_spatial_mv_pred_flag (no direct
      // macroblocks are decoded, so either inference family is moot)
      if (sliceType == 0 || sliceType == 1) {
        if (r.u(1) == 1) {       // num_ref_idx_active_override
          numActive = r.ue() + 1
          if (sliceType == 1) numActiveL1 = r.ue() + 1
        }
        require(numActive >= 1 && numActive <= 16,
          s"inter decoder: num_ref_idx_l0_active $numActive outside [1,16]")
        require(numActiveL1 >= 1 && numActiveL1 <= 16,
          s"inter decoder: num_ref_idx_l1_active $numActiveL1 outside [1,16]")
        // ref_pic_list_modification (7.3.3.1): short-term reordering ops
        // are decoded for P slices (8.2.4.3.1); long-term ops (idc 2)
        // and B-slice modification stay on the seam
        if (r.u(1) == 1) {
          require(sliceType == 0,
            "inter decoder: B-slice list modification unsupported " +
              "(MediaDecoder seam)")
          var idc = r.ue()
          while (idc != 3) {
            require(idc <= 1,
              "inter decoder: long-term list modification (idc 2) " +
                "unsupported (MediaDecoder seam)")
            l0Mods += ((idc, r.ue()))
            require(l0Mods.length <= 32,
              "inter decoder: runaway modification list (corrupt stream)")
            idc = r.ue()
          }
        }
        if (sliceType == 1)
          require(r.u(1) == 0, "inter decoder: L1 list modification unsupported")
      }
      // pred_weight_table (7.3.3): present for P slices when the PPS sets
      // weighted_pred_flag; B slices would need weighted_bipred_idc 1,
      // which the PPS walk pins to 0
      val wp = if (wpFlag && sliceType == 0) parseWp(r, numActive) else null
      if (nalType == 5) { r.u(1); r.u(1) }
      else if (refIdc != 0)
        require(r.u(1) == 0, "inter decoder: adaptive ref marking unsupported")
      var qpY = initQp + r.se()
      val (dbIdc, offA, offB) = H264.sliceDeblockingIdc(r, deblock)
      val filterOn = dbIdc != 1
      if (firstMb == 0) {
        require(curPic == null, "inter decoder: a new picture begins " +
          "before the previous one covered every macroblock")
        curPic = (Array.ofDim[Int](mbsY * 16, mbsX * 16),
          Array.ofDim[Int](mbsY * 8, mbsX * 8),
          Array.ofDim[Int](mbsY * 8, mbsX * 8))
        curInfo = if (filterOn) new H264Deblock.PicInfo(mbsX, mbsY) else null
        if (curInfo != null) curInfo.excludeSliceEdges = dbIdc == 2
        curNextMb = 0; curSliceIdx = 0
        curFrameNum = currFrameNum; curRefIdc = refIdc
        curDbIdc = dbIdc; curOffA = offA; curOffB = offB
      } else {
        require(curPic != null && firstMb == curNextMb,
          s"inter decoder: slice starts at MB $firstMb, expected $curNextMb" +
            " (gaps / arbitrary slice order unsupported)")
        require(sliceType == 0, "inter decoder: multi-slice pictures are " +
          "P-only (I/B slices cover a full picture)")
        require(currFrameNum == curFrameNum && refIdc == curRefIdc,
          "inter decoder: slices of one picture must share frame_num and " +
            "nal_ref_idc")
        require(dbIdc == curDbIdc && offA == curOffA && offB == curOffB,
          "inter decoder: per-slice deblocking variation unsupported " +
            "(one idc/offset set per picture)")
        curSliceIdx += 1
      }
      val (luma, cb, cr) = curPic
      val info = curInfo
      if (sliceType == 2) {
        // I picture: the full intra surface through the shared slice
        // decoder of the stream's entropy mode — luma AND chroma land in
        // this picture's planes, so P pictures can reference real
        // compressed intra content, not just PCM
        if (cabacMode) {
          r.alignToByte(1) // cabac_alignment_one_bit (7.3.3)
          H264Cabac.decodeISliceMbs(r, qpY, mbsX, mbsY, chromaOff,
            luma, cb, cr, info)
        } else
          H264Cavlc.decodeISliceMbs(r, mbsX, mbsY, qpY, chromaOff, luma, cb, cr, info)
      } else if (sliceType == 0) {
        require(dpb.nonEmpty, "P slice with no decoded reference picture")
        require(numActive <= dpb.length,
          s"inter decoder: $numActive active references but only " +
            s"${dpb.length} decoded pictures")
        // RefPicList0 as DPB indices: the initial list IS the DPB order
        // (descending PicNum); explicit modification ops (8.2.4.3.1)
        // reorder it against PicNums with the 8.2.4.1 frame_num wrap
        val list0: IndexedSeq[Int] =
          if (l0Mods.isEmpty) dpb.indices
          else {
            def picNum(fn: Int) =
              if (fn > currFrameNum) fn - maxFrameNum else fn
            val list = scala.collection.mutable.ArrayBuffer(dpb.indices: _*)
            var pred = currFrameNum
            var refIdx = 0
            l0Mods.foreach { case (idc, absM1) =>
              val noWrap =
                if (idc == 0) {
                  val v = pred - (absM1 + 1)
                  if (v < 0) v + maxFrameNum else v
                } else {
                  val v = pred + (absM1 + 1)
                  if (v >= maxFrameNum) v - maxFrameNum else v
                }
              pred = noWrap
              val pn = if (noWrap > currFrameNum) noWrap - maxFrameNum
                else noWrap
              val di = dpbFn.indices.find(i => picNum(dpbFn(i)) == pn)
                .getOrElse(throw new IllegalArgumentException(
                  s"inter decoder: list modification names PicNum $pn, " +
                    "absent from the DPB (corrupt stream)"))
              list.insert(refIdx, di)
              val dup = list.indexOf(di, refIdx + 1)
              if (dup >= 0) list.remove(dup)
              refIdx += 1
            }
            // insert+dedupe preserves length (every op names an in-DPB
            // picture), so truncation to the active window is exact
            list.take(numActive).toIndexedSeq
          }
        val g = new MvGrid(mbsX, mbsY)
        // -1 = unavailable (9.2.1 nC): prior-slice blocks never contribute;
        // every decoded MB publishes its cells (tc / 0) as it lands
        val nctx = Array.fill(mbsY * 4, mbsX * 4)(-1)

        /** Motion-compensate one luma region (origin/size in pixels, both
          * even) + its chroma from list0 reference `refIdx`, with the
          * slice's explicit weights when present.
          */
        def mcRegion(px0: Int, py0: Int, wpx: Int, hpx: Int,
            mvx: Int, mvy: Int, refIdx: Int): Unit = {
          val (refL, refCb, refCr) = dpb(list0(refIdx))
          val ix = mvx >> 2; val fx = mvx & 3
          val iy = mvy >> 2; val fy = mvy & 3
          var y = 0
          while (y < hpx) {
            var x = 0
            while (x < wpx) {
              val px = px0 + x; val py = py0 + y
              val v = lumaInterp(refL, px + ix, py + iy, fx, fy)
              luma(py)(px) =
                if (wp == null) v
                else weight1(v, wp.logL, wp.lw(refIdx), wp.lo(refIdx))
              x += 1
            }
            y += 1
          }
          val cix = mvx >> 3; val cfx = mvx & 7
          val ciy = mvy >> 3; val cfy = mvy & 7
          y = 0
          while (y < hpx / 2) {
            var x = 0
            while (x < wpx / 2) {
              val px = px0 / 2 + x; val py = py0 / 2 + y
              val vb = chromaInterp(refCb, px + cix, py + ciy, cfx, cfy)
              val vr = chromaInterp(refCr, px + cix, py + ciy, cfx, cfy)
              if (wp == null) { cb(py)(px) = vb; cr(py)(px) = vr }
              else {
                cb(py)(px) = weight1(vb, wp.logC, wp.cw(0)(refIdx), wp.co(0)(refIdx))
                cr(py)(px) = weight1(vr, wp.logC, wp.cw(1)(refIdx), wp.co(1)(refIdx))
              }
              x += 1
            }
            y += 1
          }
        }
        def mc(mbX: Int, mbY: Int, mvx: Int, mvy: Int, refIdx: Int): Unit =
          mcRegion(mbX * 16, mbY * 16, 16, 16, mvx, mvy, refIdx)

        if (cabacMode) {
          // --- CABAC P slice: entropy via H264Cabac.PSliceDecoder, the
          // SAME motion/MC/residual machinery as the CAVLC loop below
          // (7.3.4 framing: per-MB skip flags + end_of_slice terminates)
          r.alignToByte(1) // cabac_alignment_one_bit (7.3.3)
          val pd = new H264Cabac.PSliceDecoder(r, qpY, mbsX, mbsY)
          var mbIdx = firstMb
          var sliceDone = false
          while (!sliceDone) {
            require(mbIdx < mbsX * mbsY,
              "inter decoder: CABAC slice overruns the picture")
            val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
            if (info != null) info.sliceId(mbY)(mbX) = curSliceIdx
            if (pd.skipFlag(mbX, mbY)) {
              val (sx, sy) = skipMv(g, mbX, mbY, mbsX)
              g.set(mbX, mbY, sx, sy, 0)
              mc(mbX, mbY, sx, sy, 0)
              if (info != null) { // P_Skip: QP_Y,prev carries, no coeffs
                info.qp(mbY)(mbX) = qpY
                info.fillMv(mbX * 4, mbY * 4, 4, 4, sx, sy, 0)
              }
            } else {
              val mbType = pd.mbTypeP()
              if (mbType == 3) {
                // P_8x8: sub_mb_types, per-8x8 ref_idx, per-sub-part mvd
                val subTypes = (0 until 4).map(_ => pd.subMbTypeP())
                val refs = (0 until 4).map { i =>
                  if (numActive == 1) 0
                  else {
                    val cx = mbX * 4 + (i % 2) * 2
                    val cy = mbY * 4 + (i / 2) * 2
                    val v = pd.refIdx(cx, cy, 2, 2)
                    require(v < numActive,
                      s"inter decoder: ref_idx_l0 $v >= numActive $numActive")
                    v
                  }
                }
                (0 until 4).foreach { i =>
                  val cx = mbX * 4 + (i % 2) * 2; val cy = mbY * 4 + (i / 2) * 2
                  subPartsOf(subTypes(i), cx, cy).foreach {
                    case (gx, gy, w4, h4) =>
                      val (dx, dy) = pd.mvd(gx, gy, w4, h4)
                      val (px0, py0) =
                        mvPred(g, gx, gy, w4, mbsX, refs(i), Part16x16)
                      val mvx = px0 + dx; val mvy = py0 + dy
                      g.fill(gx, gy, w4, h4, mvx, mvy, refs(i))
                      mcRegion(gx * 4, gy * 4, w4 * 4, h4 * 4, mvx, mvy, refs(i))
                      if (info != null)
                        info.fillMv(gx, gy, w4, h4, mvx, mvy, refs(i))
                  }
                }
              } else {
              val ps = partsOf(mbType, mbX, mbY)
              // 7.3.5.1: ALL ref_idx_l0 first, then ALL mvd_l0
              val refs = ps.map { case (gx, gy, w4, h4, _) =>
                if (numActive == 1) 0
                else {
                  val v = pd.refIdx(gx, gy, w4, h4)
                  require(v < numActive,
                    s"inter decoder: ref_idx_l0 $v >= numActive $numActive")
                  v
                }
              }
              ps.zip(refs).foreach { case ((gx, gy, w4, h4, shape), rf) =>
                val (dx, dy) = pd.mvd(gx, gy, w4, h4)
                val (px0, py0) = mvPred(g, gx, gy, w4, mbsX, rf, shape)
                val mvx = px0 + dx; val mvy = py0 + dy
                g.fill(gx, gy, w4, h4, mvx, mvy, rf)
                mcRegion(gx * 4, gy * 4, w4 * 4, h4 * 4, mvx, mvy, rf)
                if (info != null) info.fillMv(gx, gy, w4, h4, mvx, mvy, rf)
              }
              }
              val cbpLuma = pd.cbpLuma(mbX, mbY)
              if (cbpLuma > 0) {
                qpY = pd.qpDelta(qpY)
                var b = 0
                while (b < 16) {
                  if ((cbpLuma & (1 << (b / 4))) != 0) {
                    val (bx, by) = H264Cavlc.blk4x4(b)
                    val lv = pd.lumaBlock(mbX * 4 + bx, mbY * 4 + by)
                    if (info != null)
                      info.nz(mbY * 4 + by)(mbX * 4 + bx) = lv.exists(_ != 0)
                    val dq = H264Cavlc.dequant4x4(lv, qpY, acOnly = false)
                    val res = H264Cavlc.idct4x4(dq)
                    var y = 0
                    while (y < 4) {
                      var x = 0
                      while (x < 4) {
                        val fx = mbX * 16 + bx * 4 + x
                        val fy = mbY * 16 + by * 4 + y
                        luma(fy)(fx) = clip255(luma(fy)(fx) + res(y)(x))
                        x += 1
                      }
                      y += 1
                    }
                  }
                  b += 1
                }
              } else pd.noQpDelta()
              pd.finishMb(mbX, mbY, cbpLuma)
              if (info != null) info.qp(mbY)(mbX) = qpY
            }
            mbIdx += 1
            sliceDone = pd.endOfSlice()
          }
          curNextMb = mbIdx
        } else {
        var mbIdx = firstMb
        var more = true
        while (more) {
          // mb_skip_run precedes every coded MB and may end the slice (7.3.4)
          val skipRun = r.ue()
          require(mbIdx + skipRun <= mbsX * mbsY, "skip run overruns the picture")
          var sk = 0
          while (sk < skipRun) {
            val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
            val (sx, sy) = skipMv(g, mbX, mbY, mbsX)
            g.set(mbX, mbY, sx, sy, 0)
            mc(mbX, mbY, sx, sy, 0)
            fillNctxZero(nctx, mbX, mbY) // skipped MB: nN = 0 (9.2.1)
            if (info != null) { // P_Skip: QP_Y,prev carries, no coeffs
              info.qp(mbY)(mbX) = qpY
              info.fillMv(mbX * 4, mbY * 4, 4, 4, sx, sy, 0)
              info.sliceId(mbY)(mbX) = curSliceIdx
            }
            sk += 1; mbIdx += 1
          }
          if (mbIdx < mbsX * mbsY && r.hasMoreRbspData) {
            val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
            val mbType = r.ue()
            require(mbType <= 3,
              s"inter decoder: mb_type $mbType unsupported (P_L0 16x16/16x8/" +
                "8x16/8x8; P_8x8ref0 and intra-in-P exit via the " +
                "MediaDecoder seam)")
            def readTe(): Int = {
              val v =
                if (numActive == 1) 0
                else if (numActive == 2) 1 - r.u(1).toInt // te(v), cMax 1
                else r.ue()
              require(v < numActive,
                s"inter decoder: ref_idx_l0 $v >= numActive $numActive")
              v
            }
            if (mbType == 3) {
              // P_8x8 (7.3.5): four sub_mb_type, four ref_idx, then every
              // sub-partition's mvd in decode order — predictors via the
              // GENERAL 8.4.1.3 rule over the 4x4-granular grid
              val subTypes = (0 until 4).map { _ =>
                val st = r.ue()
                require(st <= 3,
                  s"inter decoder: sub_mb_type $st unsupported (P_L0 only)")
                st
              }
              val refs = (0 until 4).map(_ => readTe())
              (0 until 4).foreach { i =>
                val cx = mbX * 4 + (i % 2) * 2; val cy = mbY * 4 + (i / 2) * 2
                subPartsOf(subTypes(i), cx, cy).foreach {
                  case (gx, gy, w4, h4) =>
                    val (px0, py0) =
                      mvPred(g, gx, gy, w4, mbsX, refs(i), Part16x16)
                    val mvx = px0 + r.se(); val mvy = py0 + r.se()
                    g.fill(gx, gy, w4, h4, mvx, mvy, refs(i))
                    mcRegion(gx * 4, gy * 4, w4 * 4, h4 * 4, mvx, mvy, refs(i))
                    if (info != null)
                      info.fillMv(gx, gy, w4, h4, mvx, mvy, refs(i))
                }
              }
            } else {
            val ps = partsOf(mbType, mbX, mbY)
            val refs = ps.map(_ => readTe()) // 7.3.5.1: all ref_idx first
            ps.zip(refs).foreach { case ((gx, gy, w4, h4, shape), rf) =>
              val (px0, py0) = mvPred(g, gx, gy, w4, mbsX, rf, shape)
              val mvx = px0 + r.se(); val mvy = py0 + r.se()
              g.fill(gx, gy, w4, h4, mvx, mvy, rf)
              mcRegion(gx * 4, gy * 4, w4 * 4, h4 * 4, mvx, mvy, rf)
              if (info != null) info.fillMv(gx, gy, w4, h4, mvx, mvy, rf)
            }
            }
            val codeNum = r.ue()
            require(codeNum < 48, s"bad coded_block_pattern code $codeNum")
            val cbp = cbpInter(codeNum)
            require((cbp >> 4) == 0,
              "inter decoder: chroma residual unsupported (cbpChroma must be 0)")
            val cbpLuma = cbp & 15
            // 9.2.1: uncoded 8x8s of THIS MB are available-with-0 to its
            // own coded blocks — publish before the block loop
            fillUncodedNctxZero(nctx, mbX, mbY, cbpLuma)
            if (cbp > 0) {
              qpY = (qpY + r.se() + 52) % 52
              def lumaNC(bx: Int, by: Int): Int =
                H264Cavlc.ncAt(nctx, mbX * 4 + bx, mbY * 4 + by)
              var b = 0
              while (b < 16) {
                if ((cbpLuma & (1 << (b / 4))) != 0) {
                  val (bx, by) = H264Cavlc.blk4x4(b)
                  val (lv, tc) = H264Cavlc.decodeResidual(r, lumaNC(bx, by), 16)
                  nctx(mbY * 4 + by)(mbX * 4 + bx) = tc
                  if (info != null) info.nz(mbY * 4 + by)(mbX * 4 + bx) = tc > 0
                  val d = H264Cavlc.dequant4x4(lv, qpY, acOnly = false)
                  val res = H264Cavlc.idct4x4(d)
                  var y = 0
                  while (y < 4) {
                    var x = 0
                    while (x < 4) {
                      val fx = mbX * 16 + bx * 4 + x
                      val fy = mbY * 16 + by * 4 + y
                      luma(fy)(fx) = clip255(luma(fy)(fx) + res(y)(x))
                      x += 1
                    }
                    y += 1
                  }
                }
                b += 1
              }
            }
            // all 16 cells published: uncoded 8x8s by the pre-pass, coded
            // blocks by the loop — nothing left at -1 in this MB
            if (info != null) {
              info.qp(mbY)(mbX) = qpY
              info.sliceId(mbY)(mbX) = curSliceIdx
            }
            mbIdx += 1
            more = mbIdx < mbsX * mbsY && r.hasMoreRbspData
          } else more = false
        }
        curNextMb = mbIdx
        }
      } else {
        // ------------------------------------------------------ B slice ---
        require(sliceType == 1, s"inter decoder: unsupported slice_type $sliceType")
        require(!cabacMode,
          "inter decoder: CABAC B slices unsupported (MediaDecoder seam)")
        require(!filterOn,
          "inter decoder: deblocking across B pictures unsupported (the " +
            "bi-predictive bS comparison is not implemented) — B slices " +
            "must signal disable_deblocking_filter_idc 1")
        require(dpb.nonEmpty, "B slice with no decoded reference picture")
        require(numActive <= dpb.length && numActiveL1 <= dpb.length,
          s"inter decoder: $numActive/$numActiveL1 active references but " +
            s"only ${dpb.length} decoded pictures")
        // shared ADDRESS-availability grid — see the encoder-side comment
        val decoded = Array.fill(mbsY * 4, mbsX * 4)(false)
        val g0 = new MvGrid(mbsX, mbsY, decoded)
        val g1 = new MvGrid(mbsX, mbsY, decoded)
        val nctx = Array.fill(mbsY * 4, mbsX * 4)(0)

        /** One MB's motion-compensated prediction from DPB entry `d` as
          * fresh blocks (16x16 luma, 8x8 cb/cr) — B paths average or copy
          * these instead of writing the picture in place.
          */
        def predBlocks(mbX: Int, mbY: Int, mvx: Int, mvy: Int, d: Int)
            : (Array[Array[Int]], Array[Array[Int]], Array[Array[Int]]) = {
          val (refL, refCb, refCr) = dpb(d)
          val ix = mvx >> 2; val fx = mvx & 3
          val iy = mvy >> 2; val fy = mvy & 3
          val l = Array.tabulate(16, 16)((y, x) =>
            lumaInterp(refL, mbX * 16 + x + ix, mbY * 16 + y + iy, fx, fy))
          val cix = mvx >> 3; val cfx = mvx & 7
          val ciy = mvy >> 3; val cfy = mvy & 7
          val b = Array.tabulate(8, 8)((y, x) =>
            chromaInterp(refCb, mbX * 8 + x + cix, mbY * 8 + y + ciy, cfx, cfy))
          val c = Array.tabulate(8, 8)((y, x) =>
            chromaInterp(refCr, mbX * 8 + x + cix, mbY * 8 + y + ciy, cfx, cfy))
          (l, b, c)
        }

        def readTe(num: Int): Int =
          if (num == 1) 0
          else if (num == 2) 1 - r.u(1).toInt
          else r.ue()

        var mbIdx = 0
        while (mbIdx < mbsX * mbsY) {
          val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
          require(r.ue() == 0,
            "inter decoder: B_Skip is direct-mode — unsupported (MediaDecoder seam)")
          val mbType = r.ue()
          require(mbType >= 1 && mbType <= 3,
            s"inter decoder: B mb_type $mbType unsupported (B_L0/L1/Bi_16x16 " +
              "only; direct and sub-partitioned types exit via the seam)")
          val mode = mbType - 1 // 0=L0, 1=L1, 2=Bi (Table 7-14)
          val usesL0 = mode != 1; val usesL1 = mode != 0
          val ref0 = if (usesL0) readTe(numActive) else 0
          val ref1 = if (usesL1) readTe(numActiveL1) else 0
          require(ref0 < numActive && ref1 < numActiveL1,
            s"inter decoder: B ref_idx out of range ($ref0/$ref1)")
          var mv0x = 0; var mv0y = 0; var mv1x = 0; var mv1y = 0
          if (usesL0) {
            val (px, py) = mvPred(g0, mbX, mbY, mbsX, ref0)
            mv0x = px + r.se(); mv0y = py + r.se()
            g0.set(mbX, mbY, mv0x, mv0y, ref0)
          }
          if (usesL1) {
            val (px, py) = mvPred(g1, mbX, mbY, mbsX, ref1)
            mv1x = px + r.se(); mv1y = py + r.se()
            g1.set(mbX, mbY, mv1x, mv1y, ref1)
          }
          val (pl, pcb, pcr) =
            if (mode == 0) predBlocks(mbX, mbY, mv0x, mv0y, ref0)
            else if (mode == 1)
              predBlocks(mbX, mbY, mv1x, mv1y, l1ToDpb(ref1, dpb.length))
            else {
              // default bi prediction (8.4.2.3.1): rounded average
              val (a, ab, ac) = predBlocks(mbX, mbY, mv0x, mv0y, ref0)
              val (b, bb, bc) =
                predBlocks(mbX, mbY, mv1x, mv1y, l1ToDpb(ref1, dpb.length))
              (Array.tabulate(16, 16)((y, x) => (a(y)(x) + b(y)(x) + 1) >> 1),
                Array.tabulate(8, 8)((y, x) => (ab(y)(x) + bb(y)(x) + 1) >> 1),
                Array.tabulate(8, 8)((y, x) => (ac(y)(x) + bc(y)(x) + 1) >> 1))
            }
          var y = 0
          while (y < 16) {
            var x = 0
            while (x < 16) {
              luma(mbY * 16 + y)(mbX * 16 + x) = pl(y)(x)
              if (y < 8 && x < 8) {
                cb(mbY * 8 + y)(mbX * 8 + x) = pcb(y)(x)
                cr(mbY * 8 + y)(mbX * 8 + x) = pcr(y)(x)
              }
              x += 1
            }
            y += 1
          }
          // coded_block_pattern + luma residual (shared arithmetic with P)
          val codeNum = r.ue()
          require(codeNum < 48, s"bad coded_block_pattern code $codeNum")
          val cbp = cbpInter(codeNum)
          require((cbp >> 4) == 0,
            "inter decoder: chroma residual unsupported (cbpChroma must be 0)")
          val cbpLuma = cbp & 15
          if (cbp > 0) {
            qpY = (qpY + r.se() + 52) % 52
            def lumaNC(bx: Int, by: Int): Int =
              H264Cavlc.ncAt(nctx, mbX * 4 + bx, mbY * 4 + by)
            var b = 0
            while (b < 16) {
              if ((cbpLuma & (1 << (b / 4))) != 0) {
                val (bx, by) = H264Cavlc.blk4x4(b)
                val (lv, tc) = H264Cavlc.decodeResidual(r, lumaNC(bx, by), 16)
                nctx(mbY * 4 + by)(mbX * 4 + bx) = tc
                val d = H264Cavlc.dequant4x4(lv, qpY, acOnly = false)
                val res = H264Cavlc.idct4x4(d)
                var ry = 0
                while (ry < 4) {
                  var rx = 0
                  while (rx < 4) {
                    val fx = mbX * 16 + bx * 4 + rx
                    val fy = mbY * 16 + by * 4 + ry
                    luma(fy)(fx) = clip255(luma(fy)(fx) + res(ry)(rx))
                    rx += 1
                  }
                  ry += 1
                }
              }
              b += 1
            }
          }
          mbIdx += 1
        }
      }
      // I and B slices always cover the full picture; P pictures complete
      // when their slices have decoded every MB
      if (sliceType != 0) curNextMb = mbsX * mbsY
      if (curNextMb == mbsX * mbsY) {
        // IN-loop: the filtered picture is what later P pictures reference
        if (filterOn)
          H264Deblock.filter(luma, cb, cr, info, offA, offB, chromaOff)
        if (refIdc != 0) {
          dpb.prepend((luma, cb, cr)) // newest first (descending PicNum)
          dpbFn.prepend(currFrameNum)
          if (dpb.length > sps.maxNumRefFrames) { // sliding window (8.2.5.3)
            dpb.remove(sps.maxNumRefFrames, dpb.length - sps.maxNumRefFrames)
            dpbFn.remove(sps.maxNumRefFrames, dpbFn.length - sps.maxNumRefFrames)
          }
        }
        pics += project(luma, cb, cr)
        curPic = null; curInfo = null
      }
    }
    require(curPic == null,
      "inter decoder: stream ends mid-picture (missing slices)")
    pics.toSeq
  }
}
