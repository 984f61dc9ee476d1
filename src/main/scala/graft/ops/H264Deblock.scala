package graft.ops

/** H.264 **in-loop deblocking filter** (ITU-T Rec. H.264, clause 8.7) for
  * the native subset decoders [[H264Cavlc]] / [[H264Inter]] — the last
  * conformance concession the predicted-macroblock layers carried
  * (VERDICT r11 item 4: emitted slices used to signal
  * `disable_deblocking_filter_idc = 1` and filter-enabled streams were
  * rejected loudly). With this module, streams whose slice headers enable
  * the filter decode natively: every 4x4 block edge is post-processed per
  * 8.7.2, and — because the filter is IN-loop — the filtered picture is
  * what subsequent P pictures motion-compensate from.
  *
  * What is implemented, per the public spec (clauses cited inline):
  *  - boundary-strength derivation (8.7.2.1) for frame macroblocks:
  *    bS = 4 on macroblock edges with an intra side, 3 on internal intra
  *    edges, 2 when either 4x4 block carries residual coefficients, 1 on
  *    different L0 reference pictures or quarter-sample motion
  *    discontinuities (≥ 4 quarter units on either component), else 0
  *    (no filtering);
  *  - the α / β thresholds (Table 8-16) and the t'C0 clipping table
  *    (Table 8-17) with the slice-header FilterOffsetA/B applied per
  *    8.7.2.2 (indexA/indexB from the EDGE-average QP, where an I_PCM
  *    macroblock contributes qP = 0);
  *  - the normal (bS < 4) edge filter (8.7.2.3): the Clip3(−tC, tC)
  *    Δ on p0/q0 with the ap/aq-gated tC widening and the p1/q1
  *    secondary taps (luma only; chroma uses tC0 + 1 and touches only
  *    p0/q0);
  *  - the strong (bS = 4) filter (8.7.2.4): the 3-tap/5-tap luma smoothing
  *    under the ap/aq and |p0−q0| < (α>>2)+2 gates with the weak fallback,
  *    and the fixed 2-tap chroma form;
  *  - the 8.7 edge ordering: macroblocks in raster order, each filtering
  *    its vertical edges left-to-right (the left picture edge excluded)
  *    and then its horizontal edges top-to-bottom, IN PLACE, so every
  *    filter input is exactly the partially-filtered frame the spec
  *    prescribes (left-edge filtering reaches 3 samples into the already-
  *    completed left neighbor; chroma edges inherit the bS of the
  *    co-located luma samples).
  *
  * `disable_deblocking_filter_idc = 2` (filter on, slice boundaries
  * excluded) is SEMANTICALLY REAL since round 14: multi-slice P pictures
  * carry a per-MB slice id in [[PicInfo]], and the MB-edge loop skips
  * boundary edges whose two sides sit in different slices (q247). On
  * single-slice pictures idc 2 remains identical to 0, as the spec says.
  *
  * Verification boundary, stated plainly (the [[H264Cavlc]] contract): the
  * container has no external H.264 decoder, so Tables 8-16/8-17 are
  * transcribed from the published standard and gated in-repo by their
  * structural invariants (monotonicity along both the QP and bS axes,
  * pinned endpoint anchors) plus the q238 oracle, whose probe pixels
  * DuckDB recomputes from the spec's gate/clip arithmetic independently of
  * this Scala — a filter-arithmetic slip cannot hash-match; a table-value
  * slip at a probed index would have to be identical in both transcripts.
  *
  * The reference repo has no video surface (SURVEY.md §2.11); built from
  * the public spec alone, like the rest of the family.
  */
object H264Deblock {

  // ------------------------------------------------------------- tables ---

  /** Table 8-16: α as a function of indexA. */
  private[ops] val alphaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144,
    162, 182, 203, 226, 255, 255)

  /** Table 8-16: β as a function of indexB. */
  private[ops] val betaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15,
    16, 16, 17, 17, 18, 18)

  /** Table 8-17: t'C0 as a function of (bS − 1, indexA). */
  private[ops] val tc0Tab: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8,
      9, 10, 11, 13),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
      2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11,
      12, 13, 15, 17),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
      3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
      18, 20, 23, 25))

  // -------------------------------------------------- per-picture metadata ---

  /** Per-macroblock decode facts the bS derivation (8.7.2.1) and the QP
    * averaging (8.7.2.2) need, recorded by the slice decoders as they go.
    * `qp` is the macroblock's QP_Y with the 8.7.2 I_PCM override already
    * applied (0). `nz` marks luma 4x4 blocks carrying residual
    * coefficients (TotalCoeff > 0); it only matters on inter-inter edges —
    * intra edges are bS ≥ 3 regardless. `mvx`/`mvy`/`ref` are the luma
    * motion vector (quarter units) and L0 reference index PER 4x4 CELL —
    * cell-granular since 16x8/8x16 partitions landed, so partition-
    * internal edges get the 8.7.2.1 motion/reference tests too.
    */
  private[ops] final class PicInfo(val mbsX: Int, val mbsY: Int) {
    /** Slice index per MB (0 on single-slice pictures) and the idc-2
      * flag: when set, [[filter]] skips MB edges whose two sides belong
      * to different slices (8.7: disable_deblocking_filter_idc == 2).
      */
    val sliceId = Array.ofDim[Int](mbsY, mbsX)
    var excludeSliceEdges = false
    val intra = Array.ofDim[Boolean](mbsY, mbsX)
    val pcm = Array.ofDim[Boolean](mbsY, mbsX)
    val qp = Array.ofDim[Int](mbsY, mbsX)
    val nz = Array.ofDim[Boolean](mbsY * 4, mbsX * 4)
    val mvx = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    val mvy = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    val ref = Array.ofDim[Int](mbsY * 4, mbsX * 4)
    /** Fill a partition's motion cells. */
    def fillMv(gx: Int, gy: Int, w4: Int, h4: Int,
        x: Int, y: Int, refIdx: Int): Unit = {
      var j = 0
      while (j < h4) {
        var i = 0
        while (i < w4) {
          mvx(gy + j)(gx + i) = x; mvy(gy + j)(gx + i) = y
          ref(gy + j)(gx + i) = refIdx
          i += 1
        }
        j += 1
      }
    }
  }

  // ------------------------------------------------------------ helpers ---

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Boundary strength (8.7.2.1, frame macroblocks) for the edge between
    * the luma 4x4 blocks at frame-grid (pgx, pgy) and (qgx, qgy).
    */
  private def bS(info: PicInfo, pgx: Int, pgy: Int, qgx: Int, qgy: Int): Int = {
    val pMbX = pgx >> 2; val pMbY = pgy >> 2
    val qMbX = qgx >> 2; val qMbY = qgy >> 2
    if (info.intra(pMbY)(pMbX) || info.intra(qMbY)(qMbX)) {
      if (pMbX == qMbX && pMbY == qMbY) 3 else 4
    } else if (info.nz(pgy)(pgx) || info.nz(qgy)(qgx)) 2
    else if (info.ref(pgy)(pgx) != info.ref(qgy)(qgx)) 1 // different ref pictures
    else {
      val dx = info.mvx(pgy)(pgx) - info.mvx(qgy)(qgx)
      val dy = info.mvy(pgy)(pgx) - info.mvy(qgy)(qgx)
      if (dx >= 4 || dx <= -4 || dy >= 4 || dy <= -4) 1 else 0
    }
  }

  /** One luma line across an edge (8.7.2.3 / 8.7.2.4). `s` holds
    * [p3, p2, p1, p0, q0, q1, q2, q3]; filtered samples are written back
    * in place, all derived from the line's ORIGINAL values.
    */
  private def lumaLine(s: Array[Int], bs: Int, idxA: Int, idxB: Int): Unit = {
    val alpha = alphaTab(idxA); val beta = betaTab(idxB)
    val p3 = s(0); val p2 = s(1); val p1 = s(2); val p0 = s(3)
    val q0 = s(4); val q1 = s(5); val q2 = s(6); val q3 = s(7)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    val ap = math.abs(p2 - p0); val aq = math.abs(q2 - q0)
    if (bs < 4) {
      val t0 = tc0Tab(bs - 1)(idxA)
      val tc = t0 + (if (ap < beta) 1 else 0) + (if (aq < beta) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      s(3) = clip255(p0 + delta)
      s(4) = clip255(q0 - delta)
      if (ap < beta)
        s(2) = p1 + clip3(-t0, t0, (p2 + ((p0 + q0 + 1) >> 1) - (p1 << 1)) >> 1)
      if (aq < beta)
        s(5) = q1 + clip3(-t0, t0, (q2 + ((p0 + q0 + 1) >> 1) - (q1 << 1)) >> 1)
    } else {
      val small = math.abs(p0 - q0) < (alpha >> 2) + 2
      if (ap < beta && small) {
        s(3) = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
        s(2) = (p2 + p1 + p0 + q0 + 2) >> 2
        s(1) = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
      } else s(3) = (2 * p1 + p0 + q1 + 2) >> 2
      if (aq < beta && small) {
        s(4) = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
        s(5) = (q2 + q1 + q0 + p0 + 2) >> 2
        s(6) = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
      } else s(4) = (2 * q1 + q0 + p1 + 2) >> 2
    }
  }

  /** One chroma line across an edge: `s` = [p1, p0, q0, q1]; only p0/q0
    * are ever modified (8.7.2.3 with chromaEdgeFlag = 1 uses tC0 + 1;
    * 8.7.2.4 uses the fixed 2-tap form).
    */
  private def chromaLine(s: Array[Int], bs: Int, idxA: Int, idxB: Int): Unit = {
    val alpha = alphaTab(idxA); val beta = betaTab(idxB)
    val p1 = s(0); val p0 = s(1); val q0 = s(2); val q1 = s(3)
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
      math.abs(q1 - q0) >= beta) return
    if (bs < 4) {
      val tc = tc0Tab(bs - 1)(idxA) + 1
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      s(1) = clip255(p0 + delta)
      s(2) = clip255(q0 - delta)
    } else {
      s(1) = (2 * p1 + p0 + q1 + 2) >> 2
      s(2) = (2 * q1 + q0 + p1 + 2) >> 2
    }
  }

  // ------------------------------------------------------------- filter ---

  /** Filter one decoded picture in place. `offA`/`offB` are FilterOffsetA/B
    * (the slice-header div2 values already doubled, 8.7.2.2);
    * `chromaQpOff` is the PPS chroma_qp_index_offset. Luma QP per
    * macroblock comes from `info.qp` (0 for I_PCM); chroma QP is the
    * Table 8-15 mapping of it, averaged per edge exactly like luma.
    */
  private[ops] def filter(luma: Array[Array[Int]], cb: Array[Array[Int]],
      cr: Array[Array[Int]], info: PicInfo, offA: Int, offB: Int,
      chromaQpOff: Int): Unit = {
    val mbsX = info.mbsX; val mbsY = info.mbsY
    def qpL(gx: Int, gy: Int): Int = info.qp(gy >> 2)(gx >> 2)
    def qpC(gx: Int, gy: Int): Int =
      H264Cavlc.chromaQp(clip3(0, 51, qpL(gx, gy) + chromaQpOff))
    val s8 = new Array[Int](8)
    val s4 = new Array[Int](4)

    /** Filter the 4-sample luma segment between blocks (pgx,pgy)/(qgx,qgy);
      * `vertical` edges read rows, horizontal edges read columns.
      */
    def lumaSeg(pgx: Int, pgy: Int, qgx: Int, qgy: Int, vertical: Boolean): Unit = {
      val bs = bS(info, pgx, pgy, qgx, qgy)
      if (bs == 0) return
      val av = (qpL(pgx, pgy) + qpL(qgx, qgy) + 1) >> 1
      val idxA = clip3(0, 51, av + offA)
      val idxB = clip3(0, 51, av + offB)
      var k = 0
      while (k < 4) {
        if (vertical) {
          val y = qgy * 4 + k; val x = qgx * 4
          var i = 0
          while (i < 8) { s8(i) = luma(y)(x - 4 + i); i += 1 }
          lumaLine(s8, bs, idxA, idxB)
          i = 0
          while (i < 8) { luma(y)(x - 4 + i) = s8(i); i += 1 }
        } else {
          val x = qgx * 4 + k; val y = qgy * 4
          var i = 0
          while (i < 8) { s8(i) = luma(y - 4 + i)(x); i += 1 }
          lumaLine(s8, bs, idxA, idxB)
          i = 0
          while (i < 8) { luma(y - 4 + i)(x) = s8(i); i += 1 }
        }
        k += 1
      }
    }

    /** Filter the 2-sample chroma segment (both planes) co-located with the
      * luma block pair (pgx,pgy)/(qgx,qgy): chroma edge coordinate =
      * luma/2, two chroma lines per luma 4x4 segment (4:2:0).
      */
    def chromaSeg(pgx: Int, pgy: Int, qgx: Int, qgy: Int, vertical: Boolean): Unit = {
      val bs = bS(info, pgx, pgy, qgx, qgy)
      if (bs == 0) return
      val av = (qpC(pgx, pgy) + qpC(qgx, qgy) + 1) >> 1
      val idxA = clip3(0, 51, av + offA)
      val idxB = clip3(0, 51, av + offB)
      var c = 0
      while (c < 2) {
        val plane = if (c == 0) cb else cr
        var k = 0
        while (k < 2) {
          if (vertical) {
            val y = qgy * 2 + k; val x = qgx * 2
            var i = 0
            while (i < 4) { s4(i) = plane(y)(x - 2 + i); i += 1 }
            chromaLine(s4, bs, idxA, idxB)
            i = 0
            while (i < 4) { plane(y)(x - 2 + i) = s4(i); i += 1 }
          } else {
            val x = qgx * 2 + k; val y = qgy * 2
            var i = 0
            while (i < 4) { s4(i) = plane(y - 2 + i)(x); i += 1 }
            chromaLine(s4, bs, idxA, idxB)
            i = 0
            while (i < 4) { plane(y - 2 + i)(x) = s4(i); i += 1 }
          }
          k += 1
        }
        c += 1
      }
    }

    var mbY = 0
    while (mbY < mbsY) {
      var mbX = 0
      while (mbX < mbsX) {
        // idc 2: the MB-boundary edge (e == 0) is skipped when the two
        // sides sit in different slices; internal edges always filter
        def sameSliceLeft: Boolean = !info.excludeSliceEdges ||
          info.sliceId(mbY)(mbX) == info.sliceId(mbY)(mbX - 1)
        def sameSliceUp: Boolean = !info.excludeSliceEdges ||
          info.sliceId(mbY)(mbX) == info.sliceId(mbY - 1)(mbX)
        // vertical edges, left to right (luma x offsets 0,4,8,12; chroma
        // edges co-locate with luma offsets 0 and 8)
        var e = 0
        while (e < 4) {
          if (e > 0 || (mbX > 0 && sameSliceLeft)) {
            val qgx = mbX * 4 + e
            var g = 0
            while (g < 4) {
              val gy = mbY * 4 + g
              lumaSeg(qgx - 1, gy, qgx, gy, vertical = true)
              g += 1
            }
            if ((e & 1) == 0) {
              g = 0
              while (g < 4) {
                val gy = mbY * 4 + g
                chromaSeg(qgx - 1, gy, qgx, gy, vertical = true)
                g += 1
              }
            }
          }
          e += 1
        }
        // horizontal edges, top to bottom
        e = 0
        while (e < 4) {
          if (e > 0 || (mbY > 0 && sameSliceUp)) {
            val qgy = mbY * 4 + e
            var g = 0
            while (g < 4) {
              val gx = mbX * 4 + g
              lumaSeg(gx, qgy - 1, gx, qgy, vertical = false)
              g += 1
            }
            if ((e & 1) == 0) {
              g = 0
              while (g < 4) {
                val gx = mbX * 4 + g
                chromaSeg(gx, qgy - 1, gx, qgy, vertical = false)
                g += 1
              }
            }
          }
          e += 1
        }
        mbX += 1
      }
      mbY += 1
    }
  }
}
