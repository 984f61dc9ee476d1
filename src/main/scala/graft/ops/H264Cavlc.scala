package graft.ops

import H264.{BitReader, BitWriter}

/** Pure-JVM H.264 baseline **intra-frame CAVLC codec** — the predicted-
  * macroblock layer VERDICT r10 item 4 asked for, behind the bitstream
  * layer [[H264]] already provides (Annex-B framing, Exp-Golomb, SPS/PPS/
  * slice headers, I_PCM). With this module the engine natively decodes
  * I slices containing Intra_4x4 / Intra_16x16 predicted macroblocks with
  * CAVLC residuals — real compressed video structure, not just PCM.
  *
  * What is implemented, per the public spec (ITU-T Rec. H.264, clauses
  * cited inline):
  *  - CAVLC entropy decode AND encode (9.2): coeff_token (Table 9-5, all
  *    four nC classes + the nC ≥ 8 FLC), trailing-one signs, level
  *    prefix/suffix with adaptive suffixLength (9.2.2.1), total_zeros
  *    (Tables 9-7/9-8 for 4x4, 9-9(a) for 4:2:0 chroma DC), run_before
  *    (Table 9-10), and the 9.2.4 coefficient-array reconstruction;
  *  - the zig-zag scan (8.5.6), flat-matrix dequantization (8.5.9 with
  *    the default 16-weight scaling folded out), the 4x4 integer inverse
  *    transform (8.5.12.2, bit-exact shift/rounding sequence), the 4x4
  *    luma-DC inverse Hadamard + scaling (8.5.10) and the 2x2 chroma-DC
  *    transform (8.5.11);
  *  - intra prediction: all four Intra_16x16 modes (8.3.3), all nine
  *    Intra_4x4 modes with the 8.3.1.2 sample-substitution rules, all
  *    four chroma modes with per-sub-block DC derivation (8.3.4);
  *  - the I-slice macroblock layer (7.3.5): mb_type, per-block 4x4 pred
  *    mode prediction (8.3.1.1), the me(v) coded_block_pattern mapping
  *    (Table 9-4, intra column), mb_qp_delta tracking, the 7.4.5/9.2.1
  *    nC neighbor derivation over the frame's 4x4 grid, and mixed
  *    I_PCM / Intra_4x4 / Intra_16x16 macroblocks in one slice.
  *
  * Verification boundary, stated plainly: the container has no external
  * H.264 decoder (zero egress), so the VLC code tables are transcribed
  * from the published standard and gated in-repo three ways — prefix-
  * freeness of every table (a transcription slip that merges codewords
  * breaks unique decodability and the spec catches it), encode→decode
  * round-trip fuzz over randomized residuals in every nC class, and the
  * q235 oracle, whose expected pixel values DuckDB computes from the
  * spec's dequant/IDCT/prediction arithmetic independently of this
  * Scala — a Scala-side math error cannot hash-match the oracle. The
  * NAL/SPS/slice layers underneath are the q233-proven ones any external
  * decoder accepts.
  *
  * The reference repo has no video surface (SURVEY.md §2.11); this is
  * built from the public spec alone, like [[H264]].
  */
object H264Cavlc {

  // ----------------------------------------------------------- scan order ---

  /** Zig-zag scan (8.5.6): scan index → (row, col) within the 4x4 block. */
  private[ops] val zigzag: Array[(Int, Int)] = Array(
    (0, 0), (0, 1), (1, 0), (2, 0),
    (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (3, 1), (2, 2),
    (1, 3), (2, 3), (3, 2), (3, 3))

  /** 4x4 luma block decoding order (6.4.3 inverse scan): blkIdx → (bx, by)
    * block coords within the macroblock.
    */
  private[graft] val blk4x4: Array[(Int, Int)] = Array(
    (0, 0), (1, 0), (0, 1), (1, 1),
    (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3),
    (2, 2), (3, 2), (2, 3), (3, 3))

  /** 9.2.1 nC from a TotalCoeff grid at frame-global 4x4 coords (gx, gy):
    * round-up average when left and top both exist, the available one
    * otherwise, 0 at the frame corner. ONE definition shared by both
    * codecs' encoders and decoders (luma and chroma grids alike) so the
    * availability semantics can never diverge between them.
    */
  private[ops] def ncAt(grid: Array[Array[Int]], gx: Int, gy: Int): Int = {
    val a = if (gx > 0) grid(gy)(gx - 1) else -1
    val b = if (gy > 0) grid(gy - 1)(gx) else -1
    if (a >= 0 && b >= 0) (a + b + 1) >> 1 else if (a >= 0) a else if (b >= 0) b else 0
  }

  // -------------------------------------------------------- dequantization ---

  /** Flat-scaling dequant multipliers V(m, pos-class) (8.5.9 normAdjust4x4
    * with the default weightScale 16 folded out): class A = positions
    * (0,0),(0,2),(2,0),(2,2); class B = (1,1),(1,3),(3,1),(3,3); class C =
    * the rest. d = c · V · 2^(qp/6) feeds the 8.5.12.2 inverse transform,
    * whose final (x+32)>>6 restores the scale.
    */
  private[ops] val dqA = Array(10, 11, 13, 14, 16, 18)
  private[ops] val dqB = Array(16, 18, 20, 23, 25, 29)
  private[ops] val dqC = Array(13, 14, 16, 18, 20, 23)

  /** V for raster position (row, col) at qp%6 = m. */
  private[ops] def dequantV(m: Int, row: Int, col: Int): Int = {
    val re = (row & 1) == 0; val ce = (col & 1) == 0
    if (re && ce) dqA(m) else if (!re && !ce) dqB(m) else dqC(m)
  }

  /** Dequantize one 4x4 block of zigzag-ordered levels into a raster
    * residual-coefficient matrix. `acOnly` shifts the scan by one (the
    * Intra16x16 AC blocks carry zigzag positions 1..15) and leaves d(0,0)
    * for the caller (the Hadamard-propagated DC).
    */
  private[ops] def dequant4x4(levels: Array[Int], qp: Int, acOnly: Boolean): Array[Array[Int]] = {
    val m = qp % 6; val shift = qp / 6
    val d = Array.ofDim[Int](4, 4)
    val base = if (acOnly) 1 else 0
    var i = 0
    while (i < levels.length) {
      val (row, col) = zigzag(base + i)
      d(row)(col) = levels(i) * dequantV(m, row, col) << shift
      i += 1
    }
    d
  }

  /** Luma DC scaling after the inverse Hadamard (8.5.10, flat weights
    * folded): qp ≥ 12 → f·V_A << (qp/6 − 2) exactly; below, the spec's
    * rounding form.
    */
  private[ops] def scaleLumaDc(f: Int, qp: Int): Int = {
    val v = dqA(qp % 6)
    if (qp >= 12) (f * v) << (qp / 6 - 2)
    else (f * v + (1 << (1 - qp / 6))) >> (2 - qp / 6)
  }

  /** Chroma DC scaling after the 2x2 transform (8.5.11, flat weights
    * folded): ((f·V_A) << (qp/6)) >> 1.
    */
  private[ops] def scaleChromaDc(f: Int, qp: Int): Int =
    ((f * dqA(qp % 6)) << (qp / 6)) >> 1

  /** Chroma QP from luma QP (Table 8-15; chroma_qp_index_offset applied
    * by the caller).
    */
  private[ops] def chromaQp(qpi: Int): Int = {
    val q = math.max(0, math.min(51, qpi))
    if (q < 30) q
    else Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
      38, 38, 38, 39, 39, 39, 39)(q - 30)
  }

  // ------------------------------------------------------ inverse transforms ---

  /** 4x4 inverse integer transform (8.5.12.2): horizontal then vertical
    * butterflies with the embedded >>1, final (x + 32) >> 6.
    */
  private[ops] def idct4x4(d: Array[Array[Int]]): Array[Array[Int]] = {
    val f = Array.ofDim[Int](4, 4)
    var i = 0
    while (i < 4) { // horizontal, per row
      val e0 = d(i)(0) + d(i)(2)
      val e1 = d(i)(0) - d(i)(2)
      val e2 = (d(i)(1) >> 1) - d(i)(3)
      val e3 = d(i)(1) + (d(i)(3) >> 1)
      f(i)(0) = e0 + e3; f(i)(1) = e1 + e2; f(i)(2) = e1 - e2; f(i)(3) = e0 - e3
      i += 1
    }
    val r = Array.ofDim[Int](4, 4)
    var j = 0
    while (j < 4) { // vertical, per column
      val g0 = f(0)(j) + f(2)(j)
      val g1 = f(0)(j) - f(2)(j)
      val g2 = (f(1)(j) >> 1) - f(3)(j)
      val g3 = f(1)(j) + (f(3)(j) >> 1)
      r(0)(j) = (g0 + g3 + 32) >> 6; r(1)(j) = (g1 + g2 + 32) >> 6
      r(2)(j) = (g1 - g2 + 32) >> 6; r(3)(j) = (g0 - g3 + 32) >> 6
      j += 1
    }
    r
  }

  /** 4x4 inverse Hadamard for the Intra16x16 luma DC block (8.5.10). */
  private[ops] def ihadamard4x4(c: Array[Array[Int]]): Array[Array[Int]] = {
    val f = Array.ofDim[Int](4, 4)
    var i = 0
    while (i < 4) {
      val e0 = c(i)(0) + c(i)(2); val e1 = c(i)(0) - c(i)(2)
      val e2 = c(i)(1) - c(i)(3); val e3 = c(i)(1) + c(i)(3)
      f(i)(0) = e0 + e3; f(i)(1) = e1 + e2; f(i)(2) = e1 - e2; f(i)(3) = e0 - e3
      i += 1
    }
    val out = Array.ofDim[Int](4, 4)
    var j = 0
    while (j < 4) {
      val g0 = f(0)(j) + f(2)(j); val g1 = f(0)(j) - f(2)(j)
      val g2 = f(1)(j) - f(3)(j); val g3 = f(1)(j) + f(3)(j)
      out(0)(j) = g0 + g3; out(1)(j) = g1 + g2; out(2)(j) = g1 - g2; out(3)(j) = g0 - g3
      j += 1
    }
    out
  }

  /** 2x2 chroma DC inverse transform (8.5.11). */
  private[ops] def ihadamard2x2(c: Array[Int]): Array[Int] = Array(
    c(0) + c(1) + c(2) + c(3), c(0) - c(1) + c(2) - c(3),
    c(0) + c(1) - c(2) - c(3), c(0) - c(1) - c(2) + c(3))

  // ------------------------------------------------------------ VLC tables ---

  /** One VLC table: value → (codeLength, codeValue). */
  private type Vlc = Array[(Int, Int)]

  /** coeff_token (Table 9-5), indexed [TotalCoeff 0..16][TrailingOnes 0..3]
    * (entries with T1s > TotalCoeff or T1s > 3 are unused). Four contexts:
    * 0 ≤ nC < 2, 2 ≤ nC < 4, 4 ≤ nC < 8, and nC == −1 (4:2:0 chroma DC,
    * TotalCoeff ≤ 4). nC ≥ 8 is the 6-bit FLC handled in code.
    */
  private val ctTable02: Array[Array[(Int, Int)]] = Array(
    Array((1, 1), null, null, null),
    Array((6, 5), (2, 1), null, null),
    Array((8, 7), (6, 4), (3, 1), null),
    Array((9, 7), (8, 6), (7, 5), (5, 3)),
    Array((10, 7), (9, 6), (8, 5), (6, 3)),
    Array((11, 7), (10, 6), (9, 5), (7, 4)),
    Array((13, 15), (11, 6), (10, 5), (8, 4)),
    Array((13, 11), (13, 14), (11, 5), (9, 4)),
    Array((13, 8), (13, 10), (13, 13), (10, 4)),
    Array((14, 15), (14, 14), (13, 9), (11, 4)),
    Array((14, 11), (14, 10), (14, 13), (13, 12)),
    Array((15, 15), (15, 14), (14, 9), (14, 12)),
    Array((15, 11), (15, 10), (15, 13), (14, 8)),
    Array((16, 15), (15, 1), (15, 9), (15, 12)),
    Array((16, 11), (16, 14), (16, 13), (15, 8)),
    Array((16, 7), (16, 10), (16, 9), (16, 12)),
    Array((16, 4), (16, 6), (16, 5), (16, 8)))

  private val ctTable24: Array[Array[(Int, Int)]] = Array(
    Array((2, 3), null, null, null),
    Array((6, 11), (2, 2), null, null),
    Array((6, 7), (5, 7), (3, 3), null),
    Array((7, 7), (6, 10), (6, 9), (4, 5)),
    Array((8, 7), (6, 6), (6, 5), (4, 4)),
    Array((8, 4), (7, 6), (7, 5), (5, 6)),
    Array((9, 7), (8, 6), (8, 5), (6, 8)),
    Array((11, 15), (9, 6), (9, 5), (6, 4)),
    Array((11, 11), (11, 14), (11, 13), (7, 4)),
    Array((12, 15), (11, 10), (11, 9), (9, 4)),
    Array((12, 11), (12, 14), (12, 13), (11, 12)),
    Array((12, 8), (12, 10), (12, 9), (11, 8)),
    Array((13, 15), (13, 14), (13, 13), (12, 12)),
    Array((13, 11), (13, 10), (13, 9), (13, 12)),
    Array((13, 7), (14, 11), (13, 6), (13, 8)),
    Array((14, 9), (14, 8), (14, 10), (13, 1)),
    Array((14, 7), (14, 6), (14, 5), (14, 4)))

  private val ctTable48: Array[Array[(Int, Int)]] = Array(
    Array((4, 15), null, null, null),
    Array((6, 15), (4, 14), null, null),
    Array((6, 11), (5, 15), (4, 13), null),
    Array((6, 8), (5, 12), (5, 14), (4, 12)),
    Array((7, 15), (5, 10), (5, 11), (4, 11)),
    Array((7, 11), (5, 8), (5, 9), (4, 10)),
    Array((7, 9), (6, 14), (6, 13), (4, 9)),
    Array((7, 8), (6, 10), (6, 9), (4, 8)),
    Array((8, 15), (7, 14), (7, 13), (5, 13)),
    Array((8, 11), (8, 14), (7, 10), (6, 12)),
    Array((9, 15), (8, 10), (8, 13), (7, 12)),
    Array((9, 11), (9, 14), (8, 9), (8, 12)),
    Array((9, 8), (9, 10), (9, 13), (8, 8)),
    Array((10, 13), (9, 7), (9, 9), (9, 12)),
    Array((10, 9), (10, 12), (10, 11), (10, 10)),
    Array((10, 5), (10, 8), (10, 7), (10, 6)),
    Array((10, 1), (10, 4), (10, 3), (10, 2)))

  private val ctChromaDc: Array[Array[(Int, Int)]] = Array(
    Array((2, 1), null, null, null),
    Array((6, 7), (1, 1), null, null),
    Array((6, 4), (6, 6), (3, 1), null),
    Array((6, 3), (7, 3), (7, 2), (6, 5)),
    Array((6, 2), (8, 3), (8, 2), (7, 0)))

  /** total_zeros for 4x4 blocks (Tables 9-7 and 9-8), indexed
    * [TotalCoeff 1..15] → [totalZeros 0..(16−TotalCoeff)] → (len, val).
    */
  private val tzTable: Array[Vlc] = Array(
    null, // TotalCoeff 0 never reads total_zeros
    Array((1, 1), (3, 3), (3, 2), (4, 3), (4, 2), (5, 3), (5, 2), (6, 3),
      (6, 2), (7, 3), (7, 2), (8, 3), (8, 2), (9, 3), (9, 2), (9, 1)),
    Array((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (4, 5), (4, 4), (4, 3),
      (4, 2), (5, 3), (5, 2), (6, 3), (6, 2), (6, 1), (6, 0)),
    Array((4, 5), (3, 7), (3, 6), (3, 5), (4, 4), (4, 3), (3, 4), (3, 3),
      (4, 2), (5, 3), (5, 2), (6, 1), (5, 1), (6, 0)),
    Array((5, 3), (3, 7), (4, 5), (4, 4), (3, 6), (3, 5), (3, 4), (4, 3),
      (3, 3), (4, 2), (5, 2), (5, 1), (5, 0)),
    Array((4, 5), (4, 4), (4, 3), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3),
      (4, 2), (5, 1), (4, 1), (5, 0)),
    Array((6, 1), (5, 1), (3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2),
      (4, 1), (3, 1), (6, 0)),
    Array((6, 1), (5, 1), (3, 5), (3, 4), (3, 3), (2, 3), (3, 2), (4, 1),
      (3, 1), (6, 0)),
    Array((6, 1), (4, 1), (5, 1), (3, 3), (2, 3), (2, 2), (3, 2), (3, 1),
      (6, 0)),
    Array((6, 1), (6, 0), (4, 1), (2, 3), (2, 2), (3, 1), (2, 1), (5, 1)),
    Array((5, 1), (5, 0), (3, 1), (2, 3), (2, 2), (2, 1), (4, 1)),
    Array((4, 0), (4, 1), (3, 1), (3, 2), (1, 1), (3, 3)),
    Array((4, 0), (4, 1), (2, 1), (1, 1), (3, 1)),
    Array((3, 0), (3, 1), (1, 1), (2, 1)),
    Array((2, 0), (2, 1), (1, 1)),
    Array((1, 0), (1, 1)))

  /** total_zeros for 4:2:0 chroma DC (Table 9-9(a)), [TotalCoeff 1..3]. */
  private val tzChromaDc: Array[Vlc] = Array(
    null,
    Array((1, 1), (2, 1), (3, 1), (3, 0)),
    Array((1, 1), (2, 1), (2, 0)),
    Array((1, 1), (1, 0)))

  /** run_before (Table 9-10), [min(zerosLeft,7) 1..7] → [run] → (len,val);
    * zerosLeft ≥ 7 extends with run 7..14 = (run−3)-bit '0…01'.
    */
  private val rbTable: Array[Vlc] = Array(
    null,
    Array((1, 1), (1, 0)),
    Array((1, 1), (2, 1), (2, 0)),
    Array((2, 3), (2, 2), (2, 1), (2, 0)),
    Array((2, 3), (2, 2), (2, 1), (3, 1), (3, 0)),
    Array((2, 3), (2, 2), (3, 3), (3, 2), (3, 1), (3, 0)),
    Array((2, 3), (3, 0), (3, 1), (3, 3), (3, 2), (3, 5), (3, 4)),
    Array((3, 7), (3, 6), (3, 5), (3, 4), (3, 3), (3, 2), (3, 1), (4, 1),
      (5, 1), (6, 1), (7, 1), (8, 1), (9, 1), (10, 1), (11, 1)))

  /** Decode one codeword against a (len,val) table; returns the index. */
  private def readVlc(r: BitReader, table: Vlc): Int = {
    var code = 0; var len = 0
    while (len < 16) {
      code = ((code << 1) | r.u(1).toInt); len += 1
      var i = 0
      while (i < table.length) {
        val e = table(i)
        if (e != null && e._1 == len && e._2 == code) return i
        i += 1
      }
    }
    throw new IllegalArgumentException("no VLC codeword matched in 16 bits")
  }

  /** Decode coeff_token → (TrailingOnes, TotalCoeff) for context nC. */
  private def readCoeffToken(r: BitReader, nC: Int): (Int, Int) = {
    if (nC >= 8) {
      val v = r.u(6).toInt
      if (v == 3) return (0, 0) // the 000011 escape for TotalCoeff 0
      val tc = (v >> 2) + 1; val t1 = v & 3
      require(t1 <= math.min(3, tc), s"bad FLC coeff_token $v")
      return (t1, tc)
    }
    val table =
      if (nC == -1) ctChromaDc
      else if (nC < 2) ctTable02
      else if (nC < 4) ctTable24
      else ctTable48
    var code = 0; var len = 0
    while (len < 16) {
      code = ((code << 1) | r.u(1).toInt); len += 1
      var tc = 0
      while (tc < table.length) {
        var t1 = 0
        while (t1 <= math.min(3, tc)) {
          val e = table(tc)(t1)
          if (e != null && e._1 == len && e._2 == code) return (t1, tc)
          t1 += 1
        }
        tc += 1
      }
    }
    throw new IllegalArgumentException(s"coeff_token: no codeword (nC=$nC)")
  }

  /** Encode coeff_token. */
  private def writeCoeffToken(w: BitWriter, nC: Int, t1s: Int, tc: Int): Unit = {
    if (nC >= 8) {
      if (tc == 0) w.u(3, 6)
      else w.u((((tc - 1) << 2) | t1s).toLong, 6)
      return
    }
    val table =
      if (nC == -1) ctChromaDc
      else if (nC < 2) ctTable02
      else if (nC < 4) ctTable24
      else ctTable48
    val e = table(tc)(t1s)
    require(e != null, s"coeff_token has no entry for tc=$tc t1s=$t1s")
    w.u(e._2.toLong, e._1)
  }

  // --------------------------------------------------- residual block codec ---

  /** Decode residual_block_cavlc (9.2): returns the zigzag-ordered
    * coefficient array (length maxCoeff) and TotalCoeff.
    */
  private[ops] def decodeResidual(r: BitReader, nC: Int, maxCoeff: Int): (Array[Int], Int) = {
    val (t1s, tc) = readCoeffToken(r, nC)
    val coeffs = new Array[Int](maxCoeff)
    if (tc == 0) return (coeffs, 0)
    require(tc <= maxCoeff, s"TotalCoeff $tc > maxNumCoeff $maxCoeff")
    // levels, highest frequency first
    val levels = new Array[Int](tc)
    var i = 0
    while (i < t1s) { // trailing one signs
      levels(i) = if (r.u(1) == 1) -1 else 1
      i += 1
    }
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    while (i < tc) {
      var prefix = 0
      while (r.u(1) == 0) {
        prefix += 1
        require(prefix <= 19, "level_prefix too long (corrupt stream)")
      }
      val suffixSize =
        if (prefix == 14 && suffixLength == 0) 4
        else if (prefix >= 15) prefix - 3
        else suffixLength
      var levelCode = (math.min(15, prefix) << suffixLength) +
        (if (suffixSize > 0) r.u(suffixSize).toInt else 0)
      if (prefix >= 15 && suffixLength == 0) levelCode += 15
      if (prefix >= 16) levelCode += (1 << (prefix - 3)) - 4096
      if (i == t1s && t1s < 3) levelCode += 2
      levels(i) =
        if ((levelCode & 1) == 0) (levelCode + 2) >> 1 else -((levelCode + 1) >> 1)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(levels(i)) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    // total_zeros
    val totalZeros =
      if (tc == maxCoeff) 0
      else if (maxCoeff == 4) readVlc(r, tzChromaDc(tc))
      else readVlc(r, tzTable(tc))
    // runs + placement (9.2.4): walk from the highest-frequency coefficient
    var zerosLeft = totalZeros
    var idx = tc - 1 + totalZeros
    i = 0
    while (i < tc) {
      coeffs(idx) = levels(i)
      val run =
        if (i == tc - 1) zerosLeft // last (lowest-frequency) coefficient
        else if (zerosLeft == 0) 0
        else {
          val t = rbTable(math.min(zerosLeft, 7))
          val v = readVlc(r, t)
          require(v <= zerosLeft, s"run_before $v > zerosLeft $zerosLeft")
          v
        }
      zerosLeft -= run
      idx -= 1 + run
      i += 1
    }
    (coeffs, tc)
  }

  /** Encode a zigzag-ordered coefficient array (length = maxNumCoeff) as
    * residual_block_cavlc; returns TotalCoeff for nC bookkeeping. Levels
    * must stay within the non-escape coding range (|levelCode| < 15·2^6 —
    * far above anything the planted streams use).
    */
  private[ops] def encodeResidual(w: BitWriter, coeffs: Array[Int], nC: Int): Int = {
    val maxCoeff = coeffs.length
    val nz = coeffs.zipWithIndex.filter(_._1 != 0)
    val tc = nz.length
    require(tc <= maxCoeff)
    var t1s = 0
    while (t1s < math.min(3, tc) && math.abs(nz(tc - 1 - t1s)._1) == 1) t1s += 1
    writeCoeffToken(w, nC, t1s, tc)
    if (tc == 0) return 0
    // trailing one signs, highest frequency first
    var i = 0
    while (i < t1s) {
      w.u(if (nz(tc - 1 - i)._1 < 0) 1 else 0, 1)
      i += 1
    }
    var suffixLength = if (tc > 10 && t1s < 3) 1 else 0
    while (i < tc) {
      val level = nz(tc - 1 - i)._1
      var levelCode = if (level > 0) 2 * (level - 1) else -2 * level - 1
      if (i == t1s && t1s < 3) {
        levelCode -= 2
        require(levelCode >= 0, "first non-T1 level must have |level| >= 2")
      }
      if (suffixLength == 0) {
        if (levelCode < 14) w.u(1, levelCode + 1) // levelCode zeros + stop
        else if (levelCode < 30) { w.u(1, 15); w.u((levelCode - 14).toLong, 4) }
        else { w.u(1, 16); w.u((levelCode - 30).toLong, 12) }
      } else {
        if (levelCode < (15 << suffixLength)) {
          val prefix = levelCode >> suffixLength
          w.u(1, prefix + 1)
          w.u((levelCode & ((1 << suffixLength) - 1)).toLong, suffixLength)
        } else {
          val rem = levelCode - (15 << suffixLength)
          require(rem < 4096, s"level $level beyond the supported escape range")
          w.u(1, 16); w.u(rem.toLong, 12)
        }
      }
      // suffix adaptation mirrors the decoder exactly (it sees this level)
      if (suffixLength == 0) suffixLength = 1
      if (math.abs(level) > (3 << (suffixLength - 1)) && suffixLength < 6)
        suffixLength += 1
      i += 1
    }
    val lastIdx = nz(tc - 1)._2
    val totalZeros = lastIdx + 1 - tc
    if (tc < maxCoeff) {
      val e = if (maxCoeff == 4) tzChromaDc(tc)(totalZeros) else tzTable(tc)(totalZeros)
      w.u(e._2.toLong, e._1)
    }
    // run_before per coefficient, highest frequency first
    var zerosLeft = totalZeros
    i = tc - 1
    var prevIdx = lastIdx
    while (i > 0 && zerosLeft > 0) {
      val curIdx = nz(i - 1)._2
      val run = prevIdx - curIdx - 1
      val t = rbTable(math.min(zerosLeft, 7))
      val e = t(run)
      w.u(e._2.toLong, e._1)
      zerosLeft -= run
      prevIdx = curIdx
      i -= 1
    }
    tc
  }

  // --------------------------------------------------------- intra prediction ---

  private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Intra_16x16 / chroma-plane style prediction over a full block of size
    * `n` at plane position (x0, y0). `mode`: 0=V, 1=H, 2=DC, 3=Plane for
    * luma 16x16 (8.3.3); chroma uses its own mode numbering mapped by the
    * caller. Writes predictions into `out`.
    */
  private def predictBlockNxN(plane: Array[Array[Int]], x0: Int, y0: Int, n: Int,
      mode: Int, leftAvail: Boolean, topAvail: Boolean,
      out: Array[Array[Int]]): Unit = mode match {
    case 0 => // vertical
      require(topAvail, "Intra NxN vertical prediction needs the top neighbor")
      var y = 0
      while (y < n) { var x = 0; while (x < n) { out(y)(x) = plane(y0 - 1)(x0 + x); x += 1 }; y += 1 }
    case 1 => // horizontal
      require(leftAvail, "Intra NxN horizontal prediction needs the left neighbor")
      var y = 0
      while (y < n) { val v = plane(y0 + y)(x0 - 1); var x = 0; while (x < n) { out(y)(x) = v; x += 1 }; y += 1 }
    case 2 => // DC
      var sum = 0; var cnt = 0
      if (topAvail) { var x = 0; while (x < n) { sum += plane(y0 - 1)(x0 + x); x += 1 }; cnt += n }
      if (leftAvail) { var y = 0; while (y < n) { sum += plane(y0 + y)(x0 - 1); y += 1 }; cnt += n }
      val dc = if (cnt == 0) 128 else (sum + cnt / 2) / cnt
      var y = 0
      while (y < n) { var x = 0; while (x < n) { out(y)(x) = dc; x += 1 }; y += 1 }
    case 3 => // plane (8.3.3.4 for n=16; 8.3.4.4 shape for n=8)
      require(leftAvail && topAvail, "plane prediction needs both neighbors")
      val half = n / 2
      var h = 0; var v = 0
      var i = 1
      while (i <= half) {
        h += i * (plane(y0 - 1)(x0 + half - 1 + i) - plane(y0 - 1)(x0 + half - 1 - i))
        v += i * (plane(y0 + half - 1 + i)(x0 - 1) - plane(y0 + half - 1 - i)(x0 - 1))
        i += 1
      }
      // spec constants: 16x16 → b=(5h+32)>>6; 8x8 chroma → b=(17h+16)>>5
      val (b, c) =
        if (n == 16) (((5 * h + 32) >> 6), ((5 * v + 32) >> 6))
        else (((17 * h + 16) >> 5), ((17 * v + 16) >> 5))
      val a = 16 * (plane(y0 + n - 1)(x0 - 1) + plane(y0 - 1)(x0 + n - 1))
      var y = 0
      while (y < n) {
        var x = 0
        while (x < n) {
          out(y)(x) = clip255((a + b * (x - half + 1) + c * (y - half + 1) + 16) >> 5)
          x += 1
        }
        y += 1
      }
    case m => throw new IllegalArgumentException(s"bad NxN intra mode $m")
  }

  /** Chroma DC prediction with the 8.3.4.1 per-4x4-sub-block rules: corner
    * sub-blocks average both edges; (1,0) prefers top, (0,1) prefers left.
    */
  private def predictChromaDc(plane: Array[Array[Int]], x0: Int, y0: Int,
      leftAvail: Boolean, topAvail: Boolean, out: Array[Array[Int]]): Unit = {
    def sumTop(sx: Int) = (0 until 4).map(i => plane(y0 - 1)(x0 + sx + i)).sum
    def sumLeft(sy: Int) = (0 until 4).map(i => plane(y0 + sy + i)(x0 - 1)).sum
    for (by <- 0 until 2; bx <- 0 until 2) {
      val useTop = topAvail && (by == 0 || !leftAvail || (bx == 1 && by == 1))
      val useLeft = leftAvail && (bx == 0 || !topAvail || (bx == 1 && by == 1))
      // 8.3.4.1: sub-block (1,0) uses top only when available; (0,1) left
      // only when available; corners (0,0)/(1,1) use whatever exists
      val (s, cnt) =
        if (bx == 1 && by == 0 && topAvail) (sumTop(4), 4)
        else if (bx == 0 && by == 1 && leftAvail) (sumLeft(4), 4)
        else {
          var acc = 0; var c = 0
          if (useTop) { acc += sumTop(bx * 4); c += 4 }
          if (useLeft) { acc += sumLeft(by * 4); c += 4 }
          (acc, c)
        }
      val dc = if (cnt == 0) 128 else (s + cnt / 2) / cnt
      for (y <- 0 until 4; x <- 0 until 4) out(by * 4 + y)(bx * 4 + x) = dc
    }
  }

  /** Intra_4x4 prediction (8.3.1.2), all nine modes, with the top-right
    * substitution rule. (x0, y0) locate the 4x4 block in the luma plane;
    * availability flags describe the block's immediate neighbors.
    */
  private[ops] def predict4x4(plane: Array[Array[Int]], x0: Int, y0: Int, mode: Int,
      leftAvail: Boolean, topAvail: Boolean, topLeftAvail: Boolean,
      topRightAvail: Boolean): Array[Array[Int]] = {
    val p = Array.ofDim[Int](4, 4)
    // neighbor samples: t(0..7) above, l(0..3) left, tl corner
    val t = new Array[Int](8)
    if (topAvail) {
      var x = 0
      while (x < 4) { t(x) = plane(y0 - 1)(x0 + x); x += 1 }
      while (x < 8) {
        t(x) = if (topRightAvail) plane(y0 - 1)(x0 + x) else t(3) // 8.3.1.2 substitution
        x += 1
      }
    }
    val l = new Array[Int](4)
    if (leftAvail) { var y = 0; while (y < 4) { l(y) = plane(y0 + y)(x0 - 1); y += 1 } }
    val tl = if (topLeftAvail) plane(y0 - 1)(x0 - 1) else 0
    // extended accessors: index −1 is the corner sample (modes 4/5/6 reach
    // it through their t/l index arithmetic — 8.3.1.2.4-6)
    def tE(i: Int): Int = if (i < 0) tl else t(i)
    def lE(i: Int): Int = if (i < 0) tl else l(i)
    def need(c: Boolean, what: String): Unit =
      require(c, s"intra4x4 mode $mode needs $what")
    mode match {
      case 0 => // Vertical
        need(topAvail, "top")
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = t(x)
      case 1 => // Horizontal
        need(leftAvail, "left")
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = l(y)
      case 2 => // DC
        val v =
          if (topAvail && leftAvail) (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (leftAvail) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else if (topAvail) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else 128
        for (y <- 0 until 4; x <- 0 until 4) p(y)(x) = v
      case 3 => // Diagonal down-left
        need(topAvail, "top")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y)(x) =
            if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
            else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
      case 4 => // Diagonal down-right
        need(topAvail && leftAvail && topLeftAvail, "top+left+corner")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y)(x) =
            if (x > y) (tE(x - y - 2) + 2 * tE(x - y - 1) + tE(x - y) + 2) >> 2
            else if (x < y) (lE(y - x - 2) + 2 * lE(y - x - 1) + lE(y - x) + 2) >> 2
            else (t(0) + 2 * tl + l(0) + 2) >> 2
      case 5 => // Vertical-right
        need(topAvail && leftAvail && topLeftAvail, "top+left+corner")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * x - y
          p(y)(x) =
            if (z >= 0 && z % 2 == 0) (tE(x - (y >> 1) - 1) + tE(x - (y >> 1)) + 1) >> 1
            else if (z >= 0) (tE(x - (y >> 1) - 2) + 2 * tE(x - (y >> 1) - 1) + tE(x - (y >> 1)) + 2) >> 2
            else if (z == -1) (l(0) + 2 * tl + t(0) + 2) >> 2
            else (lE(y - 2 * x - 1) + 2 * lE(y - 2 * x - 2) + lE(y - 2 * x - 3) + 2) >> 2
        }
      case 6 => // Horizontal-down
        need(topAvail && leftAvail && topLeftAvail, "top+left+corner")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = 2 * y - x
          p(y)(x) =
            if (z >= 0 && z % 2 == 0) (lE(y - (x >> 1) - 1) + lE(y - (x >> 1)) + 1) >> 1
            else if (z >= 0) (lE(y - (x >> 1) - 2) + 2 * lE(y - (x >> 1) - 1) + lE(y - (x >> 1)) + 2) >> 2
            else if (z == -1) (t(0) + 2 * tl + l(0) + 2) >> 2
            else (tE(x - 2 * y - 1) + 2 * tE(x - 2 * y - 2) + tE(x - 2 * y - 3) + 2) >> 2
        }
      case 7 => // Vertical-left
        need(topAvail, "top")
        for (y <- 0 until 4; x <- 0 until 4)
          p(y)(x) =
            if (y % 2 == 0) (t(x + (y >> 1)) + t(x + (y >> 1) + 1) + 1) >> 1
            else (t(x + (y >> 1)) + 2 * t(x + (y >> 1) + 1) + t(x + (y >> 1) + 2) + 2) >> 2
      case 8 => // Horizontal-up
        need(leftAvail, "left")
        for (y <- 0 until 4; x <- 0 until 4) {
          val z = x + 2 * y
          p(y)(x) =
            if (z > 5) l(3)
            else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
            else if (z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
            else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2
        }
      case m => throw new IllegalArgumentException(s"bad intra4x4 mode $m")
    }
    p
  }

  // --------------------------------------------------------- CBP me(v) map ---

  /** Table 9-4, intra column: codeNum → coded_block_pattern. */
  private[ops] val cbpIntra: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)

  private val cbpIntraInv: Map[Int, Int] =
    cbpIntra.zipWithIndex.map { case (cbp, code) => cbp -> code }.toMap

  // -------------------------------------------------------- macroblock plans ---

  /** A planted macroblock for the test-stream encoder. Levels are QUANTIZED
    * coefficients in zigzag order (the values CAVLC carries); the decoder's
    * dequant/IDCT/prediction turns them into pixels.
    */
  sealed trait MbPlan
  /** Intra_16x16: predMode 0=V 1=H 2=DC 3=Plane; `dc` is the 16-entry
    * zigzag-scanned luma DC (Hadamard-domain) block; `ac` (16 blocks ×
    * 15 zigzag AC levels) requires cbpLuma=15 semantics when any nonzero.
    * `qpDelta` is this MB's mb_qp_delta. Chroma: optional planted DC
    * levels (2 components × 4) with cbpChroma=1 semantics.
    */
  final case class I16x16(predMode: Int, dc: Array[Int],
      ac: Array[Array[Int]] = null, qpDelta: Int = 0,
      chromaDc: Array[Array[Int]] = null) extends MbPlan
  /** Intra_4x4: 16 per-block pred modes (blkIdx order), per-block 16-entry
    * zigzag levels, an explicit luma CBP (4 bits, one per 8x8), optional
    * chroma DC levels (cbpChroma=1).
    */
  final case class I4x4(modes: Array[Int], levels: Array[Array[Int]],
      cbpLuma: Int, qpDelta: Int = 0,
      chromaDc: Array[Array[Int]] = null) extends MbPlan
  /** I_PCM with a constant luma value (chroma gray). */
  final case class Pcm(luma: Int) extends MbPlan
  /** I_PCM with explicit per-sample luma (16 rows × 16 cols, 0–255) and a
    * flat chroma fill — lets a planted I frame carry an arbitrary plane
    * (e.g. the gradient+impulse reference the inter oracle interpolates).
    */
  final case class PcmBlock(samples: Array[Array[Int]],
      chroma: Int = 128) extends MbPlan

  // ------------------------------------------------------------- encoder ---

  /** Encode planted I-slice frames (one slice per picture) at the given
    * slice QP into a conformant Annex-B stream: SPS + PPS + one IDR/I
    * slice per frame. Frame dims are mbsX·16 × mbsY·16; `frames` hold
    * mbsX·mbsY MbPlans in raster order. `deblockIdc` is the slice
    * disable_deblocking_filter_idc (1 = filter off, the historical
    * default every pre-round-13 stream signals; 0/2 = filter on, with
    * `aOffD2`/`bOffD2` as slice_alpha_c0_offset_div2 /
    * slice_beta_offset_div2).
    */
  def encodeIntra(mbsX: Int, mbsY: Int, qp: Int,
      frames: Seq[Seq[MbPlan]], deblockIdc: Int = 1,
      aOffD2: Int = 0, bOffD2: Int = 0): Array[Byte] = {
    require(qp >= 12 && qp <= 51, s"planted-stream QP $qp outside [12,51]")
    val out = new java.io.ByteArrayOutputStream()
    H264.writeNal(out, 3, 7,
      H264.writeSps(H264.Sps(66, 20, 4, 2, mbsX, mbsY, 0, 0, frameMbsOnly = true, maxNumRefFrames = 0)))
    H264.writeNal(out, 3, 8, H264.writePps())
    frames.zipWithIndex.foreach { case (mbs, k) =>
      val w = new BitWriter
      w.ue(0)            // first_mb_in_slice
      w.ue(7)            // slice_type = I (all)
      w.ue(0)            // pps id
      w.u(0, 4)          // frame_num
      w.ue(k % 2)        // idr_pic_id
      w.u(0, 1); w.u(0, 1) // dec_ref_pic_marking
      w.se(qp - 26)      // slice_qp_delta (pic_init_qp is 26)
      w.ue(deblockIdc)   // disable_deblocking_filter_idc
      if (deblockIdc != 1) { w.se(aOffD2); w.se(bOffD2) }
      writeISliceMbs(w, mbsX, mbsY, mbs)
      w.trailingBits()
      H264.writeNal(out, 3, 5, w.toBytes)
    }
    out.toByteArray
  }

  /** Write one I slice's macroblock data (everything after the slice
    * header) for planted MBs — shared by [[encodeIntra]] and
    * [[H264Inter.encodeStream]] (whose reference pictures may now be
    * full intra-CAVLC frames, not just I_PCM).
    */
  private[ops] def writeISliceMbs(w: BitWriter, mbsX: Int, mbsY: Int,
      mbs: Seq[MbPlan]): Unit = {
      require(mbs.length == mbsX * mbsY, "frame must plant every MB")
      val nctx = Array.fill(mbsY * 4, mbsX * 4)(0) // luma TotalCoeff grid
      val cctx = Array.fill(2, mbsY * 2, mbsX * 2)(0) // chroma grids
      // frame-level 4x4 mode grid + I4x4 flags: mode prediction (8.3.1.1)
      // must match the decoder even across adjacent I4x4 macroblocks
      val modeGrid = Array.fill(mbsY * 4, mbsX * 4)(2)
      val isI4x4 = Array.fill(mbsY, mbsX)(false)
      // (no encoder-side qp tracking: levels are planted already-quantized,
      // and CAVLC level coding is QP-independent; only the DECODER needs
      // the running QP_Y, for dequant)
      mbs.zipWithIndex.foreach { case (plan, mbIdx) =>
        val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
        def lumaNC(bx: Int, by: Int): Int =
          ncAt(nctx, mbX * 4 + bx, mbY * 4 + by)
        def chromaNC(c: Int, bx: Int, by: Int): Int =
          ncAt(cctx(c), mbX * 2 + bx, mbY * 2 + by)
        def setLuma(bx: Int, by: Int, tc: Int): Unit =
          nctx(mbY * 4 + by)(mbX * 4 + bx) = tc
        def setChroma(c: Int, bx: Int, by: Int, tc: Int): Unit =
          cctx(c)(mbY * 2 + by)(mbX * 2 + bx) = tc
        def writeChroma(chromaDc: Array[Array[Int]]): Unit = {
          if (chromaDc != null) {
            var c = 0
            while (c < 2) {
              encodeResidual(w, chromaDc(c).padTo(4, 0).take(4), -1)
              c += 1
            }
            // cbpChroma==1: DC only, no chroma AC; AC nC grids stay 0
          }
        }
        // ONE I_PCM emission (7.3.5: mb_type 25, alignment, 256 luma +
        // 128 chroma samples, every nC total 16) for both PCM plan shapes
        def writePcmMb(luma: Int => Int => Int, chroma: Int): Unit = {
          w.ue(25)
          w.alignZero()
          var i = 0
          while (i < 256) { w.u((luma(i / 16)(i % 16) & 0xff).toLong, 8); i += 1 }
          i = 0
          while (i < 128) { w.u((chroma & 0xff).toLong, 8); i += 1 }
          for (by <- 0 until 4; bx <- 0 until 4) setLuma(bx, by, 16)
          for (c <- 0 until 2; by <- 0 until 2; bx <- 0 until 2) setChroma(c, bx, by, 16)
        }
        plan match {
          case Pcm(g) =>
            writePcmMb(_ => _ => g, 128)
          case p: PcmBlock =>
            require(p.samples.length == 16 && p.samples.forall(_.length == 16),
              "PcmBlock needs a 16x16 luma block")
            writePcmMb(y => x => p.samples(y)(x), p.chroma)
          case p: I16x16 =>
            val hasAc = p.ac != null && p.ac.exists(_.exists(_ != 0))
            val cbpChroma = if (p.chromaDc != null) 1 else 0
            val mbType = 1 + p.predMode + 4 * cbpChroma + (if (hasAc) 12 else 0)
            w.ue(mbType)
            w.ue(0)            // intra_chroma_pred_mode = DC
            w.se(p.qpDelta)
            // Intra16x16DCLevel: nC of luma blk 0
            encodeResidual(w, p.dc.padTo(16, 0).take(16), lumaNC(0, 0))
            // NOTE (7.4.5 / 9.2.1): the DC block does not set the 4x4 grid;
            // AC TotalCoeffs do. With cbpLuma=0 the grid entries stay 0.
            if (hasAc) {
              var b = 0
              while (b < 16) {
                val (bx, by) = blk4x4(b)
                val lv = (if (p.ac(b) == null) Array.empty[Int] else p.ac(b)).padTo(15, 0).take(15)
                val tc = encodeResidual(w, lv, lumaNC(bx, by))
                setLuma(bx, by, tc)
                b += 1
              }
            }
            writeChroma(p.chromaDc)
          case p: I4x4 =>
            require(p.modes.length == 16 && p.levels.length == 16)
            w.ue(0) // I_NxN
            isI4x4(mbY)(mbX) = true
            // pred modes, blkIdx order, against the 8.3.1.1 predicted mode
            var b = 0
            while (b < 16) {
              val (bx, by) = blk4x4(b)
              def nbMode(dx: Int, dy: Int): Int = {
                val gx = mbX * 4 + bx + dx; val gy = mbY * 4 + by + dy
                if (gx < 0 || gy < 0) 2 // frame edge → DC
                else if (!isI4x4(gy / 4)(gx / 4)) 2 // non-I4x4 neighbor → DC
                else modeGrid(gy)(gx)
              }
              val predicted = math.min(nbMode(-1, 0), nbMode(0, -1))
              val mode = p.modes(b)
              if (mode == predicted) w.u(1, 1)
              else {
                w.u(0, 1)
                w.u((if (mode < predicted) mode else mode - 1).toLong, 3)
              }
              modeGrid(mbY * 4 + by)(mbX * 4 + bx) = mode
              b += 1
            }
            w.ue(0) // intra_chroma_pred_mode = DC
            val cbpChroma = if (p.chromaDc != null) 1 else 0
            val cbp = p.cbpLuma | (cbpChroma << 4)
            w.ue(cbpIntraInv(cbp))
            if (cbp > 0) {
              w.se(p.qpDelta)
              b = 0
              while (b < 16) {
                val (bx, by) = blk4x4(b)
                if ((p.cbpLuma & (1 << (b / 4))) != 0) {
                  val lv = (if (p.levels(b) == null) Array.empty[Int] else p.levels(b)).padTo(16, 0).take(16)
                  val tc = encodeResidual(w, lv, lumaNC(bx, by))
                  setLuma(bx, by, tc)
                }
                b += 1
              }
              writeChroma(p.chromaDc)
            }
        }
      }
  }

  // ------------------------------------------------------------- decoder ---

  /** Decode every I slice of an Annex-B stream whose macroblocks are
    * Intra_4x4 / Intra_16x16 (CAVLC) or I_PCM; returns one luma plane per
    * picture (the [[H264.decodePcmFrames]] shape, now for predicted MBs).
    * Chroma is fully parsed (bit alignment depends on it) and
    * reconstructed into internal planes. Baseline constraints enforced
    * loudly: CAVLC entropy, pic_order_cnt_type 2, one slice per picture,
    * no cropping.
    */
  def decodeIntraFrames(annexB: Array[Byte]): Seq[Array[Array[Int]]] = {
    val nals = H264.splitNals(annexB)
    val sps = nals.collectFirst { case (7, _, rbsp) => H264.parseSps(rbsp) }
      .getOrElse(throw new IllegalArgumentException("no SPS in stream"))
    require(sps.cropX == 0 && sps.cropY == 0, "intra decoder: cropping unsupported")
    require(sps.picOrderCntType == 2,
      "intra decoder: pic_order_cnt_type must be 2 (as the PCM decoder)")
    require(sps.frameMbsOnly,
      "intra decoder: interlaced (field) streams unsupported — slice" +
        " headers would carry an unparsed field_pic_flag")
    // PPS: entropy mode + init QP + chroma offset are load-bearing
    val ppsId = H264.requireSingleParamSets(nals, "intra decoder")
    val pps = nals.collectFirst { case (8, _, rbsp) => rbsp }
      .getOrElse(throw new IllegalArgumentException("no PPS in stream"))
    val (initQp, chromaOff, deblock) = {
      val r = new BitReader(pps)
      r.ue(); r.ue()
      require(r.u(1) == 0,
        "intra decoder: CABAC stream — use H264Cabac.decodeIntraFrames")
      r.u(1);
      require(r.ue() == 0, "intra decoder: slice groups unsupported")
      r.ue(); r.ue(); r.u(1); r.u(2)
      val q = r.se() + 26
      r.se()
      val co = r.se()
      (q, co, r.u(1) == 1) // deblocking_filter_control_present_flag
    }
    val mbsX = sps.widthMbs; val mbsY = sps.heightMbs
    nals.filter(n => n._1 == 1 || n._1 == 5).map { case (nalType, refIdc, rbsp) =>
      val r = new BitReader(rbsp)
      require(r.ue() == 0, "intra decoder: one slice per picture")
      val sliceType = r.ue()
      require(sliceType % 5 == 2, s"not an I slice: slice_type $sliceType")
      H264.requireSlicePps(r.ue(), ppsId, "intra decoder")
      r.u(sps.log2MaxFrameNum)
      if (nalType == 5) r.ue()
      if (nalType == 5) { r.u(1); r.u(1) }
      else if (refIdc != 0)
        // MMCO syntax follows when set; skipping it would shift every later
        // read (silent mis-decode) — loud rejection instead
        require(r.u(1) == 0, "intra decoder: adaptive ref marking (MMCO) " +
          "unsupported — external decoder (MediaDecoder seam)")
      val sliceQp = initQp + r.se()
      val (filterOn, offA, offB) = H264.sliceDeblocking(r, deblock)
      val luma = Array.ofDim[Int](mbsY * 16, mbsX * 16)
      val cb = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val cr = Array.ofDim[Int](mbsY * 8, mbsX * 8)
      val info = if (filterOn) new H264Deblock.PicInfo(mbsX, mbsY) else null
      decodeISliceMbs(r, mbsX, mbsY, sliceQp, chromaOff, luma, cb, cr, info)
      if (filterOn) H264Deblock.filter(luma, cb, cr, info, offA, offB, chromaOff)
      luma
    }
  }

  /** Decode one I slice's macroblock data (everything after the slice
    * header) into the given planes — Intra_4x4 / Intra_16x16 (CAVLC) and
    * I_PCM macroblocks. Shared by [[decodeIntraFrames]] and
    * [[H264Inter.decodeFrames]], whose P pictures may reference a full
    * intra-CAVLC picture (luma AND chroma land in the caller's planes).
    * When `info` is non-null (the slice enables the loop filter) the
    * per-MB facts the [[H264Deblock]] bS/QP derivations need are recorded.
    *
    * I_PCM conformance note (7.4.5): an I_PCM macroblock's QP_Y is 0, and
    * that 0 is the QP_Y,prev the NEXT macroblock's mb_qp_delta predicts
    * from — conformance-tested decoders (ffmpeg, openh264) agree. Planted
    * streams that code a residual-carrying MB after an I_PCM MB must
    * carry a compensating delta ([[qpRestoreDelta]]).
    */
  private[ops] def decodeISliceMbs(r: BitReader, mbsX: Int, mbsY: Int,
      sliceQp: Int, chromaOff: Int, luma: Array[Array[Int]],
      cb: Array[Array[Int]], cr: Array[Array[Int]],
      info: H264Deblock.PicInfo = null): Unit = {
      var qpY = sliceQp
      val nctx = Array.fill(mbsY * 4, mbsX * 4)(0)
      val cctx = Array.fill(2, mbsY * 2, mbsX * 2)(0)
      val mbIsI4x4 = Array.fill(mbsY, mbsX)(false)
      val mode4x4 = Array.fill(mbsY * 4, mbsX * 4)(2) // DC default for non-I4x4
      var mbIdx = 0
      while (mbIdx < mbsX * mbsY) {
        val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
        val leftAvail = mbX > 0; val topAvail = mbY > 0
        def lumaNC(bx: Int, by: Int): Int =
          ncAt(nctx, mbX * 4 + bx, mbY * 4 + by)
        def chromaNC(c: Int, bx: Int, by: Int): Int =
          ncAt(cctx(c), mbX * 2 + bx, mbY * 2 + by)
        def setLuma(bx: Int, by: Int, tc: Int): Unit =
          nctx(mbY * 4 + by)(mbX * 4 + bx) = tc
        def setChroma(c: Int, bx: Int, by: Int, tc: Int): Unit =
          cctx(c)(mbY * 2 + by)(mbX * 2 + bx) = tc

        /** cbpChroma ∈ {0,1,2}: parse chroma DC (+AC) and reconstruct via
          * the shared entropy-agnostic [[reconChroma]].
          */
        def decodeChroma(cbpChroma: Int, chromaPredMode: Int): Unit = {
          val qpc = chromaQp(qpY + chromaOff)
          val dcLevels = Array.ofDim[Int](2, 4)
          if (cbpChroma > 0) {
            var c = 0
            while (c < 2) {
              val (lv, _) = decodeResidual(r, -1, 4)
              dcLevels(c) = lv
              c += 1
            }
          }
          val acLevels = Array.ofDim[Int](2, 4, 15)
          if (cbpChroma == 2) {
            var c = 0
            while (c < 2) {
              var b = 0
              while (b < 4) {
                val bx = b % 2; val by = b / 2
                val (lv, tc) = decodeResidual(r, chromaNC(c, bx, by), 15)
                acLevels(c)(b) = lv
                setChroma(c, bx, by, tc)
                b += 1
              }
              c += 1
            }
          }
          reconChroma(cb, cr, mbX, mbY, chromaPredMode, dcLevels, acLevels,
            qpc, leftAvail, topAvail)
        }

        val mbType = r.ue()
        if (mbType == 25) { // I_PCM
          r.alignToByte(0) // pcm_alignment_zero_bit (7.3.5)
          val x0 = mbX * 16; val y0 = mbY * 16
          var i = 0
          while (i < 256) {
            luma(y0 + i / 16)(x0 + i % 16) = r.u(8).toInt
            i += 1
          }
          i = 0
          while (i < 64) { cb(mbY * 8 + i / 8)(mbX * 8 + i % 8) = r.u(8).toInt; i += 1 }
          i = 0
          while (i < 64) { cr(mbY * 8 + i / 8)(mbX * 8 + i % 8) = r.u(8).toInt; i += 1 }
          for (by <- 0 until 4; bx <- 0 until 4) setLuma(bx, by, 16)
          for (c <- 0 until 2; by <- 0 until 2; bx <- 0 until 2) setChroma(c, bx, by, 16)
          qpY = 0 // 7.4.5: I_PCM sets QP_Y to 0, feeding the next delta
        } else if (mbType == 0) { // I_NxN = Intra_4x4
          mbIsI4x4(mbY)(mbX) = true
          val modes = new Array[Int](16)
          var b = 0
          while (b < 16) {
            val (bx, by) = blk4x4(b)
            def nbMode(dx: Int, dy: Int): Int = {
              val gx = mbX * 4 + bx + dx; val gy = mbY * 4 + by + dy
              if (gx < 0 || gy < 0) return 2 // frame edge → DC (8.3.1.1)
              val nMbX = gx / 4; val nMbY = gy / 4
              if (nMbX != mbX || nMbY != mbY) {
                if (!mbIsI4x4(nMbY)(nMbX)) 2 else mode4x4(gy)(gx)
              } else mode4x4(gy)(gx) // already decoded within this MB
            }
            val predicted = math.min(nbMode(-1, 0), nbMode(0, -1))
            val mode =
              if (r.u(1) == 1) predicted
              else {
                val rem = r.u(3).toInt
                if (rem < predicted) rem else rem + 1
              }
            modes(b) = mode
            mode4x4(mbY * 4 + by)(mbX * 4 + bx) = mode
            b += 1
          }
          val chromaPredMode = r.ue()
          val codeNum = r.ue()
          require(codeNum < 48, s"bad coded_block_pattern code $codeNum")
          val cbp = cbpIntra(codeNum)
          val cbpLuma = cbp & 15; val cbpChroma = cbp >> 4
          if (cbp > 0) qpY = (qpY + r.se() + 52) % 52
          // per-block: parse residual (if coded), then the shared
          // entropy-agnostic reconstruction — in blkIdx order so later
          // blocks predict from decoded samples
          b = 0
          while (b < 16) {
            val (bx, by) = blk4x4(b)
            val levels =
              if ((cbpLuma & (1 << (b / 4))) != 0) {
                val (lv, tc) = decodeResidual(r, lumaNC(bx, by), 16)
                setLuma(bx, by, tc)
                lv
              } else { setLuma(bx, by, 0); new Array[Int](16) }
            reconI4x4Block(luma, mbsX, mbX, mbY, b, modes(b), levels, qpY)
            b += 1
          }
          decodeChroma(cbpChroma, chromaPredMode)
        } else { // Intra_16x16 (mb_type 1..24)
          require(mbType >= 1 && mbType <= 24, s"bad I-slice mb_type $mbType")
          val m = mbType - 1
          val predMode = m % 4
          val cbpChroma = (m / 4) % 3
          val cbpLuma = if (m >= 12) 15 else 0
          val chromaPredMode = r.ue()
          qpY = (qpY + r.se() + 52) % 52
          val (dcLevels, _) = decodeResidual(r, lumaNC(0, 0), 16)
          val acLevels = Array.ofDim[Int](16, 15)
          if (cbpLuma == 15) {
            var b = 0
            while (b < 16) {
              val (bx, by) = blk4x4(b)
              val (lv, tc) = decodeResidual(r, lumaNC(bx, by), 15)
              acLevels(b) = lv
              setLuma(bx, by, tc)
              b += 1
            }
          } else {
            for (by <- 0 until 4; bx <- 0 until 4) setLuma(bx, by, 0)
          }
          reconI16x16(luma, mbX, mbY, predMode, dcLevels, acLevels, qpY,
            leftAvail, topAvail)
          decodeChroma(cbpChroma, chromaPredMode)
        }
        if (info != null) {
          info.intra(mbY)(mbX) = true
          info.pcm(mbY)(mbX) = mbType == 25
          info.qp(mbY)(mbX) = qpY // 0 for I_PCM (just set above)
          // per-4x4 nz is irrelevant on intra edges (bS >= 3 regardless)
          // but recorded for uniformity with the inter path
          var by = 0
          while (by < 4) {
            var bx = 0
            while (bx < 4) {
              info.nz(mbY * 4 + by)(mbX * 4 + bx) =
                nctx(mbY * 4 + by)(mbX * 4 + bx) > 0
              bx += 1
            }
            by += 1
          }
        }
        mbIdx += 1
      }
  }

  /** The mb_qp_delta that restores slice QP `qp` right after an I_PCM
    * macroblock (whose QP_Y is 0): mb_qp_delta ∈ [−26, 25], so QPs above
    * 25 wrap through the 7-37 modulo.
    */
  def qpRestoreDelta(qp: Int): Int = if (qp <= 25) qp else qp - 52

  // ------------------------------------- entropy-agnostic reconstruction ---
  // The parse→pixels seam: everything below takes PARSED (zigzag) levels,
  // so the CAVLC decoder above and the CABAC decoder ([[H264Cabac]]) share
  // ONE prediction/dequant/transform implementation — the one the q235
  // oracle proves.

  /** Reconstruct an Intra_16x16 macroblock's luma plane from parsed
    * levels: `dcLevels` is the 16-entry zigzag Hadamard-domain DC block,
    * `acLevels` 16 blocks × 15 zigzag AC levels (all-zero when
    * CodedBlockPatternLuma is 0).
    */
  private[ops] def reconI16x16(luma: Array[Array[Int]], mbX: Int, mbY: Int,
      predMode: Int, dcLevels: Array[Int], acLevels: Array[Array[Int]],
      qpY: Int, leftAvail: Boolean, topAvail: Boolean): Unit = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val pred = Array.ofDim[Int](16, 16)
    predictBlockNxN(luma, x0, y0, 16, predMode, leftAvail, topAvail, pred)
    val dcIn = Array.ofDim[Int](4, 4)
    var i = 0
    while (i < 16) {
      val (row, col) = zigzag(i)
      dcIn(row)(col) = dcLevels(i)
      i += 1
    }
    val dcT = ihadamard4x4(dcIn)
    var b = 0
    while (b < 16) {
      val (bx, by) = blk4x4(b)
      val d = dequant4x4(acLevels(b), qpY, acOnly = true)
      d(0)(0) = scaleLumaDc(dcT(by)(bx), qpY)
      val res = idct4x4(d)
      var y = 0
      while (y < 4) {
        var x = 0
        while (x < 4) {
          luma(y0 + by * 4 + y)(x0 + bx * 4 + x) =
            clip255(pred(by * 4 + y)(bx * 4 + x) + res(y)(x))
          x += 1
        }
        y += 1
      }
      b += 1
    }
  }

  /** Reconstruct ONE Intra_4x4 luma block (blkIdx `b`, mode `mode`) from
    * its parsed 16-entry zigzag levels. Must be called in blkIdx order —
    * later blocks predict from the samples this writes. `mbsX` bounds the
    * 6.4.11.4 top-right availability.
    */
  private[ops] def reconI4x4Block(luma: Array[Array[Int]], mbsX: Int,
      mbX: Int, mbY: Int, b: Int, mode: Int, levels: Array[Int],
      qpY: Int): Unit = {
    val (bx, by) = blk4x4(b)
    val px = mbX * 16 + bx * 4; val py = mbY * 16 + by * 4
    val gx = mbX * 4 + bx; val gy = mbY * 4 + by
    val blkLeft = gx > 0
    val blkTop = gy > 0
    val blkTopLeft = gx > 0 && gy > 0
    // top-right: available iff in-frame AND decoded before this block
    // (6.4.11.4) — within the MB, a lower blkIdx; outside, any MB above
    // this row is already decoded
    val trInFrame = gy > 0 && gx + 1 < mbsX * 4
    val blkTopRight = trInFrame && {
      val tMbX = (gx + 1) / 4; val tMbY = (gy - 1) / 4
      if (tMbY < mbY || (tMbY == mbY && tMbX < mbX)) true
      else if (tMbY == mbY && tMbX == mbX) {
        val lx = (gx + 1) % 4; val ly = (gy - 1) % 4
        blk4x4.indexOf((lx, ly)) < b
      } else false
    }
    val pred = predict4x4(luma, px, py, mode,
      blkLeft, blkTop, blkTopLeft, blkTopRight)
    val d = dequant4x4(levels, qpY, acOnly = false)
    val res = idct4x4(d)
    var y = 0
    while (y < 4) {
      var x = 0
      while (x < 4) {
        luma(py + y)(px + x) = clip255(pred(y)(x) + res(y)(x))
        x += 1
      }
      y += 1
    }
  }

  /** Reconstruct both chroma 8x8 blocks of a macroblock from parsed DC
    * (2 components × 4 zigzag) and AC (2 × 4 blocks × 15 zigzag) levels
    * at chroma QP `qpc`.
    */
  private[ops] def reconChroma(cb: Array[Array[Int]], cr: Array[Array[Int]],
      mbX: Int, mbY: Int, chromaPredMode: Int, dcLevels: Array[Array[Int]],
      acLevels: Array[Array[Array[Int]]], qpc: Int,
      leftAvail: Boolean, topAvail: Boolean): Unit = {
    val planes = Array(cb, cr)
    var c = 0
    while (c < 2) {
      val plane = planes(c)
      val x0 = mbX * 8; val y0 = mbY * 8
      val pred = Array.ofDim[Int](8, 8)
      chromaPredMode match {
        case 0 => predictChromaDc(plane, x0, y0, leftAvail, topAvail, pred)
        case 1 => predictBlockNxN(plane, x0, y0, 8, 1, leftAvail, topAvail, pred)
        case 2 => predictBlockNxN(plane, x0, y0, 8, 0, leftAvail, topAvail, pred)
        case 3 => predictBlockNxN(plane, x0, y0, 8, 3, leftAvail, topAvail, pred)
        case m => throw new IllegalArgumentException(s"bad chroma mode $m")
      }
      val dct = ihadamard2x2(dcLevels(c))
      var b = 0
      while (b < 4) {
        val bx = b % 2; val by = b / 2
        val d = dequant4x4(acLevels(c)(b), qpc, acOnly = true)
        d(0)(0) = scaleChromaDc(dct(b), qpc)
        val res = idct4x4(d)
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            plane(y0 + by * 4 + y)(x0 + bx * 4 + x) =
              clip255(pred(by * 4 + y)(bx * 4 + x) + res(y)(x))
            x += 1
          }
          y += 1
        }
        b += 1
      }
      c += 1
    }
  }

  // -------------------------------------------------- table sanity exports ---

  /** Every VLC table as (name, entries) for the prefix-freeness spec. */
  private[ops] def allTables: Seq[(String, Seq[(Int, Int)])] = {
    def flat(t: Array[Array[(Int, Int)]]) = t.flatMap(_.filter(_ != null)).toSeq
    Seq(
      "coeff_token[0<=nC<2]" -> flat(ctTable02),
      "coeff_token[2<=nC<4]" -> flat(ctTable24),
      "coeff_token[4<=nC<8]" -> flat(ctTable48),
      "coeff_token[chromaDC]" -> flat(ctChromaDc)) ++
      tzTable.zipWithIndex.collect { case (t, i) if t != null =>
        s"total_zeros[tc=$i]" -> t.toSeq
      } ++
      tzChromaDc.zipWithIndex.collect { case (t, i) if t != null =>
        s"total_zeros_chroma[tc=$i]" -> t.toSeq
      } ++
      rbTable.zipWithIndex.collect { case (t, i) if t != null =>
        s"run_before[zl=$i]" -> t.toSeq
      }
  }
}
