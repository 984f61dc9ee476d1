package graft.ops

/** Pure-JVM H.264 (ITU-T Rec. H.264 / MPEG-4 AVC) bitstream layer and a
  * constrained-baseline I_PCM codec — the THIRD real video codec through
  * [[Multimodal.MediaDecoder]] (MJPEG q121/q229, raw DIB q230).
  *
  * What is REAL here (all per the public spec, clause numbers cited):
  *  - Annex-B byte-stream framing: 4-byte start codes, NAL header
  *    (forbidden bit / nal_ref_idc / nal_unit_type), and emulation-
  *    prevention bytes (7.3.1, 7.4.1.1: `00 00 03` escaping of RBSP);
  *  - Exp-Golomb entropy coding: ue(v)/se(v) reader AND writer (9.1);
  *  - SPS parsing/writing with the actual field layout (7.3.2.1.1):
  *    profile/constraint/level bytes, log2_max_frame_num, pic order cnt
  *    type, MB-grid dimensions, frame_mbs_only, cropping window;
  *  - PPS (7.3.2.2) and IDR slice headers (7.3.3) with CAVLC entropy
  *    mode, dec_ref_pic_marking, slice_qp_delta;
  *  - macroblock layer (7.3.5) for I slices with **I_PCM macroblocks**
  *    (mb_type 25, 7.4.5): alignment bits + raw 4:2:0 samples. I_PCM is
  *    not a toy — it is a normative macroblock type every conformant
  *    decoder must implement (it bounds worst-case compressed size), and
  *    the encoder below emits streams any external H.264 decoder
  *    (ffmpeg, JCodec) decodes bit-exactly.
  *
  * The SUBSET boundary of THIS module, stated plainly: predicted
  * macroblock types are not decoded here — intra-CAVLC I slices live in
  * [[H264Cavlc]] (q235), inter prediction in [[H264Inter]] (P 16x16 /
  * 16x8 / 8x16 / skip with multi-reference DPB q240, explicit weighted
  * prediction q242, B 16x16 q241, P_8x8 sub-partitions q245, short-term
  * ref-list modification q246, multi-slice P pictures q247), CABAC-coded
  * slices in [[H264Cabac]] (I q239, P incl. P_8x8 q244/q245 — with the
  * documented init-constant caveat), and the 8.7 loop filter in
  * [[H264Deblock]] (q238, in-loop); what remains external (CABAC B
  * slices, direct-mode B, weighted bipred, multi-slice I/B pictures,
  * long-term references / MMCO, P_8x8ref0, interlace, externally-encoded
  * CABAC) still exits through [[Multimodal.MediaDecoder]]
  * (MediaDecoderSeamSpec pins that seam). Emitted slices signal
  * disable_deblocking_filter_idc = 1
  * by default, so external decoders skip the loop filter and reproduce
  * the filter-less reconstructions bit-exactly; filter-enabled streams
  * (idc 0/2) decode natively since round 13.
  *
  * What this module buys at 100 TB: the NAL/SPS layer means REAL
  * H.264 payloads get true metadata (dimensions from the SPS, frame
  * counts from slice NALs) with zero external dependencies — metadata
  * filters prune without a codec — and the PCM path gives the multimodal
  * family a lossless, conformance-shaped video round trip to oracle-test
  * the full Spark plumbing against (q233).
  *
  * Reference behavior surveyed from the reference repo's media handling
  * (SURVEY.md §2.11); no reference code exists for video — this is
  * built from the public spec alone.
  */
object H264 {

  // ------------------------------------------------------------ bit I/O ---

  /** MSB-first bit writer with Exp-Golomb (9.1) support. */
  private[ops] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def u(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { out.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    /** ue(v): leadingZeroBits zeros, 1, then codeNum+1's low bits. */
    def ue(v: Int): Unit = {
      require(v >= 0)
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(0, len - 1); u(code.toLong, len)
    }
    /** se(v): signed mapping (9.1.1): k>0 → 2k-1, k<=0 → -2k. */
    def se(v: Int): Unit = ue(if (v > 0) 2 * v - 1 else -2 * v)
    def byteAligned: Boolean = nbits == 0
    def alignZero(): Unit = while (!byteAligned) u(0, 1)
    /** rbsp_trailing_bits (7.3.2.11): stop bit then zero-fill. */
    def trailingBits(): Unit = { u(1, 1); alignZero() }
    def toBytes: Array[Byte] = { require(byteAligned); out.toByteArray }
  }

  /** MSB-first bit reader with Exp-Golomb support; bounds-checked. */
  private[ops] final class BitReader(bytes: Array[Byte]) {
    private var pos = 0 // bit position
    def remaining: Int = bytes.length * 8 - pos
    def u(n: Int): Long = {
      require(n <= remaining, s"bitstream underrun: want $n have $remaining")
      var v = 0L
      var i = 0
      while (i < n) {
        val b = bytes(pos >> 3) & 0xff
        v = (v << 1) | ((b >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0) {
        zeros += 1
        // 30, not 31: at zeros=31 the codeNum range is [2^31-1, 2^32-2],
        // whose toInt truncation goes NEGATIVE — a hostile stream could
        // then smuggle garbage width/height through parseSps as a "valid"
        // h264 MediaMeta instead of degrading to "unknown" (ADVICE r10).
        // At zeros=30 the max codeNum is 2^31-2, still a positive Int; no
        // field this subset reads legitimately approaches that.
        require(zeros <= 30, "exp-golomb run too long (corrupt stream)")
      }
      ((1L << zeros) - 1 + u(zeros)).toInt
    }
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
    def byteAligned: Boolean = (pos & 7) == 0
    def alignToByte(): Unit = while (!byteAligned) u(1)
    /** more_rbsp_data() (7.2): data bits remain before the
      * rbsp_stop_one_bit — i.e. the read position is strictly before the
      * LAST set bit of the RBSP. The position of that bit is computed
      * once on first use.
      */
    def hasMoreRbspData: Boolean = {
      if (lastOneBit == -2) {
        lastOneBit = -1
        var i = bytes.length - 1
        while (i >= 0 && lastOneBit < 0) {
          val b = bytes(i) & 0xff
          if (b != 0)
            lastOneBit = i * 8 + (7 - Integer.numberOfTrailingZeros(b))
          i -= 1
        }
      }
      pos < lastOneBit
    }
    private var lastOneBit = -2
    /** Alignment whose padding bits the spec pins to a value
      * (pcm_alignment_zero_bit = 0, cabac_alignment_one_bit = 1):
      * consume to the byte boundary and REJECT a non-conformant bit —
      * the family's loud-rejection contract, never silent acceptance.
      */
    def alignToByte(expect: Int): Unit = while (!byteAligned)
      require(u(1) == expect,
        s"alignment bit != $expect (non-conformant stream)")
  }

  // ------------------------------------------------ NAL / Annex-B layer ---

  private val StartCode = Array[Byte](0, 0, 0, 1)

  /** Insert emulation-prevention bytes (7.4.1.1): within the RBSP, any
    * `00 00 {00,01,02,03}` becomes `00 00 03 xx`.
    */
  private[ops] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length + 16)
    var zeros = 0
    for (b <- rbsp) {
      if (zeros >= 2 && (b & 0xff) <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Remove emulation-prevention bytes: `00 00 03` → `00 00`. */
  private[ops] def unescapeRbsp(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 0
    while (i < nal.length) {
      if (i + 2 < nal.length && nal(i) == 0 && nal(i + 1) == 0 && nal(i + 2) == 3) {
        out.write(0); out.write(0); i += 3
      } else { out.write(nal(i)); i += 1 }
    }
    out.toByteArray
  }

  /** One NAL unit: 4-byte start code + header byte + escaped RBSP. */
  private[ops] def writeNal(out: java.io.ByteArrayOutputStream, refIdc: Int,
      nalType: Int, rbsp: Array[Byte]): Unit = {
    out.write(StartCode)
    out.write((refIdc << 5) | nalType) // forbidden_zero_bit = 0
    val esc = escapeRbsp(rbsp)
    out.write(esc, 0, esc.length)
  }

  /** Split an Annex-B stream into (nal_unit_type, nal_ref_idc, unescaped
    * RBSP) units. Accepts both 3- and 4-byte start codes (both are legal
    * in Annex B). ref_idc matters downstream: a non-IDR slice carries
    * dec_ref_pic_marking only when nal_ref_idc != 0 (7.3.3).
    */
  private[ops] def splitNals(b: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    val starts = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (payloadStart, scLen)
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0) {
        if (b(i + 2) == 1) { starts += ((i + 3, 3)); i += 3 }
        else if (i + 3 < b.length && b(i + 2) == 0 && b(i + 3) == 1) {
          starts += ((i + 4, 4)); i += 4
        } else i += 1
      } else i += 1
    }
    starts.zipWithIndex.map { case ((s, _), k) =>
      val end =
        if (k + 1 < starts.length) starts(k + 1)._1 - starts(k + 1)._2 else b.length
      val hdr = b(s) & 0xff
      require((hdr & 0x80) == 0, "forbidden_zero_bit set")
      (hdr & 0x1f, (hdr >> 5) & 3,
        unescapeRbsp(java.util.Arrays.copyOfRange(b, s + 1, end)))
    }.toSeq
  }

  /** True when a coded-slice RBSP starts a new picture (first_mb_in_slice
    * == 0) — the spec-correct picture count for multi-slice encodings is
    * "slices whose first_mb_in_slice is 0", not "slice NALs".
    */
  private[ops] def startsPicture(rbsp: Array[Byte]): Boolean =
    try new BitReader(rbsp).ue() == 0 catch { case _: Exception => false }

  // ----------------------------------------------------------- SPS / PPS ---

  /** cropX / cropY are the TOTAL cropped luma samples per axis
    * (SubWidthC·(left+right) and CropUnitY·(top+bottom) — both 2× the
    * offset units for 4:2:0 frame_mbs_only streams), so the display size
    * is simply the MB grid minus the crop.
    */
  final case class Sps(profileIdc: Int, levelIdc: Int, log2MaxFrameNum: Int,
      picOrderCntType: Int, widthMbs: Int, heightMbs: Int,
      cropX: Int, cropY: Int, frameMbsOnly: Boolean = true,
      maxNumRefFrames: Int = 1) {
    def width: Int = widthMbs * 16 - cropX
    def height: Int = heightMbs * 16 - cropY
  }

  /** Write a baseline SPS (7.3.2.1.1). */
  private[ops] def writeSps(sps: Sps): Array[Byte] = {
    val w = new BitWriter
    w.u(sps.profileIdc.toLong, 8) // profile_idc (66 = baseline)
    w.u(0, 8)                     // constraint_set0..5 + 2 reserved zero
    w.u(sps.levelIdc.toLong, 8)   // level_idc
    w.ue(0)                       // seq_parameter_set_id
    w.ue(sps.log2MaxFrameNum - 4) // log2_max_frame_num_minus4
    w.ue(sps.picOrderCntType)     // pic_order_cnt_type (2: no extra syntax)
    w.ue(sps.maxNumRefFrames)     // max_num_ref_frames (0 for all-intra)
    w.u(0, 1)                     // gaps_in_frame_num_value_allowed_flag
    w.ue(sps.widthMbs - 1)        // pic_width_in_mbs_minus1
    w.ue(sps.heightMbs - 1)       // pic_height_in_map_units_minus1
    w.u(1, 1)                     // frame_mbs_only_flag
    w.u(0, 1)                     // direct_8x8_inference_flag
    val crop = sps.cropX != 0 || sps.cropY != 0
    w.u(if (crop) 1 else 0, 1)    // frame_cropping_flag
    if (crop) {
      // all crop on the right/bottom edges; offsets are in 2-luma-sample
      // units for 4:2:0 frame_mbs_only (7.4.2.1.1: SubWidthC = CropUnitY = 2)
      w.ue(0); w.ue(sps.cropX / 2)
      w.ue(0); w.ue(sps.cropY / 2)
    }
    w.u(0, 1)                     // vui_parameters_present_flag
    w.trailingBits()
    w.toBytes
  }

  private[ops] def parseSps(rbsp: Array[Byte]): Sps = {
    val r = new BitReader(rbsp)
    val profile = r.u(8).toInt
    r.u(8) // constraint flags
    val level = r.u(8).toInt
    r.ue() // sps id
    // high profiles carry chroma_format etc. before log2_max_frame_num
    require(profile == 66 || profile == 77 || profile == 88,
      s"unsupported profile_idc $profile (baseline/main/extended only)")
    val log2Mfn = r.ue() + 4
    val pocType = r.ue()
    pocType match {
      case 0 => r.ue() // log2_max_pic_order_cnt_lsb_minus4
      case 1 =>
        r.u(1); r.se(); r.se()
        val n = r.ue(); (0 until n).foreach(_ => r.se())
      case 2 => ()
      case x => throw new IllegalArgumentException(s"bad pic_order_cnt_type $x")
    }
    val maxRef = r.ue() // max_num_ref_frames
    r.u(1) // gaps allowed
    val wMbs = r.ue() + 1
    val hMbs = r.ue() + 1
    val frameMbsOnly = r.u(1) == 1
    if (!frameMbsOnly) r.u(1) // mb_adaptive_frame_field_flag
    r.u(1) // direct_8x8
    var (cx, cy) = (0, 0)
    if (r.u(1) == 1) { // cropping: total luma crop = 2·(left+right), 2·(top+bottom)
      val left = r.ue(); val right = r.ue()
      val top = r.ue(); val bottom = r.ue()
      cx = (left + right) * 2
      cy = (top + bottom) * 2
    }
    // Sanity gates on the parsed fields (7.4.2.1.1 value ranges): a stream
    // that decodes to out-of-range values is corrupt even if every ue() was
    // individually well-formed. Throwing here is what lets MetaDecoder's
    // poison-safe catch downgrade the payload to "unknown" (ADVICE r10).
    require(log2Mfn >= 4 && log2Mfn <= 16,
      s"log2_max_frame_num $log2Mfn outside [4,16]")
    // level 6.2's MaxFS is 139,264 MBs; 2^20 bounds every legal level with
    // headroom while rejecting garbage-as-dimensions
    require(wMbs >= 1 && wMbs <= (1 << 20) && hMbs >= 1 && hMbs <= (1 << 20)
        && wMbs.toLong * hMbs <= (1 << 20),
      s"implausible MB grid ${wMbs}x$hMbs")
    require(maxRef <= 16, s"max_num_ref_frames $maxRef outside [0,16]")
    val sps = Sps(profile, level, log2Mfn, pocType, wMbs,
      if (frameMbsOnly) hMbs else hMbs * 2, cx, cy, frameMbsOnly,
      math.max(1, maxRef))
    require(sps.width > 0 && sps.height > 0,
      s"cropping window ${cx}x$cy exceeds the coded frame")
    sps
  }

  /** Write a minimal PPS (7.3.2.2): CAVLC, one slice group, QP 26.
    * deblocking_filter_control_present_flag is SET: every slice this
    * module family emits signals disable_deblocking_filter_idc = 1, so a
    * conformant external decoder skips the loop filter and reproduces our
    * filter-less reconstruction BIT-EXACTLY for the predicted-MB streams
    * too (q235/q236 plant QP 20–31, where a default-filtered decode would
    * legitimately differ at block edges).
    */
  private[ops] def writePps(cabac: Boolean = false,
      weightedPred: Boolean = false): Array[Byte] = {
    val w = new BitWriter
    w.ue(0)    // pic_parameter_set_id
    w.ue(0)    // seq_parameter_set_id
    w.u(if (cabac) 1 else 0, 1) // entropy_coding_mode_flag
    w.u(0, 1)  // bottom_field_pic_order_in_frame_present_flag
    w.ue(0)    // num_slice_groups_minus1
    w.ue(0)    // num_ref_idx_l0_default_active_minus1
    w.ue(0)    // num_ref_idx_l1_default_active_minus1
    w.u(if (weightedPred) 1 else 0, 1) // weighted_pred_flag
    w.u(0, 2)  // weighted_bipred_idc
    w.se(0)    // pic_init_qp_minus26
    w.se(0)    // pic_init_qs_minus26
    w.se(0)    // chroma_qp_index_offset
    w.u(1, 1)  // deblocking_filter_control_present_flag
    w.u(0, 1)  // constrained_intra_pred_flag
    w.u(0, 1)  // redundant_pic_cnt_present_flag
    w.trailingBits()
    w.toBytes
  }

  /** Single-parameter-set contract shared by every subset decoder (ADVICE
    * r11): each binds ONE SPS and ONE PPS for the whole stream, so a
    * stream carrying several — where a later slice's pic_parameter_set_id
    * selects a PPS with different entropy / init-QP / deblocking flags —
    * would be parsed with the wrong one: a bit desync that can silently
    * mis-decode (the I_PCM path's alignToByte can even accidentally
    * resync). Loud rejection instead, matching the MMCO/CABAC/interlace
    * pattern. `ppsRequired = false` is the PCM decoder's metadata-only
    * allowance (zero PPS is fine; two never are). Returns the bound PPS's
    * pic_parameter_set_id (-1 when absent) so slice headers can assert
    * they reference exactly that PPS.
    */
  private[ops] def requireSingleParamSets(nals: Seq[(Int, Int, Array[Byte])],
      who: String, ppsRequired: Boolean = true): Int = {
    // REPEATED byte-identical parameter sets are fine — real encoders
    // re-send the same SPS/PPS before every IDR for random access — so
    // the single-set contract counts DISTINCT RBSPs, not NALs (a repeat
    // re-activates the identical state; only a DIFFERING set can desync)
    def distinct(tpe: Int): Int =
      nals.collect { case (`tpe`, _, rbsp) => rbsp.toSeq }.distinct.length
    val nSps = distinct(7)
    val nPps = distinct(8)
    require(nSps == 1, s"$who: exactly one distinct SPS per stream (got " +
      s"$nSps) — multi-parameter-set streams need an external decoder " +
      "(MediaDecoder seam)")
    require(if (ppsRequired) nPps == 1 else nPps <= 1,
      s"$who: ${if (ppsRequired) "exactly" else "at most"} one distinct " +
        s"PPS per stream (got $nPps) — multi-parameter-set streams need " +
        "an external decoder (MediaDecoder seam)")
    nals.collectFirst { case (8, _, rbsp) => new BitReader(rbsp).ue() }
      .getOrElse(-1)
  }

  /** Per-slice companion of [[requireSingleParamSets]]: the header's
    * pic_parameter_set_id must name the bound PPS (no check when the
    * stream legitimately carries none).
    */
  private[ops] def requireSlicePps(sliceId: Int, boundId: Int, who: String): Unit =
    require(boundId < 0 || sliceId == boundId,
      s"$who: slice references PPS $sliceId but the stream's PPS is " +
        s"$boundId — external decoder (MediaDecoder seam)")

  /** deblocking_filter_control_present_flag of a PPS RBSP — slice-header
    * parsers branch on it (7.3.3: the slice then carries
    * disable_deblocking_filter_idc and, when idc != 1, two offsets).
    */
  private[ops] def ppsDeblockingPresent(pps: Array[Byte]): Boolean =
    ppsWalk(pps)._2

  /** One canonical minimal PPS walk: (entropy is CAVLC,
    * deblocking_filter_control_present_flag). The sibling decoders keep
    * their own fuller walks (they also need init QP / chroma offset); this
    * is the shared prefix for callers that need only the flags.
    */
  private[ops] def ppsWalk(pps: Array[Byte]): (Boolean, Boolean) = {
    val r = new BitReader(pps)
    r.ue(); r.ue()
    val cavlc = r.u(1) == 0
    r.u(1)
    // >0 slice groups insert map syntax here that this walk cannot skip —
    // every decoder in this family rejects such streams anyway
    require(r.ue() == 0, "pps walk: slice groups unsupported")
    r.ue(); r.ue(); r.u(1); r.u(2)
    r.se(); r.se(); r.se()
    (cavlc, r.u(1) == 1)
  }

  /** Skip the slice-header deblocking fields if the PPS announces them.
    * For ALL-I_PCM streams only, and only because [[decodePcmFrames]]
    * returns LUMA alone: luma PCM-PCM edges are provably never filtered
    * (8.7.2 gives I_PCM macroblocks luma QP 0, where alpha and beta are 0
    * and no sample passes the filter gate), so the returned planes match a
    * conformant decoder's. CHROMA PCM edges CAN be filtered (a positive
    * chroma_qp_index_offset plus slice alpha offset lifts the chroma index
    * above the zero-alpha band) — if this decoder ever returns chroma,
    * this permissive skip must route through [[sliceDeblocking]] +
    * [[H264Deblock]] like the predicted-MB decoders.
    */
  private[ops] def skipSliceDeblocking(r: BitReader, present: Boolean): Unit =
    if (present && r.ue() != 1) { r.se(); r.se() }

  /** Slice-header deblocking control for the predicted-macroblock
    * decoders (7.3.3): returns (filterOn, FilterOffsetA, FilterOffsetB)
    * with the div2 offsets already doubled per 8.7.2.2. When the PPS has
    * no slice-level control the filter is implicitly ON with zero
    * offsets; idc 1 turns it off; idc 0 and 2 turn it on. Since round 14
    * idc 2's "exclude slice boundaries" is REAL for multi-slice P
    * pictures (use [[sliceDeblockingIdc]] where the distinction matters;
    * this Boolean form remains for the single-slice decoders, where 2 ≡
    * 0). The filter itself is [[H264Deblock]] — filter-enabled streams
    * decode natively since round 13; they used to be rejected here.
    */
  private[ops] def sliceDeblocking(r: BitReader, present: Boolean): (Boolean, Int, Int) = {
    val (idc, a, b) = sliceDeblockingIdc(r, present)
    (idc != 1, a, b)
  }

  /** idc-preserving form: (idc, offA·2, offB·2) — idc 2 keeps the filter
    * on but excludes slice-boundary edges (the multi-slice decoder needs
    * the distinction; idc 0 and 2 are identical on single-slice pictures).
    */
  private[ops] def sliceDeblockingIdc(r: BitReader, present: Boolean): (Int, Int, Int) = {
    if (!present) return (0, 0, 0)
    val idc = r.ue()
    require(idc <= 2, s"bad disable_deblocking_filter_idc $idc")
    if (idc == 1) (1, 0, 0)
    else {
      val a = r.se(); val b = r.se()
      require(a >= -6 && a <= 6 && b >= -6 && b <= 6,
        s"slice deblocking offsets out of range: $a / $b")
      (idc, a * 2, b * 2)
    }
  }

  // ----------------------------------------------------- encoder (I_PCM) ---

  /** Encode frames as one IDR I_PCM picture each: SPS + PPS + per-frame
    * coded-slice NALs. `frames` are luma planes (h rows × w cols, 0–255);
    * chroma planes are flat `chromaFill` (gray). Dimensions must be
    * multiples of 16 (no cropping window emitted). The output is a
    * conformant Annex-B byte stream — any external H.264 decoder
    * reproduces the planes bit-exactly (I_PCM is lossless).
    */
  def encodePcm(w: Int, h: Int, frames: Seq[Array[Array[Int]]],
      chromaFill: Int = 128): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0, s"PCM encoder needs MB-aligned dims, got ${w}x$h")
    require(frames.forall(f => f.length == h && f.forall(_.length == w)),
      "every luma plane must be h rows of w samples")
    val out = new java.io.ByteArrayOutputStream()
    writeNal(out, 3, 7, writeSps(Sps(66, 10, 4, 2, w / 16, h / 16, 0, 0, frameMbsOnly = true, maxNumRefFrames = 0)))
    writeNal(out, 3, 8, writePps())
    val mbsX = w / 16
    val mbsY = h / 16
    frames.zipWithIndex.foreach { case (plane, k) =>
      val bw = new BitWriter
      // slice_header (7.3.3) — IDR, single slice per picture
      bw.ue(0)          // first_mb_in_slice
      bw.ue(7)          // slice_type (7 = I, all slices in pic are I)
      bw.ue(0)          // pic_parameter_set_id
      bw.u(0, 4)        // frame_num, u(log2_max_frame_num) = u(4)
      bw.ue(k % 2)      // idr_pic_id (consecutive IDRs must differ)
      // dec_ref_pic_marking (7.3.3.3, IdrPicFlag=1):
      bw.u(0, 1)        // no_output_of_prior_pics_flag
      bw.u(0, 1)        // long_term_reference_flag
      bw.se(0)          // slice_qp_delta
      bw.ue(1)          // disable_deblocking_filter_idc = 1 (no loop filter)
      // slice_data: raster-scan macroblocks, all I_PCM (mb_type 25 in I)
      var mb = 0
      while (mb < mbsX * mbsY) {
        val x0 = (mb % mbsX) * 16
        val y0 = (mb / mbsX) * 16
        bw.ue(25)       // mb_type = I_PCM
        bw.alignZero()  // pcm_alignment_zero_bit*
        var i = 0
        while (i < 256) { // pcm_sample_luma, raster within the MB
          bw.u((plane(y0 + i / 16)(x0 + i % 16) & 0xff).toLong, 8)
          i += 1
        }
        i = 0
        while (i < 128) { bw.u((chromaFill & 0xff).toLong, 8); i += 1 } // Cb, Cr
        mb += 1
      }
      bw.trailingBits()
      writeNal(out, 3, 5, bw.toBytes) // 5 = IDR coded slice
    }
    out.toByteArray
  }

  // ----------------------------------------------------- decoder (I_PCM) ---

  /** Decode every IDR/non-IDR coded slice of an Annex-B stream whose
    * macroblocks are all I_PCM; returns one luma plane per picture.
    * Throws on predicted macroblock types (the documented subset
    * boundary) and on malformed streams — callers in query paths wrap
    * with poison-safe handling like every other codec here.
    */
  def decodePcmFrames(annexB: Array[Byte]): Seq[Array[Array[Int]]] = {
    val nals = splitNals(annexB)
    val sps = nals.collectFirst { case (7, _, rbsp) => parseSps(rbsp) }
      .getOrElse(throw new IllegalArgumentException("no SPS in stream"))
    require(sps.cropX == 0 && sps.cropY == 0,
      "PCM subset decoder: cropped streams unsupported")
    // ONLY pic_order_cnt_type 2 is parseable here: types 0 and 1 put
    // extra ordering fields in the slice header, and silently skipping
    // them would shift every later read — loud rejection, not garbage
    require(sps.picOrderCntType == 2,
      s"PCM subset decoder: pic_order_cnt_type ${sps.picOrderCntType} " +
        "unsupported (slice headers would carry unparsed ordering fields)")
    // interlace adds field_pic_flag to every slice header; CABAC replaces
    // the whole slice-data entropy layer — silently misparsing either
    // would decode garbage, so reject both loudly (MediaDecoder seam)
    require(sps.frameMbsOnly,
      "PCM subset decoder: interlaced (field) streams unsupported")
    // external all-PCM streams may or may not carry a PPS (metadata-only
    // producers); when present, one shared walk surfaces both flags
    val ppsId = requireSingleParamSets(nals, "PCM subset decoder",
      ppsRequired = false)
    val deblock = nals.collectFirst { case (8, _, rbsp) => rbsp }.map(ppsWalk)
      .map { case (cavlc, db) =>
        require(cavlc, "PCM subset decoder: CABAC streams unsupported")
        db
      }.getOrElse(false)
    val mbsX = sps.widthMbs
    val mbsY = sps.heightMbs
    nals.filter(n => n._1 == 1 || n._1 == 5).map { case (nalType, refIdc, rbsp) =>
      val r = new BitReader(rbsp)
      val firstMb = r.ue()
      require(firstMb == 0, "PCM subset decoder: one slice per picture")
      val sliceType = r.ue()
      require(sliceType % 5 == 2, s"not an I slice: slice_type $sliceType")
      requireSlicePps(r.ue(), ppsId, "PCM subset decoder")
      r.u(sps.log2MaxFrameNum)      // frame_num
      if (nalType == 5) r.ue()      // idr_pic_id
      if (nalType == 5) { r.u(1); r.u(1) } // dec_ref_pic_marking (IDR)
      else if (refIdc != 0)
        // MMCO syntax follows when set; skipping it would shift every later
        // read (silent mis-decode) — loud rejection instead
        require(r.u(1) == 0, "PCM subset decoder: adaptive ref marking " +
          "(MMCO) unsupported — external decoder (MediaDecoder seam)")
      // (a non-reference non-IDR slice carries NO dec_ref_pic_marking)
      r.se()                        // slice_qp_delta
      skipSliceDeblocking(r, deblock)
      val plane = Array.ofDim[Int](mbsY * 16, mbsX * 16)
      var mb = 0
      while (mb < mbsX * mbsY) {
        val mbType = r.ue()
        require(mbType == 25, s"PCM subset decoder: mb_type $mbType at MB $mb " +
          "(predicted macroblocks need an external decoder — MediaDecoder seam)")
        r.alignToByte(0) // pcm_alignment_zero_bit (7.3.5)
        val x0 = (mb % mbsX) * 16
        val y0 = (mb / mbsX) * 16
        var i = 0
        while (i < 256) {
          plane(y0 + i / 16)(x0 + i % 16) = r.u(8).toInt
          i += 1
        }
        i = 0
        while (i < 128) { r.u(8); i += 1 } // chroma, discarded (gray output)
        mb += 1
      }
      plane
    }
  }

  // ------------------------------------------------- MediaDecoder bridge ---

  /** Metadata decoder over REAL H.264 Annex-B payloads: dimensions from
    * the parsed SPS (cropping window applied — total luma crop per axis),
    * frame count = coded slices whose first_mb_in_slice is 0 (pictures,
    * robust to multi-slice encodings). Works on ANY baseline/main H.264
    * stream — not just the PCM subset — because it only needs the
    * bitstream layer. Poison-safe.
    */
  object MetaDecoder extends Multimodal.MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Multimodal.MediaMeta] =
      payloads.map { bytes =>
        try {
          val nals = splitNals(bytes)
          val sps = nals.collectFirst { case (7, _, rbsp) => parseSps(rbsp) }
            .getOrElse(throw new IllegalArgumentException("no SPS"))
          // pictures, not slice NALs: multi-slice encodings emit several
          // slices per picture, distinguished by first_mb_in_slice == 0
          val frames = nals.count(n =>
            (n._1 == 1 || n._1 == 5) && startsPicture(n._3))
          Multimodal.MediaMeta("h264", sps.width, sps.height, frames,
            if (bytes == null) 0L else bytes.length.toLong)
        } catch {
          case _: Exception =>
            Multimodal.MediaMeta("unknown", -1, -1, 0,
              if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }
}
