package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Gates for the intra-CAVLC codec ([[H264Cavlc]]) under the module's
  * stated verification boundary (no external decoder in the container):
  *  (1) structural soundness of every transcribed VLC table —
  *      prefix-freeness and exact entry counts per the spec's ranges;
  *  (2) encode→decode round-trip fuzz of residual blocks across all nC
  *      contexts, level magnitudes spanning every suffixLength step, and
  *      all sparsity shapes (total_zeros / run_before coverage);
  *  (3) transform/dequant spot values computed by hand from the spec
  *      arithmetic;
  *  (4) full-stream decode of planted frames against pixel values
  *      computed HERE with independent closed-form arithmetic (the same
  *      forms the q235 DuckDB oracle uses), plus a multi-row fuzz that
  *      must parse bit-exactly (any table/nC slip desyncs the stream).
  */
class H264CavlcSpec extends AnyFunSuite {

  test("every VLC table is prefix-free with the spec's entry counts") {
    for ((name, entries) <- H264Cavlc.allTables) {
      // no duplicate codewords, no codeword a prefix of another
      for (Seq((l1, v1), (l2, v2)) <- entries.combinations(2)) {
        val (shortLen, shortVal, longLen, longVal) =
          if (l1 <= l2) (l1, v1, l2, v2) else (l2, v2, l1, v1)
        assert(!(shortLen == longLen && shortVal == longVal),
          s"$name: duplicate codeword len=$shortLen val=$shortVal")
        assert((longVal >> (longLen - shortLen)) != shortVal,
          s"$name: ($shortLen,$shortVal) is a prefix of ($longLen,$longVal)")
      }
      entries.foreach { case (len, v) =>
        assert(len >= 1 && len <= 16 && v >= 0 && v < (1 << len),
          s"$name: malformed entry ($len,$v)")
      }
    }
    // total_zeros row lengths: 17−tc entries for the 4x4 table (tz ranges
    // 0..16−tc), 5−tc for the 4:2:0 chroma DC table
    val tz = H264Cavlc.allTables.collect {
      case (n, e) if n.startsWith("total_zeros[") => (n, e.length)
    }
    tz.foreach { case (n, len) =>
      val tc = n.stripPrefix("total_zeros[tc=").stripSuffix("]").toInt
      assert(len == 17 - tc, s"$n has $len entries, want ${17 - tc}")
    }
    val tzc = H264Cavlc.allTables.collect {
      case (n, e) if n.startsWith("total_zeros_chroma[") => (n, e.length)
    }
    tzc.foreach { case (n, len) =>
      val tc = n.stripPrefix("total_zeros_chroma[tc=").stripSuffix("]").toInt
      assert(len == 5 - tc, s"$n has $len entries, want ${5 - tc}")
    }
  }

  private def roundTrip(coeffs: Array[Int], nC: Int): Array[Int] = {
    val w = new H264.BitWriter
    H264Cavlc.encodeResidual(w, coeffs, nC)
    w.alignZero()
    val r = new H264.BitReader(w.toBytes)
    val (out, tc) = H264Cavlc.decodeResidual(r, nC, coeffs.length)
    assert(tc == coeffs.count(_ != 0))
    out
  }

  test("residual round-trip: directed cases across every nC context") {
    val cases = Seq(
      Array.fill(16)(0), // TotalCoeff 0
      Array(1) ++ Array.fill(15)(0), // single trailing one
      Array(-1, 1, -1) ++ Array.fill(13)(0), // 3 T1s
      Array(5, 0, 0, -2, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, -1), // runs + T1s
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 3), // max total_zeros
      (1 to 16).toArray, // TotalCoeff 16 == maxNumCoeff (no total_zeros)
      Array(2047, -2047) ++ Array.fill(14)(0), // deep suffix escalation
      Array.fill(16)(1), // 16 ones: T1 cap + |1| levels after the cap
      Array(7, 6, 5, 4, 3, 2, 1, 0, 0, 0, 0, 1, -1, 0, 0, 1)) // tc>10 init
    for (c <- cases; nC <- Seq(0, 1, 2, 3, 4, 7, 8, 20))
      assert(roundTrip(c.clone(), nC).sameElements(c), s"nC=$nC ${c.mkString(",")}")
    // AC shape (15) and chroma DC shape (4, nC = −1)
    assert(roundTrip(Array(3, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1), 2)
      .sameElements(Array(3, 0, -1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)))
    for (c <- Seq(Array(0, 0, 0, 0), Array(1, 0, 0, 0), Array(-2, 1, 0, 0),
      Array(3, -1, 1, 0), Array(1, 1, -1, 1)))
      assert(roundTrip(c.clone(), -1).sameElements(c), c.mkString(","))
  }

  test("residual round-trip: 2000-case fuzz over sparsity, signs, magnitudes") {
    val rnd = new scala.util.Random(264)
    for (i <- 0 until 2000) {
      val maxCoeff = Seq(16, 15, 4)(i % 3)
      val nC = if (maxCoeff == 4) -1 else Seq(0, 1, 2, 3, 4, 6, 8, 11)(rnd.nextInt(8))
      val density = rnd.nextDouble()
      val c = Array.tabulate(maxCoeff) { _ =>
        if (rnd.nextDouble() < density) {
          val mag = 1 + rnd.nextInt(if (rnd.nextBoolean()) 2 else 40)
          if (rnd.nextBoolean()) mag else -mag
        } else 0
      }
      assert(roundTrip(c.clone(), nC).sameElements(c),
        s"fuzz #$i nC=$nC max=$maxCoeff: ${c.mkString(",")}")
    }
  }

  test("inverse transform and scaling spot values from the spec arithmetic") {
    // DC-only block: every residual sample is (d00 + 32) >> 6
    val d = Array.ofDim[Int](4, 4); d(0)(0) = 64
    assert(H264Cavlc.idct4x4(d).flatten.forall(_ == 1))
    d(0)(0) = -170
    assert(H264Cavlc.idct4x4(d).flatten.forall(_ == -3)) // floor, not trunc: ⌊−138/64⌋
    // one AC coefficient at (0,1): horizontal freq-1 basis = +1,+1/2,−1/2,−1
    val a = Array.ofDim[Int](4, 4); a(0)(1) = 64
    val r = H264Cavlc.idct4x4(a)
    // f-row for freq-1 input 64: (64, 32, −32, −64) → +32 >> 6
    assert(r(0).toSeq == Seq(1, 1, 0, -1), r(0).mkString(","))
    // vertical freq 0: every row repeats row 0
    assert(r.forall(_.sameElements(r(0))))
    // luma DC scaling: qp = 24 → m=0, shift=4: f·10·4; qp=28 → m=4: f·16·4
    assert(H264Cavlc.scaleLumaDc(3, 24) == 3 * 10 * 4)
    assert(H264Cavlc.scaleLumaDc(-2, 28) == -2 * 16 * 4)
    // chroma DC: ((f·V) << (qp/6)) >> 1
    assert(H264Cavlc.scaleChromaDc(5, 24) == ((5 * 10) << 4) >> 1)
    // inverse Hadamard of a delta at (0,0) is flat
    val h = Array.ofDim[Int](4, 4); h(0)(0) = 7
    assert(H264Cavlc.ihadamard4x4(h).flatten.forall(_ == 7))
    // chroma qp mapping spot values (Table 8-15)
    assert(H264Cavlc.chromaQp(29) == 29 && H264Cavlc.chromaQp(30) == 29 &&
      H264Cavlc.chromaQp(37) == 34 && H264Cavlc.chromaQp(51) == 39)
  }

  /** The independent closed forms the q235 oracle also uses. */
  private def fd(x: Long, y: Long): Long = Math.floorDiv(x, y)
  private def clip(v: Long): Int = math.max(0L, math.min(255L, v)).toInt
  private val A = H264Cavlc.dqA; private val B = H264Cavlc.dqB; private val C = H264Cavlc.dqC
  private def dcY(lv: Int, qp: Int): Long = lv.toLong * A(qp % 6) << (qp / 6 - 2)

  test("planted-stream decode matches independent closed-form pixels") {
    for (doc <- 0L until 48L) {
      val qp = 20 + (doc % 12).toInt
      val l0 = (doc % 7).toInt - 3
      val l1 = 1 + (doc % 3).toInt
      val a1 = (doc % 5).toInt - 2
      val a2 = 2 * (doc % 2).toInt - 1
      val a3 = 1 + (doc % 4).toInt
      val l2 = 2 - (doc % 5).toInt
      val (b1, b2, b3) = (a2, a3, a1)
      val c0 = (doc % 9).toInt - 4
      val c1 = 1 + (doc % 6).toInt
      val tt = if (doc % 2 == 0) 1 else -1
      val e0 = (doc % 3).toInt - 1
      val g0 = ((11 * doc + 5) % 256).toInt
      val l3 = (doc % 7).toInt - 3
      def acBlock(x: Int, y: Int, z: Int) =
        Array.fill(16)(Array(x, y, 0, 0, z) ++ Array.fill(10)(0))
      val frame1 = Seq(
        H264Cavlc.I16x16(2, Array(l0) ++ Array.fill(15)(0)),
        H264Cavlc.I16x16(1, Array(l1) ++ Array.fill(15)(0), acBlock(a1, a2, a3), qpDelta = 1),
        H264Cavlc.I16x16(1, Array(l2) ++ Array.fill(15)(0), acBlock(b1, b2, b3), qpDelta = -1))
      val blk0 = Array(c0, c1, 0, 0, tt) ++ Array.fill(11)(0)
      val frame2 = Seq(
        H264Cavlc.I4x4(Array.fill(16)(2),
          Array(blk0) ++ Array.fill(15)(Array.fill(16)(0)), cbpLuma = 3,
          chromaDc = Array(Array(e0, 0, 0, 0), Array(1, 0, 0, 0))),
        H264Cavlc.Pcm(g0),
        // I_PCM zeroes QP_Y,prev (7.4.5) — restore the planted QP
        H264Cavlc.I16x16(2, Array(l3) ++ Array.fill(15)(0),
          qpDelta = H264Cavlc.qpRestoreDelta(qp)))
      val stream = H264Cavlc.encodeIntra(3, 1, qp, Seq(frame1, frame2))
      val frames = H264Cavlc.decodeIntraFrames(stream)
      assert(frames.length == 2)
      val f1 = frames(0); val f2 = frames(1)
      // closed forms (spec dequant/IDCT/prediction arithmetic)
      val k = qp / 6; val m = qp % 6
      val qp1 = qp + 1; val k1 = qp1 / 6; val m1 = qp1 % 6
      val v0 = clip(128 + fd(dcY(l0, qp) + 32, 64))
      assert(f1(0)(0) == v0, s"doc=$doc f1 mb0")
      assert(f1(15)(15) == v0, "mb0 must be uniform (DC-only residual)")
      val dc1 = dcY(l1, qp1)
      val dA1 = a1.toLong * C(m1) << k1
      val dA2 = a2.toLong * C(m1) << k1
      val dA3 = a3.toLong * A(m1) << k1
      val p016 = clip(v0 + fd(dc1 + dA1 + dA2 + dA3 + 32, 64))
      assert(f1(0)(16) == p016, s"doc=$doc f1 mb1 c0")
      val p031 = clip(v0 + fd((dc1 + dA3 - dA1) + dA2 + 32, 64))
      assert(f1(0)(31) == p031, s"doc=$doc f1 mb1 c15")
      val dc2 = dcY(l2, qp)
      val dB1 = b1.toLong * C(m) << k
      val dB2 = b2.toLong * C(m) << k
      val dB3 = b3.toLong * A(m) << k
      val p032 = clip(p031 + fd(dc2 + dB1 + dB2 + dB3 + 32, 64))
      assert(f1(0)(32) == p032, s"doc=$doc f1 mb2")
      val r400 = fd(c0.toLong * A(m) * (1L << k) + c1.toLong * C(m) * (1L << k) +
        tt.toLong * B(m) * (1L << k) + 32, 64)
      assert(f2(0)(0) == clip(128 + r400), s"doc=$doc f2 i4x4")
      assert(f2(0)(16) == g0, s"doc=$doc f2 pcm")
      assert(f2(0)(32) == clip(g0 + fd(dcY(l3, qp) + 32, 64)), s"doc=$doc f2 dc16")
      // metadata layer still reads the stream as real H.264
      val meta = H264.MetaDecoder.decodeBatch(Seq(stream)).head
      assert(meta.format == "h264" && meta.width == 48 && meta.height == 16 &&
        meta.n_frames == 2)
    }
  }

  test("multi-row fuzz: mixed MB types parse and reconstruct in range") {
    val rnd = new scala.util.Random(235)
    for (trial <- 0 until 20) {
      val (mbsX, mbsY) = (3, 2)
      val qp = 14 + rnd.nextInt(36)
      def sparse(n: Int, maxMag: Int): Array[Int] = {
        val a = new Array[Int](n)
        for (_ <- 0 until rnd.nextInt(6)) {
          val mag = 1 + rnd.nextInt(maxMag)
          a(rnd.nextInt(n)) = if (rnd.nextBoolean()) mag else -mag
        }
        a
      }
      val frames = Seq.tabulate(2) { _ =>
        Seq.tabulate(mbsX * mbsY) { mbIdx =>
          val mbX = mbIdx % mbsX; val mbY = mbIdx / mbsX
          rnd.nextInt(3) match {
            case 0 => H264Cavlc.Pcm(rnd.nextInt(256))
            case 1 =>
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
            case _ =>
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
              H264Cavlc.I4x4(modes, Array.fill(16)(sparse(16, 5)),
                cbpLuma = rnd.nextInt(16), qpDelta = rnd.nextInt(3) - 1,
                chromaDc = if (rnd.nextBoolean())
                  Array(sparse(4, 3), sparse(4, 3)) else null)
          }
        }
      }
      val stream = H264Cavlc.encodeIntra(mbsX, mbsY, qp, frames)
      val out = H264Cavlc.decodeIntraFrames(stream)
      assert(out.length == 2)
      out.foreach { plane =>
        assert(plane.length == mbsY * 16 && plane.forall(_.length == mbsX * 16))
        assert(plane.flatten.forall(v => v >= 0 && v <= 255))
      }
      // determinism
      val again = H264Cavlc.decodeIntraFrames(stream)
      assert(out.zip(again).forall { case (p, q) =>
        p.zip(q).forall { case (r1, r2) => r1.sameElements(r2) } })
    }
  }

  test("filter-enabled streams decode natively through the loop filter") {
    // since round 13 a disable_deblocking_filter_idc != 1 slice routes
    // through H264Deblock instead of being rejected; the slice-header
    // offset fields must be consumed exactly (a parse slip here would
    // desync the macroblock layer). An all-I_PCM picture is provably
    // filter-invariant (8.7.2: PCM edges carry qP = 0, where alpha and
    // beta are 0), so all three decoders must agree on the raw samples.
    val good = H264Cavlc.encodeIntra(1, 1, 26, Seq(Seq(H264Cavlc.Pcm(77))))
    val nals = H264.splitNals(good)
    val bw = new H264.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0); bw.u(0, 4); bw.ue(0)
    bw.u(0, 1); bw.u(0, 1); bw.se(0)
    bw.ue(0)           // disable_deblocking_filter_idc = 0 -> filter ON
    bw.se(2); bw.se(-1) // nonzero alpha / beta offsets must be consumed
    bw.ue(25); bw.alignZero() // one I_PCM macroblock, luma 77, chroma 128
    (0 until 256).foreach(_ => bw.u(77, 8))
    (0 until 128).foreach(_ => bw.u(128, 8))
    bw.trailingBits()
    val out = new java.io.ByteArrayOutputStream()
    H264.writeNal(out, 3, 7, nals.collectFirst { case (7, _, r) => r }.get)
    H264.writeNal(out, 3, 8, nals.collectFirst { case (8, _, r) => r }.get)
    H264.writeNal(out, 3, 5, bw.toBytes)
    assert(H264Cavlc.decodeIntraFrames(out.toByteArray).head(0)(0) == 77)
    assert(H264Inter.decodeFrames(out.toByteArray).head(0)(0) == 77)
    assert(H264.decodePcmFrames(out.toByteArray).head(0)(0) == 77)
    // out-of-range offsets are rejected, not misparsed
    val bad = new H264.BitWriter
    bad.ue(0); bad.ue(7); bad.ue(0); bad.u(0, 4); bad.ue(0)
    bad.u(0, 1); bad.u(0, 1); bad.se(0)
    bad.ue(0); bad.se(7); bad.se(0)
    bad.ue(25); bad.alignZero()
    (0 until 384).foreach(_ => bad.u(1, 8))
    bad.trailingBits()
    val out2 = new java.io.ByteArrayOutputStream()
    H264.writeNal(out2, 3, 7, nals.collectFirst { case (7, _, r) => r }.get)
    H264.writeNal(out2, 3, 8, nals.collectFirst { case (8, _, r) => r }.get)
    H264.writeNal(out2, 3, 5, bad.toBytes)
    val e = intercept[IllegalArgumentException] {
      H264Cavlc.decodeIntraFrames(out2.toByteArray)
    }
    assert(e.getMessage.contains("offsets out of range"), e.getMessage)
  }

  test("PCM-only streams decode identically through both decoders") {
    val plane = Array.tabulate(16, 48)((y, x) => (x * 7 + y * 13) % 256)
    val viaPcm = H264.encodePcm(48, 16, Seq(plane))
    val viaCavlcDecoder = H264Cavlc.decodeIntraFrames(viaPcm)
    assert(viaCavlcDecoder.length == 1)
    assert(viaCavlcDecoder.head.zip(plane).forall { case (a, b) => a.sameElements(b) })
  }
}
