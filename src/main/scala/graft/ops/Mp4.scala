package graft.ops

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM ISO BMFF (MP4/QuickTime family) container parser + writer —
  * closes the last multimodal stub: round 2/3 left VIDEO "interface-only
  * (no JDK video codec)". Container METADATA needs no codec: the box
  * structure (ISO/IEC 14496-12) is plain big-endian length-prefixed record
  * parsing, so brand, duration, track layout, video dimensions and sample
  * counts are all readable header-only, exactly like [[Multimodal.ImageIoDecoder]]
  * (pixels undecoded) and [[Multimodal.AudioSystemDecoder]] (samples
  * undecoded). Frame DECODE still requires an external codec behind
  * [[Multimodal.MediaDecoder]] — that boundary is now codec-only, not
  * container-only.
  *
  * Reference behavior target: the reference treats media as opaque payloads
  * with typed metadata; this provides the video leg of that contract.
  *
  * Parser hardening (the 100-TB poison-payload contract): bounds-checked
  * reads, `size==0` (box-to-EOF) and `size==1` (64-bit largesize) handled,
  * `size<8` or child overrunning its parent aborts the walk instead of
  * looping, and every malformed shape returns `None` — a bad payload must
  * degrade, never kill a task or spin.
  */
object Mp4 {

  /** Header-level container metadata.
    *
    * @param brand        ftyp major brand (e.g. "isom", "mp42")
    * @param timescale    mvhd timescale (ticks per second)
    * @param durationTicks mvhd duration in timescale ticks
    * @param nTracks      number of trak boxes
    * @param videoWidth   first video ('vide' handler) track's tkhd width
    *                     (16.16 fixed → integer part); -1 if no video track
    * @param videoHeight  same for height
    * @param nSamples     total stts sample count across video tracks
    *                     (= frame count); 0 if no stts present
    */
  final case class Meta(brand: String, timescale: Long, durationTicks: Long,
      nTracks: Int, videoWidth: Int, videoHeight: Int, nSamples: Long) {
    def durationMs: Long =
      // adversarial v1 files carry 64-bit tick counts — `ticks * 1000`
      // must not wrap into a bogus-but-plausible value
      if (timescale <= 0 || durationTicks < 0 ||
        durationTicks > Long.MaxValue / 1000L) -1L
      else durationTicks * 1000L / timescale
  }

  // ---- parsing -----------------------------------------------------------

  private final class Cursor(val buf: ByteBuffer) {
    def u32(at: Int): Long = buf.getInt(at).toLong & 0xffffffffL
    def u64(at: Int): Long = buf.getLong(at)
    def u16(at: Int): Int = buf.getShort(at).toInt & 0xffff
    def fourCc(at: Int): String = {
      val b = new Array[Byte](4)
      var i = 0
      while (i < 4) { b(i) = buf.get(at + i); i += 1 }
      new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }

  /** One box header: (payloadStart, payloadEnd, type). Returns None when the
    * header is malformed or overruns `end`.
    */
  private def boxAt(c: Cursor, off: Int, end: Int): Option[(Int, Int, String)] = {
    if (off + 8 > end) return None
    val size32 = c.u32(off)
    val tpe = c.fourCc(off + 4)
    val (payloadStart, boxEnd) = size32 match {
      case 0 => (off + 8, end.toLong) // box extends to end of enclosing space
      case 1 =>
        if (off + 16 > end) return None
        (off + 16, off + c.u64(off + 8)) // 64-bit largesize counts from box start
      case n if n >= 8 => (off + 8, off + n)
      case _ => return None // size in [2,7] (or negative u32 overflow) is malformed
    }
    if (boxEnd > end || boxEnd < payloadStart) None
    else Some((payloadStart, boxEnd.toInt, tpe))
  }

  /** Walk sibling boxes in [off, end), invoking f(type, payloadStart,
    * payloadEnd). Stops (returns false) on the first malformed header.
    */
  private def walk(c: Cursor, off: Int, end: Int)(
      f: (String, Int, Int) => Unit): Boolean = {
    var pos = off
    while (pos < end) {
      boxAt(c, pos, end) match {
        case Some((ps, pe, tpe)) =>
          f(tpe, ps, pe)
          if (pe <= pos) return false // zero-progress guard (size==0 at pos 0 of parent)
          pos = pe
        case None => return false
      }
    }
    true
  }

  private final class TrakAcc {
    var handler: String = ""
    var width: Int = -1
    var height: Int = -1
    var samples: Long = 0L
  }

  def parse(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val c = new Cursor(ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN))
      var brand: String = null
      var timescale = 0L
      var duration = 0L
      var nTracks = 0
      var vw = -1
      var vh = -1
      var vSamples = 0L

      def parseTrak(ps: Int, pe: Int): TrakAcc = {
        val acc = new TrakAcc
        walk(c, ps, pe) {
          case ("tkhd", s, e) =>
            val v = c.buf.get(s).toInt & 0xff
            // v0: creation/modification/id/reserved/duration = 4*5; v1: 8+8+4+4+8
            val afterDur = s + 4 + (if (v == 1) 32 else 20)
            // layer(2) alt(2) volume(2) reserved(2) matrix(36) → width/height
            val whOff = afterDur + 8 + 2 + 2 + 2 + 2 + 36
            if (whOff + 8 <= e) {
              acc.width = (c.u32(whOff) >> 16).toInt
              acc.height = (c.u32(whOff + 4) >> 16).toInt
            }
          case ("mdia", s, e) =>
            walk(c, s, e) {
              case ("hdlr", hs, he) =>
                if (hs + 12 <= he) acc.handler = c.fourCc(hs + 8)
              case ("minf", ms, me) =>
                walk(c, ms, me) {
                  case ("stbl", ss, se) =>
                    walk(c, ss, se) {
                      case ("stts", ts, te) =>
                        if (ts + 8 <= te) {
                          val entries = c.u32(ts + 4)
                          var i = 0L
                          var pos = ts + 8
                          while (i < entries && pos + 8 <= te) {
                            acc.samples += c.u32(pos) // sample_count; delta ignored
                            i += 1
                            pos += 8
                          }
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
          case _ => ()
        }
        acc
      }

      val ok = walk(c, 0, bytes.length) {
        case ("ftyp", s, e) =>
          if (s + 4 <= e) brand = c.fourCc(s).trim.toLowerCase
        case ("moov", s, e) =>
          walk(c, s, e) {
            case ("mvhd", ms, me) =>
              val v = c.buf.get(ms).toInt & 0xff
              if (v == 1) {
                if (ms + 4 + 28 <= me) {
                  timescale = c.u32(ms + 4 + 16)
                  duration = c.u64(ms + 4 + 20)
                }
              } else if (ms + 4 + 16 <= me) {
                timescale = c.u32(ms + 4 + 8)
                duration = c.u32(ms + 4 + 12)
              }
            case ("trak", ts, te) =>
              nTracks += 1
              val t = parseTrak(ts, te)
              if (t.handler == "vide") {
                if (vw < 0) { vw = t.width; vh = t.height }
                vSamples += t.samples
              }
            case _ => ()
          }
        case _ => ()
      }
      // A parse is meaningful only if the walk completed and we saw both the
      // file-type box and a movie header — otherwise this isn't ISO BMFF.
      if (ok && brand != null && timescale > 0)
        Some(Meta(brand, timescale, duration, nTracks, vw, vh, vSamples))
      else None
    } catch {
      case _: Exception => None // any slicing surprise degrades, never throws
    }
  }

  // ---- sample tables (frame extraction) ---------------------------------

  /** Locate stored video frames via the sample tables: stsz (sizes) ×
    * stsc (samples-per-chunk runs) × stco/co64 (chunk offsets), samples
    * contiguous within a chunk (ISO/IEC 14496-12 §8.7). Returns
    * (fileOffset, size) per sample for the FIRST 'vide' track, in sample
    * order. General over multi-chunk layouts, not just [[writeMjpeg]]'s
    * single-chunk output. Same poison contract as [[parse]]: malformed
    * tables → None; a sample overrunning the file is dropped, not thrown.
    */
  def sampleTable(bytes: Array[Byte]): Option[Vector[(Long, Long)]] = {
    if (bytes == null || bytes.length < 8) return None
    try {
      val c = new Cursor(ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN))
      var result: Option[Vector[(Long, Long)]] = None

      def parseStbl(ss: Int, se: Int): Option[Vector[(Long, Long)]] = {
        // Declared entry counts are attacker-controlled. Two layers bound
        // every allocation: entries must physically fit in the box/file
        // (degrade-to-prefix on truncation), AND a hard constant ceiling —
        // at uniform=1 the physical cap alone is bytes.length entries,
        // which with boxed Longs would be ~16-24× the file size in heap.
        // Primitive builders + the ceiling keep worst case at tens of MB
        // (an OutOfMemoryError would escape the Exception catch).
        val maxEntries = 4 << 20 // far above any real movie's sample count
        val sizesB = new scala.collection.mutable.ArrayBuilder.ofLong
        val chunkB = new scala.collection.mutable.ArrayBuilder.ofLong
        // stsc runs: (firstChunk, samplesPerChunk) — 1-based firstChunk
        var stscRuns = Vector.empty[(Long, Long)]
        walk(c, ss, se) {
          case ("stsz", ts, te) =>
            if (ts + 12 <= te) {
              val uniform = c.u32(ts + 4)
              val n = c.u32(ts + 8)
              if (uniform != 0) {
                val cap = math.min(math.min(n, bytes.length / uniform),
                  maxEntries.toLong).toInt
                var i = 0
                while (i < cap) { sizesB += uniform; i += 1 }
              } else {
                var i = 0L; var pos = ts + 12
                while (i < n && i < maxEntries && pos + 4 <= te) {
                  sizesB += c.u32(pos); i += 1; pos += 4
                }
              }
            }
          case ("stco", ts, te) =>
            if (ts + 8 <= te) {
              val n = c.u32(ts + 4)
              var i = 0L; var pos = ts + 8
              while (i < n && i < maxEntries && pos + 4 <= te) {
                chunkB += c.u32(pos); i += 1; pos += 4
              }
            }
          case ("co64", ts, te) =>
            if (ts + 8 <= te) {
              val n = c.u32(ts + 4)
              var i = 0L; var pos = ts + 8
              while (i < n && i < maxEntries && pos + 8 <= te) {
                chunkB += c.u64(pos); i += 1; pos += 8
              }
            }
          case ("stsc", ts, te) =>
            if (ts + 8 <= te) {
              val n = c.u32(ts + 4)
              var i = 0L; var pos = ts + 8
              while (i < n && i < maxEntries && pos + 12 <= te) {
                stscRuns :+= ((c.u32(pos), c.u32(pos + 4))); i += 1; pos += 12
              }
            }
          case _ => ()
        }
        val sizes = sizesB.result()
        val chunkOffsets = chunkB.result()
        if (sizes.isEmpty || chunkOffsets.isEmpty) None
        else {
          // samples-per-chunk for chunk k (1-based) = the last stsc run with
          // firstChunk <= k (runs are sorted); missing stsc ⇒ all in chunk 1
          val runs = if (stscRuns.nonEmpty) stscRuns
            else Vector((1L, sizes.length.toLong))
          val out = Vector.newBuilder[(Long, Long)]
          var sample = 0
          var chunk = 0
          // stsc runs are spec-sorted by firstChunk; a monotone cursor keeps
          // the whole mapping O(samples + chunks + runs) even on adversarial
          // tables (a rescan-per-chunk would be O(chunks × runs))
          var runIdx = 0
          while (sample < sizes.length && chunk < chunkOffsets.length) {
            while (runIdx + 1 < runs.length && runs(runIdx + 1)._1 <= chunk + 1)
              runIdx += 1
            val perChunk =
              if (runs(runIdx)._1 <= chunk + 1) runs(runIdx)._2 else 0L
            var off = chunkOffsets(chunk)
            var j = 0L
            while (j < perChunk && sample < sizes.length) {
              val sz = sizes(sample)
              // overflow-safe bounds: off + sz can wrap on crafted co64
              if (off >= 0 && sz >= 0 && sz <= bytes.length &&
                off <= bytes.length - sz) out += ((off, sz))
              off += sz; j += 1; sample += 1
            }
            if (perChunk <= 0) return None // zero-progress guard
            chunk += 1
          }
          Some(out.result())
        }
      }

      // The first 'vide' track is authoritative: if its sample table is
      // malformed (parseStbl → None) the whole parse is None, rather than
      // silently falling through to a later vide track's table.
      var seenVide = false
      walk(c, 0, bytes.length) {
        case ("moov", s, e) =>
          walk(c, s, e) {
            case ("trak", ts, te) if !seenVide =>
              var handler = ""
              var stbl: Option[(Int, Int)] = None
              walk(c, ts, te) {
                case ("mdia", ms, me) =>
                  walk(c, ms, me) {
                    case ("hdlr", hs, he) =>
                      if (hs + 12 <= he) handler = c.fourCc(hs + 8)
                    case ("minf", fs, fe) =>
                      walk(c, fs, fe) {
                        case ("stbl", bs, be) => stbl = Some((bs, be))
                        case _ => ()
                      }
                    case _ => ()
                  }
                case _ => ()
              }
              if (handler == "vide") {
                seenVide = true
                result = stbl.flatMap { case (bs, be) => parseStbl(bs, be) }
              }
            case _ => ()
          }
        case _ => ()
      }
      result
    } catch { case _: Exception => None }
  }

  /** Extract stored frame payloads (e.g. JPEG images for MJPEG-in-MP4). */
  def frames(bytes: Array[Byte]): Seq[Array[Byte]] =
    sampleTable(bytes).getOrElse(Vector.empty).map { case (off, len) =>
      java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
    }

  /** Sample stored frames: every `stride`-th, at most `maxFrames` — the
    * [[Avi.sampleFrames]] shape, so the consumer path is container-agnostic.
    */
  def sampleFrames(bytes: Array[Byte], stride: Int,
      maxFrames: Int): Seq[(Int, Array[Byte])] =
    sampleTable(bytes).map { table =>
      table.indices.by(stride.max(1)).take(maxFrames).map { i =>
        val (off, len) = table(i)
        (i, java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt))
      }
    }.getOrElse(Seq.empty)

  // ---- writing (minimal valid file, used by specs + the oracle-gated
  //      round-trip query; also the documented fixture for plugging real
  //      codecs in later) ------------------------------------------------

  /** Byte length of everything except the mdat payload for [[write]]'s fixed
    * layout — pinned by Mp4Spec and used by q84's arithmetic oracle.
    */
  val fixedOverhead: Int = 361

  /** A minimal single-video-track MP4: ftyp + moov(mvhd, trak(tkhd,
    * mdia(mdhd, hdlr('vide'), minf(stbl(stts))))) + mdat(payloadLen zero
    * bytes). All version-0 boxes; timescale/duration/width/height/sample
    * count land where [[parse]] reads them back.
    */
  private def box(tpe: String)(body: DataOutputStream => Unit): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    body(out)
    out.flush()
    val payload = bos.toByteArray
    val full = ByteBuffer.allocate(8 + payload.length).order(ByteOrder.BIG_ENDIAN)
    full.putInt(8 + payload.length)
    full.put(tpe.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    full.put(payload)
    full.array()
  }
  private def fourCc(out: DataOutputStream, s: String): Unit =
    out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  def write(brand: String, timescale: Int, durationTicks: Long, width: Int,
      height: Int, nSamples: Int, payloadLen: Int): Array[Byte] = {
    require(brand.length == 4, s"brand must be a 4cc, got '$brand'")
    // version-0 mvhd/tkhd/mdhd carry 32-bit durations; a larger value would
    // silently truncate and round-trip wrong (parse supports 64-bit v1, but
    // this writer only emits v0)
    require(durationTicks >= 0 && durationTicks <= 0xffffffffL,
      s"durationTicks $durationTicks does not fit version-0 32-bit boxes")

    val ftyp = box("ftyp") { o =>
      fourCc(o, brand); o.writeInt(0); fourCc(o, brand); fourCc(o, "iso2")
    }
    val mvhd = box("mvhd") { o =>
      o.writeInt(0) // version 0 + flags
      o.writeInt(0); o.writeInt(0) // creation, modification
      o.writeInt(timescale)
      o.writeInt(durationTicks.toInt)
      o.writeInt(0x00010000); o.writeShort(0x0100); o.writeShort(0) // rate, volume, reserved
      o.writeLong(0L) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.writeInt) // unity matrix
      (0 until 6).foreach(_ => o.writeInt(0)) // pre_defined
      o.writeInt(2) // next_track_ID
    }
    val tkhd = box("tkhd") { o =>
      o.writeInt(0x7) // version 0, flags: enabled|in_movie|in_preview
      o.writeInt(0); o.writeInt(0) // creation, modification
      o.writeInt(1) // track_ID
      o.writeInt(0) // reserved
      o.writeInt(durationTicks.toInt)
      o.writeLong(0L) // reserved
      o.writeShort(0); o.writeShort(0); o.writeShort(0); o.writeShort(0) // layer, alt_group, volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.writeInt)
      o.writeInt(width << 16); o.writeInt(height << 16) // 16.16 fixed
    }
    val mdhd = box("mdhd") { o =>
      o.writeInt(0)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(timescale); o.writeInt(durationTicks.toInt)
      o.writeShort(0x55c4) // language 'und'
      o.writeShort(0)
    }
    val hdlr = box("hdlr") { o =>
      o.writeInt(0); o.writeInt(0)
      fourCc(o, "vide")
      (0 until 3).foreach(_ => o.writeInt(0))
      o.writeByte(0) // empty null-terminated name
    }
    val stts = box("stts") { o =>
      o.writeInt(0)
      o.writeInt(1) // entry_count
      o.writeInt(nSamples); o.writeInt(1) // sample_count, sample_delta
    }
    val stbl = box("stbl")(o => o.write(stts))
    val minf = box("minf")(o => o.write(stbl))
    val mdia = box("mdia") { o => o.write(mdhd); o.write(hdlr); o.write(minf) }
    val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
    val moov = box("moov") { o => o.write(mvhd); o.write(trak) }
    val mdat = box("mdat")(o => o.write(new Array[Byte](payloadLen)))

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }

  /** An MJPEG-in-MP4 with REAL sample tables: one video track whose mdat
    * holds the JPEG frames back-to-back in one chunk, located by
    * stsz (per-frame sizes) + stsc (one run: all samples in chunk 1) +
    * stco (one offset). [[sampleTable]]/[[frames]] read them back
    * generally, so writer and reader meet only at the spec'd tables —
    * the same writer↔parser drift guard as [[Avi.write]]/[[Avi.parse]].
    * `timescale` ticks/s, one tick per frame.
    */
  def writeMjpeg(width: Int, height: Int, timescale: Int,
      jpegFrames: Seq[Array[Byte]]): Array[Byte] = {
    // a zero-frame file would write stsz n=0, which the reader (correctly)
    // rejects as table-less — refuse to write what we would not read back
    require(jpegFrames.nonEmpty, "writeMjpeg requires at least one frame")
    val n = jpegFrames.length
    def moovAt(mdatPayloadOff: Long): Array[Byte] = {
      val mvhd = box("mvhd") { o =>
        o.writeInt(0)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(timescale)
        o.writeInt(n)
        o.writeInt(0x00010000); o.writeShort(0x0100); o.writeShort(0)
        o.writeLong(0L)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.writeInt)
        (0 until 6).foreach(_ => o.writeInt(0))
        o.writeInt(2)
      }
      val tkhd = box("tkhd") { o =>
        o.writeInt(0x7)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(1)
        o.writeInt(0)
        o.writeInt(n)
        o.writeLong(0L)
        o.writeShort(0); o.writeShort(0); o.writeShort(0); o.writeShort(0)
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.writeInt)
        o.writeInt(width << 16); o.writeInt(height << 16)
      }
      val mdhd = box("mdhd") { o =>
        o.writeInt(0)
        o.writeInt(0); o.writeInt(0)
        o.writeInt(timescale); o.writeInt(n)
        o.writeShort(0x55c4); o.writeShort(0)
      }
      val hdlr = box("hdlr") { o =>
        o.writeInt(0); o.writeInt(0)
        fourCc(o, "vide")
        (0 until 3).foreach(_ => o.writeInt(0))
        o.writeByte(0)
      }
      val stts = box("stts") { o =>
        o.writeInt(0); o.writeInt(1)
        o.writeInt(n); o.writeInt(1)
      }
      val stsc = box("stsc") { o =>
        o.writeInt(0); o.writeInt(1)
        o.writeInt(1); o.writeInt(n); o.writeInt(1) // chunk 1 holds all samples
      }
      val stsz = box("stsz") { o =>
        o.writeInt(0); o.writeInt(0); o.writeInt(n) // non-uniform sizes
        jpegFrames.foreach(f => o.writeInt(f.length))
      }
      val stco = box("stco") { o =>
        o.writeInt(0); o.writeInt(1)
        o.writeInt(mdatPayloadOff.toInt)
      }
      val stbl = box("stbl") { o =>
        o.write(stts); o.write(stsc); o.write(stsz); o.write(stco)
      }
      val minf = box("minf")(o => o.write(stbl))
      val mdia = box("mdia") { o => o.write(mdhd); o.write(hdlr); o.write(minf) }
      val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
      box("moov") { o => o.write(mvhd); o.write(trak) }
    }
    val ftyp = box("ftyp") { o =>
      fourCc(o, "mp42"); o.writeInt(0); fourCc(o, "mp42"); fourCc(o, "iso2")
    }
    // stco needs the absolute mdat payload offset, which depends on moov's
    // own length — build moov once with 0, then rebuild at the real offset
    // (same length: stco's entry is fixed-width)
    val moovLen = moovAt(0L).length
    val moov = moovAt(ftyp.length.toLong + moovLen + 8)
    val mdat = box("mdat")(o => jpegFrames.foreach(o.write))
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov); out.write(mdat)
    out.toByteArray
  }

  /** REAL video decoder for MJPEG-in-MP4 — the second real container/codec
    * pair through [[Multimodal.MediaDecoder]] (sibling of
    * [[Multimodal.AviMjpegDecoder]]). `format` = "mp4/" + brand,
    * `n_frames` = frames actually LOCATED by the sample tables (not the
    * declared stts count — a truncated mdat reports what survives).
    * Header-only: payloads are located, not pixel-decoded; decode sampled
    * frames downstream via [[sampleFrames]] + ImagePoolingExtractor,
    * exactly the AVI consumer shape.
    */
  object MjpegDecoder extends Multimodal.MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Multimodal.MediaMeta] =
      payloads.map { bytes =>
        (parse(bytes), sampleTable(bytes)) match { // both are null-safe
          case (Some(m), Some(table)) =>
            Multimodal.MediaMeta("mp4/" + m.brand, m.videoWidth, m.videoHeight,
              table.length, bytes.length.toLong)
          case _ =>
            Multimodal.MediaMeta("unknown", -1, -1, 0,
              if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }

  /** [[Multimodal.MediaDecoder]] over [[parse]] — the video sibling of
    * ImageIoDecoder/AudioSystemDecoder. Mapping: `format` = major brand,
    * `width`/`height` = first video track dimensions, `n_frames` = stts
    * sample count (capped to Int). Non-BMFF payloads degrade to
    * `("unknown", -1, -1, 0, len)` — same poison contract as the others.
    */
  object VideoContainerDecoder extends Multimodal.MediaDecoder {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Multimodal.MediaMeta] =
      payloads.map { bytes =>
        parse(bytes) match {
          case Some(m) =>
            Multimodal.MediaMeta(m.brand, m.videoWidth, m.videoHeight,
              math.min(m.nSamples, Int.MaxValue.toLong).toInt, bytes.length.toLong)
          case None =>
            Multimodal.MediaMeta("unknown", -1, -1, 0,
              if (bytes == null) 0L else bytes.length.toLong)
        }
      }
  }
}
