package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFormat, AudioInputStream}

/** Scale-invariant audio fingerprinting for multimodal near-dup dedup —
  * the audio leg of the family (text: MinHash/SimHash; image: dHash
  * [[ImageHash]]): re-encoded or re-gained copies of the same recording
  * must share a fingerprint even though their bytes differ.
  *
  * The fingerprint is a 16-bit energy-profile hash: decode (real
  * `AudioSystem` path), mean |sample| per 256-sample frame (17 frames),
  * one bit per adjacent frame pair set iff the energy RATIO exceeds 2
  * (`e(i+1) > 2·e(i)`). Ratio comparisons make the hash EXACTLY invariant
  * to uniform gain: scaling every sample by g scales every frame energy
  * by g and cancels out of each comparison — the invariance q198's
  * planted gain jitter proves end to end. Planted energy levels are
  * separated by 3× (md5-derived from {300, 900, 2700, 8100}), so each
  * comparison is decided by a factor of 1.5 beyond the threshold, not by
  * rounding luck; square-wave frames make the decoded mean-|sample| equal
  * the amplitude EXACTLY (16-bit PCM is lossless), keeping everything
  * integer-deterministic.
  */
object AudioFingerprint {

  val NFrames = 17
  val FrameSamples = 256
  val SampleRate = 8000f
  val Levels: Array[Int] = Array(300, 900, 2700, 8100)

  /** Planted frame level for q198's synthesized corpus — mirrors the SQL
    * `('0x' || substr(md5('aud:' || seed || ':' || i), 1, 8))::BIGINT % 4`
    * exactly.
    */
  def plantedLevel(seed: Long, i: Int): Int = {
    val hex = Md5.hex8(s"aud:$seed:$i")
    Levels((java.lang.Long.parseLong(hex, 16) % 4).toInt)
  }

  /** Synthesize a mono 16-bit PCM WAV whose frame i is a ±amps(i)
    * square wave (8-sample half-period). Max amp must stay < 32768/g for
    * the caller's gain.
    */
  def squareWav(amps: Array[Int]): Array[Byte] = {
    require(amps.length == NFrames, s"need $NFrames frame amplitudes")
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false) // LE signed
    val pcm = new Array[Byte](NFrames * FrameSamples * 2)
    var i = 0
    while (i < NFrames * FrameSamples) {
      val a = amps(i / FrameSamples)
      val v = if ((i / 8) % 2 == 0) a else -a
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      (NFrames * FrameSamples).toLong)
    val out = new ByteArrayOutputStream()
    // cached SPI writer — AudioSystem.write re-scans providers under a
    // global lock per call and serializes executors (SoundProviders)
    SoundProviders.writeWave(ais, out)
    out.toByteArray
  }

  /** Decode through the real `AudioSystem` path and return the exact
    * integer mean |sample| per frame; None for undecodable bytes.
    */
  def frameEnergies(bytes: Array[Byte]): Option[Array[Long]] =
    try {
      val ais = SoundProviders.audioInputStream(bytes).getOrElse(return None)
      val data = ais.readAllBytes()
      ais.close()
      val n = data.length / 2
      if (n < NFrames * FrameSamples) None
      else Some(Array.tabulate(NFrames) { f =>
        var sum = 0L
        var s = f * FrameSamples
        while (s < (f + 1) * FrameSamples) {
          val v = ((data(2 * s + 1) << 8) | (data(2 * s) & 0xff)).toShort
          sum += math.abs(v.toLong)
          s += 1
        }
        sum / FrameSamples
      })
    } catch { case _: Exception => None }

  /** 16-bit ratio fingerprint — bit i set iff e(i+1) > 2·e(i). */
  def fingerprint16(bytes: Array[Byte]): Option[Int] =
    frameEnergies(bytes).map { e =>
      var fp = 0
      var i = 0
      while (i < NFrames - 1) {
        if (e(i + 1) > 2L * e(i)) fp |= 1 << i
        i += 1
      }
      fp
    }
}
