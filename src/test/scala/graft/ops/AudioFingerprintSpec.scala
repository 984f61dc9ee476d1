package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Audio fingerprint: WAV round-trip exactness, gain invariance, and
  * agreement with the arithmetic hash q198's oracle re-derives in SQL.
  */
class AudioFingerprintSpec extends AnyFunSuite {

  private def plantedAmps(seed: Int, gain: Int): Array[Int] =
    Array.tabulate(AudioFingerprint.NFrames)(i =>
      AudioFingerprint.plantedLevel(seed, i) * gain)

  private def arithmeticFp(seed: Int): Int = {
    var fp = 0
    for (i <- 0 until AudioFingerprint.NFrames - 1) {
      if (AudioFingerprint.plantedLevel(seed, i + 1) >
          AudioFingerprint.plantedLevel(seed, i)) fp |= 1 << i
    }
    fp
  }

  test("decoded energies equal the planted amplitudes exactly") {
    val amps = plantedAmps(seed = 7, gain = 2)
    val e = AudioFingerprint.frameEnergies(AudioFingerprint.squareWav(amps))
    assert(e.map(_.toSeq).contains(amps.map(_.toLong).toSeq))
  }

  test("fingerprint equals the arithmetic hash for every seed") {
    (0 until 48).foreach { seed =>
      val fp = AudioFingerprint.fingerprint16(
        AudioFingerprint.squareWav(plantedAmps(seed, 1)))
      assert(fp.contains(arithmeticFp(seed)), s"seed $seed diverged")
    }
  }

  test("fingerprint is exactly invariant to uniform gain") {
    (0 until 16).foreach { seed =>
      val fps = Seq(1, 2, 3).map(g =>
        AudioFingerprint.fingerprint16(
          AudioFingerprint.squareWav(plantedAmps(seed, g))))
      assert(fps.distinct.size == 1, s"seed $seed: gain changed the hash")
    }
  }

  test("distinct seeds mostly produce distinct fingerprints") {
    val fps = (0 until 48).map(s => AudioFingerprint.fingerprint16(
      AudioFingerprint.squareWav(plantedAmps(s, 1))).get)
    assert(fps.distinct.size > 40, s"only ${fps.distinct.size} distinct")
  }

  test("undecodable bytes are None") {
    assert(AudioFingerprint.fingerprint16(Array[Byte](9, 9, 9)).isEmpty)
  }
}
