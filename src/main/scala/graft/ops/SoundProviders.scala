package graft.ops

import java.io.{ByteArrayInputStream, InputStream, OutputStream}

import scala.jdk.CollectionConverters._

import javax.sound.sampled.{AudioFileFormat, AudioInputStream, UnsupportedAudioFileException}
import javax.sound.sampled.spi.{AudioFileReader, AudioFileWriter}

/** JVM-cached `javax.sound` SPI providers.
  *
  * Why this exists: every `AudioSystem.getAudioInputStream` /
  * `getAudioFileFormat` / `write` call re-runs provider discovery through
  * `JDK13Services.getProviders`, which is a SYNCHRONIZED static that
  * deliberately re-scans the ServiceLoader on each call. On a 32-thread
  * executor that lock serializes the whole audio path — measured on q198:
  * sf1 ran in the SAME 38 s at 4 threads and at 32 threads (zero
  * speedup), i.e. the fingerprint pipeline was lock-bound, not CPU-bound.
  * Loading the provider lists ONCE per JVM (the providers themselves are
  * stateless parser/writer instances and thread-safe) restores
  * embarrassingly-parallel scaling while keeping the REAL codec path —
  * this is the public SPI API, just with the rediscovery hoisted.
  */
object SoundProviders {

  lazy val readers: List[AudioFileReader] =
    java.util.ServiceLoader.load(classOf[AudioFileReader],
      classOf[AudioFileReader].getClassLoader).iterator().asScala.toList

  lazy val writers: List[AudioFileWriter] =
    java.util.ServiceLoader.load(classOf[AudioFileWriter],
      classOf[AudioFileWriter].getClassLoader).iterator().asScala.toList

  /** Last reader that accepted a stream on this thread — probed first.
    * Why: a miss is not cheap — notably `SoftMidiAudioFileReader` (listed
    * BEFORE the Wave readers) takes a global synthesizer lock just to
    * reject non-MIDI bytes, which re-serialized the q198 decode path
    * (direct Wave probe: 2.5 µs and thread-scalable; through the ordered
    * miss chain: ~72 µs and FLAT at 16 threads). On a steady-state
    * corpus only the matching reader is ever probed after the first row.
    */
  private val lastHit = new ThreadLocal[AudioFileReader]

  /** First provider that accepts the stream, or None. The input must
    * support mark/reset (ByteArrayInputStream does) — the SPI probe
    * contract.
    */
  def audioInputStream(bytes: Array[Byte]): Option[AudioInputStream] =
    firstReader(new ByteArrayInputStream(bytes))(_.getAudioInputStream(_))

  /** Header-only probe (no sample decode). */
  def audioFileFormat(bytes: Array[Byte]): Option[AudioFileFormat] =
    firstReader(new ByteArrayInputStream(bytes))(_.getAudioFileFormat(_))

  private def firstReader[T](in: InputStream)(
      f: (AudioFileReader, InputStream) => T): Option[T] = {
    val cached = lastHit.get()
    if (cached != null) {
      try return Some(f(cached, in))
      catch { case _: UnsupportedAudioFileException => in.reset() }
    }
    val it = readers.iterator
    while (it.hasNext) {
      val r = it.next()
      if (r ne cached) {
        try {
          val v = f(r, in)
          lastHit.set(r)
          return Some(v)
        } catch { case _: UnsupportedAudioFileException => in.reset() }
      }
    }
    None
  }

  /** Write WAVE through the cached writer provider. */
  def writeWave(ais: AudioInputStream, out: OutputStream): Unit =
    writers.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE, ais)) match {
      case Some(w) => w.write(ais, AudioFileFormat.Type.WAVE, out)
      case None => throw new IllegalStateException("no WAVE writer provider")
    }
}
