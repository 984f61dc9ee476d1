package graft

import java.util.Locale

/** Locale-safe JSON fragments for [[Bench]]'s driver contract and host
  * forensics. Round 11 pinned the whole JVM with `Locale.setDefault
  * (Locale.ROOT)` to keep `%f` output valid JSON under comma-decimal
  * defaults — and the global mutation promptly bit Derby, which derives
  * a new database's locale from the JVM default and rejects ROOT
  * (XBM0X), silently excluding q73 from every bench pass until the
  * `territory=en_US` URL pin (BASELINE round-11 tail; the pin stays in
  * `queries/JdbcQ.scala` as defense-in-depth). VERDICT r11 item 7:
  * format each JSON number AT THE SITE with an explicit `Locale.ROOT`
  * instead, so no other library ever sees a mutated default.
  * BenchJsonSpec runs every builder under a comma-decimal default
  * locale and asserts the output parses as JSON.
  *
  * Raw `Double` concatenation (`"" + d` → `Double.toString`) is already
  * locale-independent per the Java spec; these helpers exist for the
  * fixed-precision `%.Nf` sites.
  */
object BenchJson {

  /** `%.pf`-formatted double, always '.'-decimal regardless of the JVM
    * default locale.
    */
  def num(d: Double, p: Int): String =
    String.format(Locale.ROOT, s"%.${p}f", Double.box(d))

  def calRecord(tag: String, tsMs: Long, stMs: Double, threads: Int,
                mtMs: Double, eff: Double, diskMs: Double): String =
    s"""{"tag":"$tag","ts_ms":$tsMs,"st_ms":${num(stMs, 1)},""" +
      s""""threads":$threads,"mt_ms":${num(mtMs, 1)},""" +
      s""""eff":${num(eff, 2)},"disk32mb_ms":${num(diskMs, 1)}}"""

  def retryRecord(q: String, original: Double, retry: Double, kept: Double,
                  taintEvidence: Boolean, reason: String): String =
    s"""{"q":"$q","original":${num(original, 3)},"retry":${num(retry, 3)},""" +
      s""""kept":${num(kept, 3)},"taint_evidence":$taintEvidence,""" +
      s""""reason":"$reason"}"""

  def taintRecord(q: String, spinRatio: Double, steal: Long, iow: Long): String =
    s"""{"q":"$q","spin_ratio":${num(spinRatio, 2)},""" +
      s""""steal_jiffies":$steal,"iowait_jiffies":$iow}"""

  def sample(tsMs: Long, spinMs: Double, steal: Long, iow: Long): String =
    s"""[$tsMs,${num(spinMs, 1)},$steal,$iow]"""

  /** The LAST stdout line of a full run — must fit the driver's ~2 KB
    * tail capture and parse standalone.
    */
  def compactTotal(total: Double, top: Seq[(String, Double)], sfDir: String,
                   nQueries: Int): String = {
    val tops = top.map { case (k, v) => s""""$k":${num(v, 3)}""" }
      .mkString("{", ",", "}")
    s"""{"metric":"total","value":${num(total, 3)},"unit":"sec",""" +
      s""""queries":$tops,"sf":"$sfDir","n_queries":$nQueries,""" +
      """"queries_note":"top-20 of the full set by cost; complete map in """ +
      """target/bench.json, host forensics in target/bench_host.json"}"""
  }
}
