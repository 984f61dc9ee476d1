package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Percentile computation mode — the explicit exact↔approximate knob for
  * every operator whose thresholds come from a percentile aggregation
  * (q45 severity thresholds, q108 median/MAD, q130 equi-depth bounds,
  * the CLV bucket thresholds).
  *
  * Why a knob and not a hardcode: exact `percentile` buffers EVERY value
  * of the group in one aggregation state — at the oracle gate (≤10⁵ rows
  * per group) that is the right default, because it is bit-reproducible
  * against DuckDB's `quantile_cont` (same interpolated-rank IEEE
  * sequence). At 100 TB a single global group holds ~10¹¹ values: the
  * buffering aggregation is a guaranteed executor OOM, and the scale
  * path must be `approx_percentile` (Greenwald–Khanna sketch: mergeable,
  * bounded state) whose result carries a RANK error bound instead of
  * bit-equality:
  *
  *   rank(returned value) ∈ [⌊p·n⌋ − n/accuracy, ⌊p·n⌋ + n/accuracy]
  *
  * i.e. the returned value is an actual element of the column whose rank
  * is within `n/accuracy` of the requested percentile. State is
  * O(accuracy·log n) per group, independent of group size — what makes
  * the swap safe on a 1000-executor cluster. PercentileModeSpec pins the
  * bound empirically; q234 pins it under the driver's oracle gate.
  *
  * Both modes produce the SAME downstream plan shape (tiny threshold
  * aggregate → broadcast join → map-side comparisons); only the
  * aggregation function changes. Exact stays the default everywhere so
  * the 233 oracle hashes are untouched.
  */
object Percentiles {
  sealed trait Mode

  /** Exact interpolated percentile (Spark `percentile` ≡ DuckDB
    * `quantile_cont`). Oracle-gated default; buffers the group's values.
    */
  case object Exact extends Mode

  /** `approx_percentile` at the given accuracy: rank error ≤ n/accuracy,
    * O(accuracy·log n) mergeable state. 10000 (the q48 precedent) keeps
    * the error under 0.01% of ranks — far inside any bucketing decision
    * the engine makes with the result.
    */
  final case class Approx(accuracy: Int = 10000) extends Mode

  /** percentile(c, p) under the chosen mode. */
  def pctl(c: Column, p: Double, mode: Mode): Column = mode match {
    case Exact       => percentile(c, lit(p))
    case Approx(acc) => percentile_approx(c, lit(p), lit(acc))
  }
}
