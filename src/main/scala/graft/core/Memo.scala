package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped single-build memo for query-shared artifacts (persisted
  * projections, side databases). A `persist()` inside a query function has
  * no unpersist hook once the lazy DataFrame is returned; without a memo,
  * every invocation (e.g. 3 bench repeats) builds and pins a NEW copy —
  * unbounded growth. Memoizing bounds the footprint to one artifact per
  * key per LIVE session — the deliberate tradeoff everywhere this is used:
  * a small documented projection pinned for the session, in exchange for
  * single-scan plans.
  *
  * Two structural properties (round-2 review findings):
  *  - the outer map holds sessions WEAKLY: a stopped-and-dropped
  *    SparkSession's entries become unreachable and collectable, so a
  *    long-lived JVM cycling sessions doesn't accumulate dead plans;
  *  - `computeIfAbsent` only allocates a cheap lazy holder, so one thread's
  *    multi-second Spark build never blocks unrelated keys on a map bin
  *    lock (the build itself synchronizes per-holder via `lazy val`).
  * Thread-safe — Verify dumps queries from 4 concurrent threads.
  */
object Memo {
  private final class Holder(build0: () => AnyRef) {
    @volatile var built = false
    lazy val value: AnyRef = { val v = build0(); built = true; v }
  }

  private val bySession =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Holder]]()

  private def sessionMap(spark: SparkSession) = bySession.synchronized {
    var m = bySession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, Holder]()
      bySession.put(spark, m)
    }
    m
  }

  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    sessionMap(spark)
      .computeIfAbsent(key, _ => new Holder(() => build))
      .value.asInstanceOf[T]

  /** Every Dataset reachable from a memo value: the value itself, or —
    * for tuple / case-class artifacts like `(deg, edges)` and the
    * pipeline's QualityOutput — its Product elements, recursively.
    */
  private def datasets(v: Any): Seq[org.apache.spark.sql.Dataset[_]] = v match {
    case d: org.apache.spark.sql.Dataset[_] => Seq(d)
    case p: Product => p.productIterator.flatMap(datasets).toSeq
    case _ => Seq.empty
  }

  /** Family-scoped release: unpersist every cached Dataset under keys
    * starting with `prefix` (default: all keys) and drop those entries,
    * so the next access rebuilds from scratch. This is the bound on the
    * memo's AGGREGATE footprint: per-key the memo is already bounded
    * (one artifact per live session), but a 150-query suite run pins
    * every family's artifacts simultaneously — Bench calls this at each
    * family boundary so no two families' caches coexist (GC pressure on
    * long suite runs was measurable: round-5 stage logs showed 37–46 s
    * of gcSum in single stages).
    *
    * Non-Dataset artifacts (scratch-file paths, JDBC URLs) are kept by
    * default: they hold no executor memory, and dropping them would make
    * the next reader re-write files that are still perfectly good.
    * Never-built holders are removed without forcing them — releasing
    * must not trigger the build it exists to undo. Unpersist blocks, so
    * the memory is actually free before the caller's next build starts.
    *
    * `dropKeptArtifacts = true` removes those non-Dataset entries too.
    * This exists for exactly one caller: Bench's stall-retry loop, which
    * must re-measure a query's FULL declared work. A kept scratch path /
    * Derby connection / collected merge list lets a retry ride state no
    * fresh-JVM first run could ever see — r19 caught retried q73/q74/
    * q195/q94 measuring 0.04–0.15 s against 1.1–2.6 s real (the memo-ride
    * pollution class; the fakes then self-perpetuated through the floor
    * table's min-fold). Rebuilds are idempotent by construction: every
    * such artifact is written to a FRESH temp dir at build time.
    */
  def release(spark: SparkSession, prefix: String = "",
              dropKeptArtifacts: Boolean = false): Unit = {
    val m = bySession.synchronized { bySession.get(spark) }
    if (m != null) {
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey.startsWith(prefix)) {
          if (!e.getValue.built) it.remove()
          else {
            val ds = datasets(e.getValue.value)
            ds.foreach(_.unpersist(blocking = true))
            if (ds.nonEmpty || dropKeptArtifacts) it.remove()
          }
        }
      }
    }
  }
}
