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
    lazy val value: AnyRef = build0()
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
}
