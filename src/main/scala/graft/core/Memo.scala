package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped single-build memo for query-shared artifacts (persisted
  * projections, side databases). A `persist()` inside a query function has
  * no unpersist hook once the lazy DataFrame is returned; without a memo,
  * every invocation (e.g. 3 bench repeats) builds and pins a NEW copy —
  * unbounded growth. Memoizing by (session, key) bounds the footprint to
  * one artifact per scale directory per session, which is the deliberate
  * tradeoff everywhere this is used: a small documented projection pinned
  * for the session, in exchange for single-scan plans. Thread-safe (Verify
  * dumps queries from 4 concurrent threads).
  */
object Memo {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), AnyRef]()

  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    entries.computeIfAbsent((spark, key), _ => build).asInstanceOf[T]
}
