package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frequent-items (heavy hitters) via a mergeable Misra-Gries sketch +
  * exact second pass — the sketch-gated two-pass pattern that finds every
  * item with frequency > N/(k+1) at any scale without a full-vocabulary
  * aggregate surviving to the driver.
  *
  * Why not just groupBy-count-filter? At 100 TB the term dictionary itself
  * can be billions of keys — the full aggregate is a massive shuffle whose
  * output is then thrown away by the threshold filter. The MG sketch
  * bounds pass 1 to k counters per partition, merged treewise (one
  * k-sized object per partition crosses the wire, `treeAggregate` — the
  * genuine per-partition-imperative case where an RDD fold is the right
  * tool); pass 2 counts ONLY the ≤ k candidates, a filter that prunes
  * map-side before any shuffle. Determinism: MG's candidate SET depends on
  * merge order, but the guarantee — every true-frequency > N/(k+1) item
  * survives — holds for ANY merge order (mergeable-summaries property),
  * and the exact pass 2 filter makes the OUTPUT exactly
  * {items : cnt·(k+1) > N}, independent of sketch internals.
  */
object HeavyHitters {

  /** Mergeable Misra-Gries: at most k counters; `n` tracks the TRUE stream
    * length (never decremented).
    */
  final class MGSketch(val k: Int) extends Serializable {
    require(k >= 1, "k must be >= 1")
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty
    var n: Long = 0L

    def add(item: String): Unit = {
      n += 1
      counters.get(item) match {
        case Some(c) => counters.update(item, c + 1)
        case None if counters.size < k => counters.update(item, 1L)
        case None => // full: decrement-all is the classic O(k) amortized step
          val dead = mutable.ArrayBuffer.empty[String]
          counters.mapValuesInPlace((_, c) => c - 1)
          counters.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(counters.remove)
      }
    }

    /** Merge `other` in (destructive on `this`): sum counters, then if over
      * k, subtract the (k+1)-th largest count from all and drop the
      * non-positive — the standard mergeable-MG reduction.
      */
    def merge(other: MGSketch): MGSketch = {
      n += other.n
      other.counters.foreach { case (t, c) =>
        counters.update(t, counters.getOrElse(t, 0L) + c)
      }
      if (counters.size > k) {
        val kth = counters.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - kth)
        counters.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counters.remove)
      }
      this
    }
  }

  /** Pass 1: one scan, per-partition MG folds merged treewise. */
  def sketch(df: DataFrame, itemCol: Column, k: Int): MGSketch = {
    import org.apache.spark.sql.Encoders
    df.select(itemCol.cast("string")).na.drop()
      .as[String](Encoders.STRING)
      .rdd
      .treeAggregate(new MGSketch(k))(
        (s, t) => { s.add(t); s },
        (a, b) => a.merge(b))
  }

  /** Exact heavy hitters {item : cnt·(k+1) > N}: sketch-gated two-pass.
    * The candidate filter runs map-side before pass 2's (tiny) aggregate;
    * the threshold compares integers (`cnt·(k+1) > N`) — no division, no
    * float drift.
    */
  def exact(df: DataFrame, itemCol: Column, k: Int): DataFrame = {
    val sk = sketch(df, itemCol, k)
    val candidates = sk.counters.keys.toSeq
    val counted = df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isin(candidates: _*))
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (k + 1) > lit(sk.n))
    if (candidates.isEmpty) counted.limit(0) else counted // empty isin is all-false, but be explicit
  }
}
