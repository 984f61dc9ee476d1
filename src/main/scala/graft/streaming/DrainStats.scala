package graft.streaming

/** Per-JVM record of streaming-drain throughput (VERDICT r16 stretch
  * item 8): the q231/q232 parity queries contribute ~10 s of the graded
  * suite total, most of it the AvailableNow micro-batch harness itself —
  * the graded artifact should show the drain's ROWS/SECOND, not just its
  * wall. The parity queries record (input rows, drain seconds) here after
  * each drain; [[graft.Bench]] folds a compact `stream` object into the
  * graded JSON lines when entries exist. Diagnostic only — never part of
  * any correctness path.
  */
object DrainStats {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()

  def record(name: String, rows: Long, secs: Double): Unit = {
    m.put(name, (rows, secs)); ()
  }

  /** Snapshot, name-sorted for deterministic JSON. */
  def snapshot: Seq[(String, (Long, Double))] = {
    import scala.jdk.CollectionConverters._
    m.asScala.toSeq.sortBy(_._1)
  }
}
