package graft

class EntryContractSpec extends SparkTestBase {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and names are unique") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("EVERY query declares an oracle (no rows-only entries, round-2 invariant)") {
    val missing = SparkEntry.allDefs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (add one or a pinned/bounded twin): $missing")
  }

  test("every query runs and returns non-negative rows at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
