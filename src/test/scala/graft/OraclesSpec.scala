package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the oracle resource store (VERDICT r15 item 8): section
  * parsing, the macro/param substitution forms, and — most importantly —
  * every failure mode being LOUD at registration time. Fixture:
  * src/test/resources/graft/oracles/_spec.sql.
  */
class OraclesSpec extends AnyFunSuite {

  test("plain section round-trips exactly (separator blank line dropped)") {
    assert(Oracles("_spec", "plain") == "SELECT 1 AS x\nFROM lineitem")
  }

  test("interior blank lines are preserved") {
    assert(Oracles.family("_spec")("interior")
      == "\nSELECT 'keeps interior blank lines'\n\nFROM dual")
  }

  test("DSUM/DSUM4/DAVG macros expand through OracleSql (single source)") {
    import graft.ops.{OracleSql => O}
    val got = Oracles("_spec", "macros")
    assert(got.contains(O.dsum("l_quantity")))
    assert(got.contains(O.dsum4("l_tax")))
    assert(got.contains(O.davg("l_discount")))
    assert(!got.contains("{{"))
  }

  test("params substitute and support SQL-list values") {
    val got = Oracles("_spec", "params",
      "cap" -> "4096", "langs" -> "'en','fr'")
    assert(got == "SELECT * FROM documents WHERE n <= 4096 " +
      "AND lang IN ('en','fr')")
  }

  test("missing section, missing resource, missing/unused params all throw") {
    assertThrows[RuntimeException](Oracles("_spec", "nope"))
    assertThrows[IllegalArgumentException](Oracles("_no_such_family", "x"))
    assertThrows[RuntimeException](Oracles("_spec", "params", "cap" -> "1"))
    assertThrows[IllegalArgumentException](
      Oracles("_spec", "plain", "stray" -> "1"))
  }

  test("duplicate section names in a resource throw at parse") {
    assertThrows[IllegalArgumentException](Oracles("_dup", "a"))
  }

  test("no orphan sections: every registry resource section is requested") {
    // Force the whole registry (loads every family resource and serves
    // every oracle), then ask the store what was parsed but never used.
    // A retired/renamed query must take its resource SQL with it.
    SparkEntry.allDefs
    val leftovers = Oracles.orphans
      .filterNot(_.startsWith("_")) // this spec's own fixtures
    assert(leftovers.isEmpty, s"orphan oracle sections: $leftovers")
  }

  test("no orphan FILES: every main oracle resource belongs to a loaded family") {
    // Oracles.orphans only sees families that were parsed at all — a
    // family retired from SparkEntry.defGroups would leave its whole
    // .sql file invisible to the section check. Enumerate the source
    // tree and require each non-fixture file's family to have loaded.
    SparkEntry.allDefs
    val dir = new java.io.File("src/main/resources/graft/oracles")
    assert(dir.isDirectory, dir.getAbsolutePath)
    val files = dir.listFiles().map(_.getName)
      .filter(n => n.endsWith(".sql") && !n.startsWith("_")).toSeq.sorted
    assert(files.nonEmpty)
    val dead = files.map(_.stripSuffix(".sql"))
      .filterNot(fam => Oracles.family(fam).nonEmpty && Oracles.orphans
        .forall(o => !o.startsWith(s"$fam::")))
    assert(dead.isEmpty, s"oracle resource files with no loaded family: $dead")
  }

  test("every registered oracle is non-empty and substitution-free") {
    // The registry builds through Oracles for extracted families; whatever
    // the construction path, the final text must carry no unresolved
    // substitution and no stripMargin residue. (A lone `|`-prefixed line
    // can be legitimate SQL — q81's regex alternation — so the margin
    // check requires the full stripMargin SIGNATURE: every continuation
    // line margin-prefixed.)
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(!sql.contains("{{") && !sql.contains("}}"), name)
      val cont = sql.linesIterator.drop(1).toSeq
      assert(!(cont.nonEmpty && cont.forall(_.matches("""^\s*\|.*"""))), name)
    }
  }
}
