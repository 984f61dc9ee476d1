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

  test("a header-lookalike comment glued to a body throws at parse " +
      "(ADVICE r16: no silent section split)") {
    val e = intercept[IllegalArgumentException](Oracles("_glued", "first"))
    assert(e.getMessage.contains("lookalike") ||
      e.getMessage.contains("blank separator"))
  }

  test("a genuine trailing blank line at EOF survives (only the closing " +
      "separator is stripped)") {
    // _spec.sql ends its last section with the single closing separator;
    // the parsed body must NOT lose interior/trailing content beyond it.
    assert(Oracles.family("_spec")("interior").endsWith("FROM dual"))
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

  test("generated (in-Scala) oracles are exactly the documented allowlist " +
      "(VERDICT r16 item 5)") {
    // Policy (NOTES.md round 16): oracle SQL lives in resource files;
    // only GENERATED oracles (when-chains over rule tables, per-band hash
    // expansions, CTE builders — where the generation IS query logic) may
    // stay in Scala. The orphan specs above catch a resource section left
    // behind, but nothing caught a NEW in-Scala oracle string silently
    // bypassing the resource convention. Classify every registered oracle
    // by provenance (Oracles records each final text it serves) and pin
    // the generated set. Adding a query whose oracle is a Scala string —
    // or detaching an existing one from its resource section — fails here
    // until either the SQL moves to a resource or the allowlist (and the
    // policy note) is updated deliberately.
    val defs = SparkEntry.allDefs // forces registration → every serve recorded
    val generated = defs
      .filter(d => d.oracle.exists(o => !Oracles.resourceBacked(o)))
      .map(_.name).sorted
    // Each entry's oracle is genuinely GENERATED (a Scala block/def, not a
    // string literal): q29's 28-rule when-chain, q32/q191/q205's
    // stopword-list expansions, q195/q196's pinned merge tables, q92's
    // per-iteration CTE builder, q50's pivot column set, and the
    // constant-folded expansions of q53/q130/q134/q147/q181/q207/q208/
    // q211/q212 — each built from the same Scala constants that drive the
    // plan. (The three former plain-literal stragglers — q07/q20/q93 —
    // were extracted to resources in round 17.)
    val allowlist = Seq(
      "q130_equidepth_histogram", "q134_padding_waste",
      "q147_autocorrelation", "q181_length_histogram", "q191_langid_confusion",
      "q195_bpe_merges", "q196_bpe_fertility", "q205_kappa_langid",
      "q207_simhash_distance", "q208_quality_dup_calibration",
      "q211_neardup_editdist", "q212_skew_report",
      "q29_classify_category", "q32_lang_id", "q50_pivot_revenue",
      "q53_ann_ivf", "q92_pagerank")
    assert(generated == allowlist,
      s"generated-oracle set drifted.\n  actual: $generated\n  allowed: $allowlist")
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
