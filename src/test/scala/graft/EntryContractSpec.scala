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

  test("every QueryDef literal in graft.queries source is registered in allDefs") {
    // Round-4 defect class: a finished query file (ReshapeQ) never added to
    // allDefs — green tests, zero verified value. Scan the source tree for
    // QueryDef("name", ...) literals and assert each is reachable.
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val qdir = Paths.get(sys.props("user.dir"), "src", "main", "scala", "graft", "queries")
    assume(Files.isDirectory(qdir), s"query source dir not found at $qdir")
    val lit = """QueryDef\(\s*"([^"]+)"""".r
    val declared = Files.list(qdir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap(p => lit.findAllMatchIn(Files.readString(p)).map(_.group(1)))
      .toSet
    val registered = SparkEntry.allDefs.map(_.name).toSet
    val unwired = declared -- registered
    assert(unwired.isEmpty,
      s"QueryDef literals not reachable from SparkEntry.allDefs: ${unwired.toSeq.sorted}")
    assert(declared.nonEmpty && declared.size >= 100,
      s"source scan looks broken: only ${declared.size} QueryDef literals found")

    // second net (round-5 near-miss): a query-shaped FUNCTION written but
    // never wrapped in a QueryDef at all — scan for the standard signature
    // and assert each function name is referenced by some QueryDef(...)
    // `private def` helpers are exempt: they can only be consumed by
    // registered queries in the same file, never lost to the driver
    val fn = """(?<!private )def (\w+)\(spark: SparkSession, dir: String\): DataFrame""".r
    val refd = """QueryDef\(\s*"[^"]+",\s*(\w+)""".r
    val bodies = Files.list(qdir).iterator().asScala
      .filter(_.toString.endsWith(".scala")).map(Files.readString).toSeq
    val fns = bodies.flatMap(b => fn.findAllMatchIn(b).map(_.group(1))).toSet
    val referenced = bodies.flatMap(b => refd.findAllMatchIn(b).map(_.group(1))).toSet
    // PipelineQ stage builders share the signature but are internals the
    // q63–q72 queries compose — extend ONLY for genuine non-query helpers
    val helpers = Set("dateDim", "mbase", "options", "feed", "finalDf")
    val orphans = fns -- referenced -- helpers
    assert(orphans.isEmpty,
      s"query functions with no QueryDef registration: ${orphans.toSeq.sorted}")
  }

  test("every query runs at sf0.001 and emits no NaN / -0.0 at the gate " +
      "(round-16 invariant)") {
    // NaN and negative zero are hash hazards at the driver gate: Python
    // float('nan') != float('nan') and repr(-0.0) != repr(0.0), so a value
    // the two engines agree on cell-for-cell can still hash-mismatch (the
    // q98/q248 class, float edition). The registry convention (QueryDef
    // scaladoc) already rounds/normalizes every unavoidable double — this
    // sweep makes the convention a standing failure. Recurses into
    // struct/array/map values.
    def bad(v: Any): Boolean = v match {
      case d: java.lang.Double =>
        d.isNaN || (d.doubleValue == 0.0 && (1.0 / d.doubleValue) < 0)
      case f: java.lang.Float =>
        f.isNaN || (f.floatValue == 0.0f && (1.0f / f.floatValue) < 0)
      case r: org.apache.spark.sql.Row => r.toSeq.exists(bad)
      case s: scala.collection.Iterable[_] => s.exists(bad)
      case m: java.util.Map[_, _] =>
        import scala.jdk.CollectionConverters._
        m.asScala.exists { case (k, x) => bad(k) || bad(x) }
      case _ => false
    }
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val rows = fn(spark, sf).collect()
        if (rows.exists(bad)) Some(s"$name: NaN or -0.0 in gate output") else None
      } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("gate outputs ship driver-hash-stable types (round-15 invariant, " +
      "recursive + map/timestamp classes since round-16)") {
    // Round-14 regression class: DECIMAL with precision >18 is int128-backed
    // (parquet FIXED_LEN_BYTE_ARRAY / DuckDB HUGEINT) and the driver's hash
    // canonicalizes Spark-vs-DuckDB int128 decimals differently — q98/q248
    // hash-failed with CELL-EXACT values. Convention enforced here: wide
    // decimals accumulate internally, the gate-facing projection ships
    // BIGINT / DOUBLE / STRING (Exact.dsum-style cast or .cast("string")).
    // Decimals at precision ≤18 are int64-backed in both engines and pass.
    //
    // Round-16 extensions (same hazard family, banned while green):
    //  - the audit RECURSES through struct fields and array/map element
    //    types (ADVICE r15: a nested wide decimal previously slipped by);
    //  - MAP at the gate: map iteration order is engine-defined, so a
    //    value-identical map can hash either way — ship sorted
    //    struct-arrays or exploded rows instead;
    //  - TIMESTAMP at the gate: tz canonicalization differs across the
    //    parquet/DuckDB/Python hops — the registry convention is
    //    unix_micros BIGINT at the boundary (QueryDef scaladoc).
    import org.apache.spark.sql.types._
    def sweep(dt: DataType, path: String): Seq[String] = dt match {
      case d: DecimalType if d.precision > 18 =>
        Seq(s"$path: ${d.simpleString} (int128 at the gate — cast to string/double/bigint)")
      case _: TimestampType | _: TimestampNTZType =>
        Seq(s"$path: ${dt.simpleString} (ship unix_micros bigint at the gate)")
      case m: MapType =>
        s"$path: map (unordered — ship sorted struct-array or exploded rows)" +:
          (sweep(m.keyType, s"$path<key>") ++ sweep(m.valueType, s"$path<val>"))
      case s: StructType =>
        s.fields.toSeq.flatMap(f => sweep(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => sweep(a.elementType, s"$path[]")
      case _ => Nil
    }
    val offenders = SparkEntry.allDefs.flatMap { d =>
      d.fn(spark, sf).schema.fields.flatMap(f => sweep(f.dataType, s"${d.name}.${f.name}"))
    }
    assert(offenders.isEmpty,
      s"hash-hazard type at the driver gate:\n${offenders.mkString("\n")}")
  }
}
