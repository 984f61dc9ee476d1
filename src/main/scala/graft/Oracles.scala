package graft

import scala.collection.concurrent.TrieMap

import graft.ops.{OracleSql => O}

/** Classpath-resource store for the registry's oracle SQL (VERDICT r15
  * item 8): the DuckDB oracle text lives in `src/main/resources/graft/
  * oracles/<family>.sql`, one section per oracle, so the Scala family
  * files carry query LOGIC and source diffs / copy audits aren't dominated
  * by SQL string soup.
  *
  * File format — a section header line `-- ::<key>` starts each oracle;
  * the section body is the exact SQL text (everything up to the next
  * header, minus the single blank separator line before it). Keys are the
  * family file's val names (sans the `Sql` suffix), not query names: one
  * val can gate several registered queries (q120 reuses q37's oracle, the
  * q249/q250 scale siblings reuse their window twins' verbatim — QueryDef
  * registration, not the text store, owns that mapping).
  *
  * Two substitution forms keep the plan↔oracle couplings the inline
  * strings had:
  *  - `{{DSUM:expr}}` / `{{DSUM4:expr}}` / `{{DAVG:expr}}` expand through
  *    [[graft.ops.OracleSql]] — the SQL twins of [[graft.ops.Exact]] stay
  *    defined ONCE, next to the Column-side definitions they mirror;
  *  - `{{name}}` expands from the caller's params — used where the oracle
  *    must mirror a Scala constant that also drives the plan (bucket caps,
  *    stopword lists, LSH band geometry), so a constant change can't
  *    silently drift the two sides apart.
  * Oracles that are themselves GENERATED (when-chains over rule tables,
  * per-band hash expansions, CTE builders) stay in Scala: the generation
  * is query logic, not text.
  *
  * Everything fails loud: missing resource, missing section, duplicate
  * section, unresolved `{{`, or a param the section never uses — all are
  * registration-time errors (the registry is built before any query runs),
  * and [[OraclesSpec]] pins the contract.
  */
object Oracles {

  private val cache = TrieMap.empty[String, Map[String, String]]

  /** (family, key) pairs served so far — lets OraclesSpec assert, after
    * forcing the whole registry, that no resource section is an ORPHAN
    * (SQL left behind by a retired/renamed query would otherwise rot
    * silently).
    */
  private val served = TrieMap.empty[(String, String), Unit]

  /** Sections present in the loaded resources but never requested. */
  private[graft] def orphans: Seq[String] =
    cache.toSeq.flatMap { case (fam, sections) =>
      sections.keys.filterNot(k => served.contains((fam, k)))
        .map(k => s"$fam::$k")
    }.sorted

  /** Every FINAL (post-substitution) SQL text this store has served —
    * lets OraclesSpec classify each registered oracle as resource-backed
    * vs generated-in-Scala and pin the generated set to an explicit
    * allowlist (VERDICT r16 item 5): a new in-Scala oracle string can no
    * longer silently bypass the resource convention.
    *
    * Contract (ADVICE r17): [[resourceBacked]] is an EXACT-string match
    * against served texts, so a caller must store the served value
    * VERBATIM — any post-processing (trim, interpolation, concatenation)
    * reclassifies that oracle as "generated" and trips OraclesSpec's
    * allowlist. That's deliberate: a modified text is no longer what the
    * resource file says, and the spec failure is the audit. Memory cost
    * is one retained string per registered oracle for the JVM's life
    * (~250 entries, the oracle texts themselves) — registration-sized,
    * not data-sized.
    */
  private val servedTexts = TrieMap.empty[String, Unit]

  /** True iff `sql` is exactly a text this store served (resource-backed,
    * possibly with substitutions applied). Exact match by design — see
    * [[servedTexts]].
    */
  private[graft] def resourceBacked(sql: String): Boolean =
    servedTexts.contains(sql)

  private val Header = """^-- ::([A-Za-z0-9_]+)\s*$""".r

  /** The parsed section map of one family resource. */
  private[graft] def family(fam: String): Map[String, String] =
    cache.getOrElseUpdate(fam, parse(fam))

  private def parse(fam: String): Map[String, String] = {
    val path = s"/graft/oracles/$fam.sql"
    // Classpath first (sbt run/test copy resources); fall back to the
    // source tree for raw `java -cp target/scala-2.13/classes` launches
    // after a bare `sbt compile` (which does NOT run copyResources).
    val in = Option(getClass.getResourceAsStream(path)).getOrElse {
      val f = new java.io.File(s"src/main/resources$path")
      require(f.isFile, s"oracle resource missing from classpath AND cwd: $path")
      new java.io.FileInputStream(f)
    }
    val txt =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var key: String = null
    var lines = Vector.empty[String]
    // ADVICE r16: exactly ONE blank separator line must precede each
    // non-first header, and only THAT line is stripped from the body. The
    // old double-stripSuffix form both (a) accepted a header-lookalike SQL
    // comment glued to a body (silently splitting the section) and (b) ate
    // a genuine trailing blank line at EOF.
    def flush(beforeHeader: Option[String]): Unit = {
      if (key != null) {
        val bodyLines = beforeHeader match {
          case Some(h) =>
            require(lines.nonEmpty && lines.last.trim.isEmpty,
              s"$path: header '-- ::$h' not preceded by the single blank " +
                s"separator line — a header-lookalike comment inside ::$key's " +
                "body, or a malformed section boundary")
            lines.dropRight(1)
          case None =>
            // EOF: the dump format terminates the LAST section with the
            // same single blank separator — strip exactly one if present.
            // A genuine trailing blank line in a body is TWO blanks here
            // (content blank + separator) and survives as one.
            if (lines.nonEmpty && lines.last.trim.isEmpty) lines.dropRight(1)
            else lines
        }
        require(!sections.contains(key), s"$path: duplicate section ::$key")
        sections += key -> bodyLines.mkString("\n")
        lines = Vector.empty
      }
      ()
    }
    txt.linesIterator.foreach {
      case Header(k) => flush(beforeHeader = Some(k)); key = k
      case line if key != null => lines :+= line
      case line =>
        require(line.trim.isEmpty || line.startsWith("--"),
          s"$path: content before first section header: '$line'")
    }
    flush(beforeHeader = None)
    require(sections.nonEmpty, s"$path: no sections")
    sections.toMap
  }

  private val Macro = """\{\{(DSUM4|DSUM|DAVG):([^{}]+)\}\}""".r
  private val Param = """\{\{([A-Za-z0-9_]+)\}\}""".r

  /** The oracle SQL for `key` in family `fam`, with params substituted. */
  def apply(fam: String, key: String, params: (String, String)*): String = {
    val raw = family(fam).getOrElse(
      key, sys.error(s"oracles/$fam.sql: no section ::$key"))
    served.put((fam, key), ())
    val m = Macro.replaceAllIn(raw, mm => scala.util.matching.Regex.quoteReplacement(
      mm.group(1) match {
        case "DSUM"  => O.dsum(mm.group(2))
        case "DSUM4" => O.dsum4(mm.group(2))
        case "DAVG"  => O.davg(mm.group(2))
      }))
    val pmap = params.toMap
    require(pmap.size == params.size,
      s"oracles/$fam.sql ::$key: duplicate param names")
    val used = scala.collection.mutable.Set.empty[String]
    val out = Param.replaceAllIn(m, mm => {
      val name = mm.group(1)
      val v = pmap.getOrElse(name,
        sys.error(s"oracles/$fam.sql ::$key: no value for {{$name}}"))
      used += name
      scala.util.matching.Regex.quoteReplacement(v)
    })
    val unused = pmap.keySet -- used
    require(unused.isEmpty,
      s"oracles/$fam.sql ::$key: params never used: ${unused.mkString(", ")}")
    require(!out.contains("{{") && !out.contains("}}"),
      s"oracles/$fam.sql ::$key: unresolved substitution remains")
    servedTexts.put(out, ())
    out
  }
}
