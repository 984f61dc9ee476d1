package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Dumps the registry's final oracle SQL as JSON (name → SQL), one file.
  *
  * Exists for the oracle-extraction A/B gate (VERDICT r15 item 8): the
  * per-family resource refactor must be a ZERO-behavior-change move, so the
  * map is dumped from the pre-refactor binary, the refactor lands, and the
  * post-refactor dump must be byte-identical. No SparkSession is needed —
  * the registry is static.
  *
  * Usage: runMain graft.tools.OracleDump <outFile>
  */
object OracleDump {
  private def jesc(s: String): String = {
    val b = new StringBuilder(s.length + 16)
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.result()
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/oracle_dump.json")
    val m = graft.SparkEntry.oracleSql.toSeq.sortBy(_._1)
    val json = m.map { case (k, v) => s"""  "${jesc(k)}": "${jesc(v)}"""" }
      .mkString("{\n", ",\n", "\n}\n")
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"[oracledump] ${m.size} oracles -> $out")
  }
}
