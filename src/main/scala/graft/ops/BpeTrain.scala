package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding tokenizer TRAINING (Sennrich-style): learn the merge
  * table from a corpus. The suite already tokenizes with a fixed BPE-ish
  * regex (q55) and counts adjacent pairs (q88 — the first merge's input);
  * this operator closes the loop and learns the merges themselves.
  *
  * Scale design — the classic trick is that BPE trains on the WORD
  * FREQUENCY table, not the corpus: ONE corpus pass builds `(word, n)`
  * (vocab-sized — millions of rows at 100 TB, not billions), and every
  * merge round then runs on that small table: adjacent-unit pairs form
  * IN-ROW (no token explosion crosses a shuffle un-collapsed), one
  * (lhs, rhs) hash agg weighted by `n`, and the argmax merge is a 1-row
  * control-plane collect (the CC/IVF driver-scalar policy). The greedy
  * left-to-right substitution is a map-side HOF fold; each round
  * `localCheckpoint`s to keep the logical plan flat (the iterative-
  * algorithm rule in NOTES.md).
  *
  * Determinism: the winning pair is argmax by (weighted count DESC, lhs,
  * rhs) — total order, no RNG; the fold is sequential per word, so "aaaa"
  * under merge (a,a) becomes ["aa","aa"], never the overlapping
  * ["a","aa","a"] ambiguity.
  */
object BpeTrain {

  /** Split a word into its character units (the round-0 representation). */
  def charUnits(wordCol: String): Column =
    expr(s"filter(split($wordCol, ''), x -> x != '')")

  private def lit1(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** Greedy left-to-right in-row merge of adjacent units (a, b) → a||b. */
  def mergePair(unitsCol: String, a: String, b: String): Column = {
    val (qa, qb) = (lit1(a), lit1(b))
    val ab = lit1(a + b)
    expr(
      s"""aggregate($unitsCol,
         |  named_struct('out', CAST(array() AS array<string>),
         |               'pend', CAST(NULL AS string)),
         |  (acc, x) -> CASE
         |    WHEN acc.pend IS NULL
         |      THEN named_struct('out', acc.out, 'pend', x)
         |    WHEN acc.pend = $qa AND x = $qb
         |      THEN named_struct('out', concat(acc.out, array($ab)),
         |                        'pend', CAST(NULL AS string))
         |    ELSE named_struct('out', concat(acc.out, array(acc.pend)),
         |                      'pend', x) END,
         |  acc -> CASE WHEN acc.pend IS NULL THEN acc.out
         |         ELSE concat(acc.out, array(acc.pend)) END)""".stripMargin)
  }

  /** One merge learned: rank, the pair, its weighted count, and the
    * weighted corpus unit count AFTER applying it (the compression curve).
    */
  final case class Merge(rank: Int, lhs: String, rhs: String,
      pair_count: Long, units_after: Long)

  /** Train `rounds` merges over a `(word, n)` frequency table.
    *
    * @param wordFreq distinct words with corpus counts — columns
    *                 (word: string, n: long)
    * @return one row per learned merge, rank-ordered
    */
  def train(wordFreq: DataFrame, rounds: Int): Seq[Merge] = {
    // ONE job per round (r19, was four): the pair aggregate is never
    // materialized — a single collect computes BOTH the total pair mass Σc
    // (input of the exact audit identity Σn·size(units) = Σn + Σ_pairs c:
    // each word contributes size−1 adjacent pairs, zip_with emits exactly
    // those) AND the argmax pair, via `min_by(struct(lhs,rhs,c),
    // struct(-c,lhs,rhs))` — min of (−count, lhs, rhs) IS max count with
    // the (lhs, rhs) lexicographic tie rule, and the key is unique per row
    // because (lhs, rhs) is the group key, so the argmax is total-ordered
    // exactly as the old `orderBy(c DESC, lhs, rhs).limit(1)`. The same
    // job also materializes the LAZILY localCheckpoint'ed merged units as
    // a side effect, so the old per-round eager-checkpoint job, argmax
    // job, pair-checkpoint job and Σc job all collapse into one (the BPE
    // loop was scheduling-latency-bound: 8 rounds × 4 vocab-sized jobs).
    var cur = wordFreq
      .select(col("word"), col("n").cast("long").as("n"),
        charUnits("word").as("units"))
      .localCheckpoint(false)              // materialized by the sumN job
    val sumN: Long = cur.agg(sum(col("n")))
      .collect()(0).getLong(0)             // constant across rounds
    // Σ pair mass + argmax pair of `df`'s adjacent-unit pairs, one job.
    def pairStats(df: DataFrame): (Long, Option[(String, String, Long)]) = {
      val row = df
        .select(col("n"), explode(expr(
          """CASE WHEN size(units) >= 2 THEN
            |  zip_with(slice(units, 1, size(units) - 1),
            |           slice(units, 2, size(units) - 1),
            |    (a, b) -> named_struct('lhs', a, 'rhs', b))
            |ELSE array() END""".stripMargin)).as("p"))
        .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
        .agg(sum(col("n")).as("c"))
        .agg(
          coalesce(sum(col("c")), lit(0L)).as("sc"),
          min_by(struct(col("lhs"), col("rhs"), col("c")),
            struct((-col("c")).as("nc"), col("lhs"), col("rhs"))).as("top"))
        .collect()(0)
      val top = if (row.isNullAt(1)) None else {
        val t = row.getStruct(1)
        Some((t.getString(0), t.getString(1), t.getLong(2)))
      }
      (row.getLong(0), top)
    }
    var stats = pairStats(cur)             // round-1 argmax (Σc unused here)
    val out = Seq.newBuilder[Merge]
    var r = 1
    while (r <= rounds && stats._2.isDefined) {
      val (lhs, rhs, c) = stats._2.get
      val prev = cur
      cur = cur
        .withColumn("units", mergePair("units", lhs, rhs))
        .localCheckpoint(false)
      stats = pairStats(cur)               // materializes cur + Σc + next argmax
      prev.unpersist()
      out += Merge(r, lhs, rhs, c, sumN + stats._1)
      r += 1
    }
    cur.unpersist()
    out.result()
  }

  /** One-pass corpus → `(word, n)` frequency table (whitespace words of
    * lowercased text) — the ONLY corpus-sized stage of BPE training.
    */
  def wordFrequencies(documents: DataFrame, textCol: String): DataFrame =
    // spread: the tokenize-explode partial agg otherwise runs as ONE task
    // on the 1-split gate-scale scan (identity at production split counts)
    graft.core.Tables.spread(documents)
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
}
