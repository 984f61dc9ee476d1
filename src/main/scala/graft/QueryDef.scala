package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query with its DuckDB oracle.
  *
  * The driver's correctness gate (see BASELINE.json) runs `fn` on a
  * scale-factor directory, dumps parquet, then runs `oracle` in DuckDB over
  * the same tables and hash-compares. Column names and types must therefore
  * match EXACTLY between the Spark plan and the SQL.
  *
  * Determinism rules used across all queries (so hashes match bit-for-bit):
  *  - money/quantity sums go through `Exact.dsum` (decimal accumulate, cast
  *    back to double) — immune to float summation order;
  *  - averages are `decimal-sum / count` (one deterministic double divide);
  *  - unavoidable double aggregations (avg of ratios, cosine) are rounded to
  *    a fixed scale on BOTH sides;
  *  - window orderings always carry a unique tiebreaker key;
  *  - timestamps cross the boundary as `unix_micros` bigints.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** Registry metadata. `baseline_only`: deliberately non-scale plan kept
      * as a ground-truth/documentation sibling of a production-path query —
      * NOT a 100-TB path; slow growth at large SF is its declared design
      * (q41 is the one O(N²) all-pairs baseline; its scale path is q77's
      * bucketed LSH).
      */
    tags: Set[String] = Set.empty,
)
