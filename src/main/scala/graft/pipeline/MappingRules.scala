package graft.pipeline

import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** One complete set of transform mapping rules (U2/U3/U6). */
final case class MappingRuleSet(
    categoryRules: Seq[(String, String)],
    beverageRules: Seq[(String, String)],
    sizeRegex: String)

/** Loaders for the reference's mapping YAMLs — the REAL rule sets, not a
  * representative subset.
  *
  *  - `category_regex_pattern.yml` — `patterns: { "<regex>": "<label>" }`,
  *    an ORDERED first-match map (28 rules; order is load-bearing: e.g.
  *    `bowls?0?` precedes `hot bowls`, so "hot bowls" labels as "bowls" —
  *    the reference UDF iterates `dict.items()` in insertion order,
  *    `go-transform-elt.py:70-73,115-123`).
  *  - `beverage_regex_patterns.yml` — `patterns: [ {regex, category} ]`
  *    (`go-transform-elt.py:76-85`).
  *  - `size_regex_patterns.yml` — `patterns: [fragment, ...]` concatenated
  *    verbatim (`go-transform-elt.py:88-98`). The literal concatenation ends
  *    in a dangling `|` and strands one fragment after the closing paren —
  *    as written, the regex matches the EMPTY string at position 0, making
  *    size extraction a silent no-op. We preserve INTENDED semantics (same
  *    policy as U1/U4's `http\S+` / `\b` fixes, SURVEY.md §7.4): stray
  *    trailing fragments are folded back into the alternation and the
  *    dangling `|` dropped.
  *  - `dict_restaurant/restaurant_thresholds.yaml` — 13k-line nested map
  *    `restaurant → category → item → {price:{min,max,mean,stddev},
  *    quantity:{...}}`, flattened to a threshold TABLE consumed by
  *    [[QualityJob.withSeverity]] as a broadcast join (never a per-row
  *    dict-lookup UDF like `go-quality-elt.py:144-168`).
  *
  * snakeyaml ships on Spark's own classpath, so parsing adds no dependency.
  * All loaders are pure driver-side: rules become literals inside codegen'd
  * when-chains; thresholds become a DataFrame — both broadcast-sized and
  * cluster-safe at any scale.
  */
object MappingRules {

  /** Threshold table schema (superset of what QualityJob joins on). */
  val thresholdSchema: StructType = StructType(Seq(
    StructField("restaurant_id", StringType),
    StructField("item_category", StringType),
    StructField("item_name", StringType),
    StructField("price_min", DoubleType),
    StructField("price_max", DoubleType),
    StructField("price_mean", DoubleType),
    StructField("price_stddev", DoubleType),
    StructField("qty_min", IntegerType),
    StructField("qty_max", IntegerType),
    StructField("qty_mean", DoubleType),
    StructField("qty_stddev", DoubleType)))

  private def parse(path: String): Object = {
    val in = new FileInputStream(path)
    try new Yaml(new SafeConstructor(new LoaderOptions())).load[Object](in)
    finally in.close()
  }

  private def asMap(o: Object): collection.Map[String, Object] =
    o.asInstanceOf[java.util.Map[String, Object]].asScala

  /** Ordered (regex, label) pairs from the category pattern map. snakeyaml
    * yields a LinkedHashMap; iterating (never re-mapping into a HashMap)
    * preserves YAML document order, which is load-bearing for first-match.
    */
  def loadCategoryRules(path: String): Seq[(String, String)] =
    asMap(asMap(parse(path))("patterns"))
      .iterator.map { case (k, v) => k -> v.asInstanceOf[String] }.toSeq

  /** (regex, category) pairs; entries may use `regex` or `pattern` keys
    * (`go-transform-elt.py:76-85`). Patterns carry no `(?i)` — callers match
    * against lowercased text, mirroring the reference's IGNORECASE compile.
    */
  def loadBeverageRules(path: String): Seq[(String, String)] =
    asMap(parse(path))("patterns").asInstanceOf[java.util.List[Object]].asScala.toSeq
      .map { item =>
        val m = asMap(item)
        val rx = m.get("regex").orElse(m.get("pattern"))
          .getOrElse(throw new IllegalArgumentException(s"Invalid beverage entry: $m"))
        rx.asInstanceOf[String] -> m("category").asInstanceOf[String]
      }

  /** Assembled size regex: fragments joined in order, then intended-fix
    * normalization (see object doc): content stranded after the alternation
    * group's closing `)` is re-joined as additional alternatives, and any
    * dangling `|` removed. Case-insensitivity via `(?i)` prefix (the
    * reference compiles with IGNORECASE).
    */
  def loadSizePattern(path: String): String = {
    val root = asMap(parse(path))
    val joined = root.get("pattern") match {
      case Some(p) => p.asInstanceOf[String]
      case None =>
        val parts = root.get("patterns").orElse(root.get("size_patterns"))
          .getOrElse(throw new IllegalArgumentException("Size regex missing"))
        parts.asInstanceOf[java.util.List[Object]].asScala.map(_.toString).mkString
    }
    // Intended-semantics fix-up of the literal join.
    val closeIdx = matchingClose(joined)
    val fixed =
      if (closeIdx >= 0 && closeIdx < joined.length - 1) {
        val head = joined.substring(0, closeIdx) // "(alt1|...|altN"
        val tail = joined.substring(closeIdx + 1) // stray fragments
        val extras = tail.split("\\|").filter(_.nonEmpty)
        (head +: extras.toSeq).mkString("|").replace("(|", "(") + ")"
      } else joined
    "(?i)" + fixed.stripSuffix("|")
  }

  /** Index of the `)` closing the group opened by the first `(`, or -1. */
  private def matchingClose(s: String): Int = {
    val open = s.indexOf('(')
    if (open < 0) return -1
    var depth = 0
    var i = open
    while (i < s.length) {
      val escaped = i > 0 && s.charAt(i - 1) == '\\'
      if (!escaped && s.charAt(i) == '(') depth += 1
      else if (!escaped && s.charAt(i) == ')') {
        depth -= 1
        if (depth == 0) return i
      }
      i += 1
    }
    -1
  }

  /** Flatten the nested threshold dict into a DataFrame matching
    * [[thresholdSchema]]. Keys are trim+lowercased exactly like the
    * reference's lookup (`go-quality-elt.py:147-150`), so the broadcast
    * join against P2-normalized items hits the same rows the UDF would.
    */
  def loadThresholds(spark: SparkSession, path: String): DataFrame = {
    def num(m: collection.Map[String, Object], k: String): Option[Double] =
      m.get(k).flatMap(Option(_)).map(_.asInstanceOf[Number].doubleValue())
    val rows = for {
      (rid, cats) <- asMap(parse(path)).toSeq
      (cat, items) <- asMap(cats).toSeq
      (item, rules) <- asMap(items).toSeq
    } yield {
      val r = asMap(rules)
      val price = r.get("price").map(asMap).getOrElse(Map.empty[String, Object])
      val qty = r.get("quantity").map(asMap).getOrElse(Map.empty[String, Object])
      Row(
        rid.trim.toLowerCase, cat.trim.toLowerCase, item.trim.toLowerCase,
        num(price, "min").orNull, num(price, "max").orNull,
        num(price, "mean").orNull, num(price, "stddev").orNull,
        num(qty, "min").map(_.toInt).orNull, num(qty, "max").map(_.toInt).orNull,
        num(qty, "mean").orNull, num(qty, "stddev").orNull)
    }
    spark.createDataFrame(rows.asJava, thresholdSchema)
  }

  def loadRuleSet(dir: String): MappingRuleSet = MappingRuleSet(
    categoryRules = loadCategoryRules(s"$dir/regex/category_regex_pattern.yml"),
    beverageRules = loadBeverageRules(s"$dir/regex/beverage_regex_patterns.yml"),
    sizeRegex = loadSizePattern(s"$dir/regex/size_regex_patterns.yml"))

  /** Mapping dir: `GRAFT_MAPPING_DIR` env override, else the reference
    * checkout when present (build/test sandbox), else none. An EXPLICIT
    * override that doesn't exist fails loudly — silently falling back to
    * the embedded subset would misclassify with no error, and the
    * generated-from-the-same-rules oracle would mask it.
    */
  lazy val referenceDir: Option[String] = sys.env.get("GRAFT_MAPPING_DIR") match {
    case Some(d) =>
      require(Files.isDirectory(Paths.get(d)),
        s"GRAFT_MAPPING_DIR=$d is not a directory")
      Some(d)
    case None =>
      Some("/root/reference/mapping").filter(d => Files.isDirectory(Paths.get(d)))
  }

  /** The real rule set when the mapping dir is available, else the embedded
    * representative subset (keeps the library usable without the YAMLs).
    */
  lazy val default: MappingRuleSet =
    referenceDir.map(loadRuleSet).getOrElse(Schemas.embedded)

  def defaultThresholds(spark: SparkSession): Option[DataFrame] =
    referenceDir.map(d => loadThresholds(spark, s"$d/dict_restaurant/restaurant_thresholds.yaml"))
}
