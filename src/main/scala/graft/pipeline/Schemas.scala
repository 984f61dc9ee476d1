package graft.pipeline

/** Canonical schema + mapping rules for the restaurant-order pipeline
  * (reference parity layer).
  *
  * The canonical column→type map re-expresses `go-quality-elt.py:173-204`
  * (`date`/`time` deliberately stay strings there — preserved). Mapping
  * rules re-express the reference's YAML rule files
  * (`mapping/regex/category_regex_pattern.yml`,
  * `beverage_regex_patterns.yml`, `size_regex_patterns.yml`) as Scala
  * constants — the engine folds them into native when-chains
  * (SURVEY.md §2.9), never per-row UDF lookups.
  */
object Schemas {

  /** Canonical order_items schema after quality (name → spark sql type). */
  val canonicalOrderItems: Seq[(String, String)] = Seq(
    "order_key" -> "string",
    "app_name" -> "string",
    "restaurant_id" -> "string",
    "order_id" -> "string",
    "lineitem_id" -> "string",
    "user_id" -> "string",
    "printed_card_number" -> "string",
    "is_loyalty" -> "boolean",
    "currency" -> "string",
    "item_category" -> "string",
    "final_category" -> "string",
    "item_name" -> "string",
    "item_size" -> "string",
    "item_price" -> "double",
    "item_quantity" -> "int",
    "date" -> "string",
    "date_key" -> "string",
    "time" -> "string",
    "severity" -> "string",
    "flagged" -> "boolean")

  /** First-match category fix rules (U2): regex → canonical label.
    * Representative of `category_regex_pattern.yml:1-30` — e.g.
    * `break[\s_-]*fast→breakfast`, `chips→snacks`, `drip coffee→coffee`.
    */
  val categoryRules: Seq[(String, String)] = Seq(
    "(?i)break[\\s_-]*fast" -> "breakfast",
    "(?i)sqalads?|salads?" -> "salads",
    "(?i)chips|crisps" -> "snacks",
    "(?i)drip\\s+coffee|coffee" -> "coffee",
    "(?i)sandwich|sandwhich" -> "sandwiches",
    "(?i)burgers?" -> "burgers",
    "(?i)bowls?" -> "bowls",
    "(?i)dessert|sweets?" -> "desserts")

  /** Beverage classification rules (U3): regex → class; no match → null.
    * Mirrors `beverage_regex_patterns.yml:1-13`'s four classes.
    */
  val beverageRules: Seq[(String, String)] = Seq(
    "(?i)red\\s?bull|monster|energy" -> "energy drinks",
    "(?i)soda|cola|sprite|pepsi|root\\s?beer" -> "sodas",
    "(?i)\\bwater\\b|sparkling" -> "water",
    "(?i)juice|kombucha|lemonade|smoothie" -> "juices & kombuchas drinks")

  /** Size alternation fragments (U6), concatenated like
    * `go-transform-elt.py:91-93` into one extraction regex.
    */
  val sizeFragments: Seq[String] = Seq(
    "\\d+\\s?oz", "\\d+\\s?ltr", "\\d+\\s?ml", "half\\s?gallon",
    "\\d+\\s?pack", "\\d+\\s?count", "½")

  val sizeRegex: String = s"(?i)\\(?(${sizeFragments.mkString("|")})\\)?"

  /** Category merges applied after the rule pass
    * (`go-transform-elt.py:236-244`).
    */
  val categoryMerges: Seq[(String, String)] = Seq(
    "sides" -> "snacks",
    "drinks" -> "beverages",
    "entrees" -> "mains")

  /** The embedded representative subset bundled as one rule set — the
    * fallback when the real YAMLs ([[MappingRules]]) aren't on disk.
    */
  val embedded: MappingRuleSet =
    MappingRuleSet(categoryRules, beverageRules, sizeRegex)
}
