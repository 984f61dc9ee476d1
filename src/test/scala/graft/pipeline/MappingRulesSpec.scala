package graft.pipeline

import graft.SparkTestBase
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Round-trips the reference's REAL mapping YAMLs through [[MappingRules]]:
  * rule-for-rule category parity (28 rules, first-match order), beverage
  * classes, the assembled size regex (with the intended-semantics fix for
  * its dangling `|`), and the 13k-line threshold dict flattened to a table.
  */
class MappingRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = MappingRules.referenceDir
  private def assumeYamls(): Unit =
    assume(dir.isDefined, "mapping YAMLs not on disk — loader covered elsewhere")

  private lazy val rules = MappingRules.loadRuleSet(dir.get)

  test("category rules: all 28 load in YAML order") {
    assumeYamls()
    assert(rules.categoryRules.size == 28)
    assert(rules.categoryRules.head == ("(?i)break[\\s_-]*fast" -> "breakfast"))
    assert(rules.categoryRules.last == ("(?i)snacks?" -> "snacks"))
    // order is load-bearing: bowls? precedes hot bowls
    val idx = rules.categoryRules.map(_._1)
    assert(idx.indexOf("(?i)bowls?0?") < idx.indexOf("(?i)hot[\\s_-]*bowls?"))
  }

  test("category rules: rule-for-rule first-match parity with the reference UDF") {
    assumeYamls()
    // label → expected, hand-traced through go-transform-elt.py:115-123
    // first-match order (note: "hot bowls" hits bowls?0? first; "hot
    // espresso" hits espresso first — same label either way).
    val expected = Seq(
      "BREAK fast" -> "breakfast",
      "break_fast" -> "breakfast",
      "Plates" -> "plates",
      "bbq party sides" -> "bbq sides & extras",
      "Bowls0" -> "bowls",
      "burgers & sandwiches" -> "burgers & sandwiches",
      "candy milk chocolate" -> "candy & chocolate",
      "catering" -> "catering",
      "chips" -> "snacks",
      "cold-brew" -> "coffee",
      "drip c" -> "coffee",
      "drip coffee" -> "coffee",
      "hot coffee" -> "coffee",
      "iced coffee" -> "coffee",
      "espresso" -> "specialty coffee",
      "hot espresso" -> "specialty coffee",
      "iced espresso" -> "specialty coffee",
      "specialty coffee beverages" -> "specialty coffee",
      "gluten-free" -> "gluten free",
      "hot bowls" -> "bowls", // bowls?0? wins by order
      "meal prep" -> "meal prep",
      "test items" -> "test items",
      "tobacco" -> "tobacco",
      "vegan" -> "vegan options",
      "vegetarian" -> "vegetarian options", // 'vegan' does NOT match it
      "kid's" -> "kids",
      "kid" -> "kids",
      "sandwiches1" -> "sandwiches",
      "sqalads" -> "salads",
      "salad" -> "salads",
      "snack" -> "snacks",
      "mystery stuff" -> "mystery stuff" // no rule → lowercased passthrough
    )
    val df = expected.map(_._1).toDF("label")
      .withColumn("got", TransformJob.fixCategory(col("label"), rules.categoryRules))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    expected.foreach { case (label, want) =>
      assert(got(label) == want, s"label '$label'")
    }
  }

  test("beverage rules: four classes, case-insensitive over lowered text") {
    assumeYamls()
    assert(rules.beverageRules.size == 4)
    assert(rules.beverageRules.map(_._2) == Seq(
      "energy drinks", "sodas", "water", "juices & kombuchas drinks"))
    val cases = Seq(
      "Red Bull 12oz" -> "energy drinks",
      "5-hour energy shot" -> "energy drinks",
      "dr pepper" -> "sodas",
      "root beer float" -> "sodas",
      "poland spring" -> "water",
      "smartwater" -> "water",
      "hibiscus ginger lime kombucha" -> "juices & kombuchas drinks",
      "fresh oj" -> "juices & kombuchas drinks",
      "caesar salad" -> null)
    val df = cases.map(_._1).toDF("name")
      .withColumn("got", TransformJob.classifyBeverage(col("name"), rules.beverageRules))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (name, want) => assert(got(name) == want, s"name '$name'") }
  }

  test("size regex: assembled pattern compiles, never empty-matches, extracts") {
    assumeYamls()
    val rx = rules.sizeRegex
    java.util.regex.Pattern.compile(rx) // must be valid Java regex
    assert(!rx.endsWith("|"), "dangling | would match empty everywhere")
    val cases = Seq(
      "caesar salad 16 oz" -> "16 oz",
      "cold brew 2 Ltr" -> "2 ltr",
      "spring water 500ml" -> "500ml",
      "milk half gallon" -> "half gallon",
      "soda 12 pack" -> "12 pack",
      "wings 6 pc" -> "6 pc",
      "rice 1.5 kg" -> "1.5 kg",
      "2 tacos" -> "2", // leading-number alternative ^\d+\b
      "sub 1/2" -> "1/2",
      "plain salad" -> "") // regexp_extract yields "" on no match
    val df = cases.map(_._1).toDF("name")
      .withColumn("got", TransformJob.extractSize(col("name"), rx))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (name, want) => assert(got(name) == want, s"name '$name'") }
    // the stranded last fragment (\b\d+\s?oz\b) still participates
    assert(rx.contains("\\b\\d+\\s?oz\\b"))
  }

  test("thresholds: 13k-line YAML flattens to one row per (rid, cat, item)") {
    assumeYamls()
    val path = s"${dir.get}/dict_restaurant/restaurant_thresholds.yaml"
    val df = MappingRules.loadThresholds(spark, path).cache()
    // every item block is exactly one flattened row (counted via its
    // `quantity:` line — one item in the file has no `price:` block, and
    // the loader keeps it with null price bounds)
    val expectedRows = Files.readAllLines(Paths.get(path)).stream()
      .filter(l => l.trim == "quantity:").count()
    assert(df.count() == expectedRows, s"expected $expectedRows rows")
    assert(df.filter(col("restaurant_id").isNull || col("item_category").isNull ||
      col("item_name").isNull).count() == 0)
    // spot-check a hand-read entry (head of the YAML): bowls / chili chicken | gf
    val row = df.filter(col("restaurant_id") === "5e7e35ec902ad5ac017b242a" &&
      col("item_category") === "bowls" && col("item_name") === "chili chicken | gf")
      .head()
    assert(row.getAs[Double]("price_min") == 39.0)
    assert(row.getAs[Double]("price_max") == 65.0)
    assert(row.getAs[Int]("qty_min") == 3)
    assert(row.getAs[Int]("qty_max") == 5)
    assert(math.abs(row.getAs[Double]("price_mean") - 47.666666666666664) < 1e-12)
    // null stddevs survive as nulls (both-bounds gate unaffected)
    assert(df.filter(col("price_stddev").isNull).count() > 0)
    df.unpersist()
  }

  test("severity against the REAL thresholds: both-bounds gate, high/low/none") {
    assumeYamls()
    val th = MappingRules.defaultThresholds(spark).get
    // chili chicken | gf: price [39,65], qty [3,5]
    val items = Seq(
      ("5e7e35ec902ad5ac017b242a", "bowls", "chili chicken | gf", 100.0, 10), // both out → high
      ("5e7e35ec902ad5ac017b242a", "bowls", "chili chicken | gf", 100.0, 4), // price out → low
      ("5e7e35ec902ad5ac017b242a", "bowls", "chili chicken | gf", 40.0, 4), // in range → none
      ("missing-restaurant", "bowls", "chili chicken | gf", 1.0, 1) // no row → none
    ).toDF("restaurant_id", "item_category", "item_name", "item_price", "item_quantity")
    val out = QualityJob.withSeverity(items, th)
      .select("item_price", "item_quantity", "severity", "flagged").collect()
      .map(r => (r.getDouble(0), r.getInt(1)) -> r.getString(2)).toMap
    assert(out((100.0, 10)) == "high")
    assert(out((100.0, 4)) == "low")
    assert(out((40.0, 4)) == "none")
    assert(out((1.0, 1)) == "none")
  }
}
