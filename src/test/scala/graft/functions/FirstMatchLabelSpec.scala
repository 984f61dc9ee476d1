package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FirstMatchLabelSpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Seq(
    "(?i)latte|cappuccino" -> "coffee",
    "tea" -> "tea",
    "(?i)\\bcola\\b" -> "soda")

  test("returns the FIRST matching rule's label, null when none match") {
    val df = Seq("iced latte", "green tea latte", "cola float", "water", null)
      .toDF("s")
      .select($"s", GraftFunctions.first_match_label($"s", rules).as("label"))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq == Seq(
      ("iced latte", "coffee"),
      // latte rule precedes tea: first-match-wins, not best-match
      ("green tea latte", "coffee"),
      ("cola float", "soda"),
      ("water", null),
      (null, null)))
  }

  test("matches bit-equal to the when(rlike) chain it replaces") {
    val inputs = Seq("LATTE art", "teapot", "a cola", "acolab", "", "TeA?",
      "x latte tea cola").toDF("s")
    val chain = rules.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (rx, label)) => Some(acc match {
        case None => when($"s".rlike(rx), label)
        case Some(w) => w.when($"s".rlike(rx), label)
      })
    }.get.otherwise(lit(null).cast("string"))
    val both = inputs.select($"s", chain.as("chain"),
      GraftFunctions.first_match_label($"s", rules).as("native"))
      .collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"'${r.getString(0)}': chain=${r.getString(1)} native=${r.getString(2)}")
    }
  }

  test("interpreted path (eval) agrees with the codegen path") {
    // Force the interpreted projection: evaluate the expression directly.
    val expr = FirstMatchLabel(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      rules.map(_._1), rules.map(_._2))
    def interp(s: String): String = {
      val row = org.apache.spark.sql.catalyst.InternalRow(
        if (s == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(s))
      val v = expr.eval(row)
      if (v == null) null else v.toString
    }
    // codegen path via a real projection over the same inputs
    val inputs = Seq("mocha latte", "tea time", "no match here", null)
    val viaDf = inputs.toDF("s")
      .select(GraftFunctions.first_match_label($"s", rules))
      .collect().map(r => r.getString(0))
    assert(inputs.map(interp) == viaDf.toSeq)
  }

  test("sql registration: literal-array arguments are required and work") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT first_match_label('iced tea', array('latte', 'tea'), " +
        "array('coffee', 'tea')) AS l").head().getString(0)
    assert(r == "tea")
    val err = intercept[Exception] {
      spark.sql("SELECT first_match_label(s, array(s), array('x')) " +
        "FROM (SELECT 'a' AS s)").collect()
    }
    assert(err.getMessage.contains("literal"),
      s"non-literal patterns must be rejected: ${err.getMessage}")
  }
}
