package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: first-match regex classification — returns
  * `labels(i)` for the FIRST `patterns(i)` found in the input string
  * (`java.util.regex` `find()`, the exact `RLike` contract), or NULL when no
  * pattern matches (callers wanting a fallback wrap in `coalesce`).
  *
  * Replaces the N-branch `when(c.rlike(rx1), l1).when(...)…` chain used for
  * rule-table classification (the reference's category/beverage YAML rules,
  * `go-transform-elt.py:115-136` — SURVEY §7.3's named optional Catalyst
  * extension). The when-chain is semantically right but pays two per-row
  * costs this single expression removes:
  *  - every evaluated `RLike` branch calls `UTF8String.toString` on the SAME
  *    input again — up to N fresh java.lang.String allocations per row (the
  *    GC-bound profile q63's transform stage shows); here the input converts
  *    ONCE and all patterns run against that one String;
  *  - codegen emits N nested if-branches each carrying its own regex access;
  *    here it is one tight loop over a shared Pattern[] reference.
  *
  * Pattern semantics are IDENTICAL to `rlike` (same `Pattern.compile`, same
  * `matcher(s).find(0)`), so swapping it under the same rule list changes no
  * oracle-checked result: first-match-wins order is preserved by the loop.
  *
  * Registered as SQL function `first_match_label(input, patterns, labels)`
  * (both arrays must be foldable literals) by [[GraftFunctions.register]] /
  * [[GraftExtensions]].
  */
case class FirstMatchLabel(child: Expression, patterns: Seq[String],
    labels: Seq[String]) extends UnaryExpression {

  require(patterns.nonEmpty && patterns.length == labels.length,
    s"first_match_label: ${patterns.length} patterns vs ${labels.length} labels")
  // A null pattern would NPE inside Pattern.compile on first evaluation
  // (executor-side, as a confusing codegen failure), and a null LABEL would
  // diverge between paths: interpreted eval returns SQL NULL while codegen
  // has already set isNull = false before assigning the null UTF8String —
  // the UnsafeRow writer then NPEs. Rule tables are literals; reject the
  // malformed table at CONSTRUCTION, on the driver, with a plain message.
  require(patterns.forall(_ != null), "first_match_label: null pattern in rule table")
  require(labels.forall(_ != null), "first_match_label: null label in rule table")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"first_match_label requires a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  // Compiled once per expression instance (same lifecycle as RLike's cached
  // pattern for a foldable regex); @transient so the plan ships the strings,
  // each executor compiles locally.
  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile).toArray
  @transient private lazy val labelBytes: Array[UTF8String] =
    labels.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var i = 0
    while (i < compiled.length) {
      if (compiled(i).matcher(s).find(0)) return labelBytes(i)
      i += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val pats = ctx.addReferenceObj("patterns", compiled,
        "java.util.regex.Pattern[]")
      val labs = ctx.addReferenceObj("labels", labelBytes,
        classOf[UTF8String].getName + "[]")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |final java.lang.String $s = $in.toString();
         |${ev.isNull} = true;
         |for (int $i = 0; $i < $pats.length; $i++) {
         |  if ($pats[$i].matcher($s).find(0)) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = $labs[$i];
         |    break;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
