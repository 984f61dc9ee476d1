package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Native polynomial rolling hash over Unicode code points:
  * `h = fold(codePoints, h0 = cp(0), (acc, c) => (acc * 31 + c) mod 1e9+7)`.
  *
  * Semantics match the SQL-composable fold in `q56_rolling_hash` (and
  * DuckDB's `list_reduce` over `ord()` values) exactly — seeded with the
  * first code point, mod at every step — but runs as ONE pass over the
  * string instead of `sequence` + `transform(substring)` + interpreted
  * `aggregate` (the substring path re-seeks from the string start per
  * index: quadratic in document length). Returns null for empty strings
  * (no code points — the fold has no seed).
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (s.isEmpty) null
    else {
      var acc = -1L
      val it = s.codePoints().iterator()
      while (it.hasNext) {
        val c = it.nextInt().toLong
        acc = if (acc < 0) c else (acc * 31 + c) % 1000000007L
      }
      java.lang.Long.valueOf(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acc = ctx.freshName("acc")
    val it = ctx.freshName("it")
    val c = ctx.freshName("c")
    val str = ctx.freshName("str")
    nullSafeCodeGen(ctx, ev, in => {
      s"""
         |java.lang.String $str = $in.toString();
         |if ($str.isEmpty()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = -1L;
         |  java.util.PrimitiveIterator.OfInt $it = $str.codePoints().iterator();
         |  while ($it.hasNext()) {
         |    long $c = (long) $it.nextInt();
         |    $acc = ($acc < 0L) ? $c : ($acc * 31L + $c) % 1000000007L;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
