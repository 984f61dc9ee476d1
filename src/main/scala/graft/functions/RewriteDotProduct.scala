package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrites the idiomatic higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, x) -> acc + x) }}}
  *
  * into the codegen'd [[VecDotProduct]] — the same left-to-right double fold
  * (bit-identical results) but a single loop with no intermediate array
  * allocation and no lambda interpretation. Users (and our own library code)
  * can write the declarative HOF form; plans get the fast operator
  * automatically when [[GraftExtensions]] is installed (or via
  * `spark.experimental.extraOptimizations`).
  *
  * The match is deliberately conservative: exactly the multiply-zip /
  * add-fold shape over `array<double>` children with a foldable 0.0 initial
  * value and identity finish — anything else is left untouched.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isZero(e: Expression): Boolean =
    e.foldable && e.dataType == DoubleType && (e.eval() match {
      case d: java.lang.Double => d.doubleValue() == 0.0
      case _ => false
    })

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(a: NamedLambdaVariable, b: NamedExpression): Boolean =
    b match {
      case v: NamedLambdaVariable => a.exprId == v.exprId
      case _ => false
    }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(v1: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) =>
      v1.exprId == v2.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _), Seq(x2, y2), _)),
            zero,
            LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _), Seq(acc2, v2), _),
            finish)
          if isDoubleArray(a) && isDoubleArray(b) && isZero(zero) &&
            sameVar(x1, x2) && sameVar(y1, y2) &&
            sameVar(acc1, acc2) && sameVar(v1, v2) &&
            isIdentityFinish(finish) =>
        VecDotProduct(a, b)
    }
}
