package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftio.VecMath
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v) }}}
  * into the fused codegen'd [[VecMath.ArrayDotProduct]]. The HOF form is
  * what users naturally write in SQL; Catalyst evaluates it interpreted
  * with a per-row intermediate array (measured ~35x slower at near-dup
  * scale — see VecMathExprs). The rewrite fires only when it is
  * bit-identical:
  *  - the multiply is DOUBLE-typed (the analyzer widened both element
  *    refs), matching ArrayDotProduct's widen-then-multiply order;
  *  - the merge is a plain `acc + element` and the finish lambda is the
  *    identity;
  *  - the zero is literal 0.0 — the fold ArrayDotProduct implements.
  * Null semantics already agree (null array -> null; null element or
  * length mismatch -> null on both paths).
  *
  * Registered by [[GraftExtensions]] via `injectOptimizerRule` (session
  * build) or `experimental.extraOptimizations` (existing session).
  */
object FuseVecHof extends Rule[LogicalPlan] {

  @scala.annotation.tailrec
  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case other   => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    strip(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _                       => false
    }

  private def isPair(l: Expression, r: Expression,
                     a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (isVar(l, a) && isVar(r, b)) || (isVar(l, b) && isVar(r, a))

  private def numericArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _                                    => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(finishBody,
              Seq(fin: NamedLambdaVariable), _))
          if mul.dataType == DoubleType &&
            isPair(mul.left, mul.right, x, y) &&
            isPair(add.left, add.right, acc, el) &&
            isVar(finishBody, fin) &&
            numericArray(a) && numericArray(b) =>
        VecMath.ArrayDotProduct(a, b)
    }
}
