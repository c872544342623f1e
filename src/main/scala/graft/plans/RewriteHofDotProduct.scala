package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast, Expression, LambdaFunction, Multiply, NamedExpression, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0d, (acc, v) -> acc + v)` — into the native codegen'd [[VecDot]].
  *
  * This is the (c) rung of the extension ladder (SURVEY §4: custom
  * `Rule[LogicalPlan]` via `SparkSessionExtensions`) put to real use: the
  * HOF formulation is the engine's documented vanilla-session fallback, and
  * any user query written that way silently pays interpreted per-element
  * lambda dispatch. With the extension installed, the optimizer swaps in
  * the fused primitive loop — no query rewrite needed on the user's side.
  *
  * Soundness gates (all statically checkable):
  *  - both inputs are `ARRAY<FLOAT>` (null elements are fine — VecDot
  *    returns NULL on a null element, exactly as the null product absorbs
  *    the HOF fold);
  *  - the zero is a foldable double 0.0;
  *  - the zip lambda is exactly `double(x) * double(y)` over the two
  *    lambda variables and the merge lambda is `acc + v` (either operand
  *    order — float64 `+`/`*` are commutative bitwise, just not
  *    associative, and the fold ORDER is preserved by VecDot);
  *  - the finish lambda is the identity.
  * Ragged inputs agree too: zip_with null-pads → NULL, and VecDot returns
  * NULL on length mismatch by construction.
  */
object RewriteHofDotProduct extends Rule[LogicalPlan] {

  private def sameVar(e: Expression, v: NamedExpression): Boolean = (e, v) match {
    case (a: NamedLambdaVariable, b: NamedLambdaVariable) => a.exprId == b.exprId
    case _ => false
  }

  private def floatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isZeroDouble(e: Expression): Boolean =
    e.dataType == DoubleType && e.foldable && {
      val v = e.eval()
      v != null && v.asInstanceOf[Double] == 0.0
    }

  private def castToDoubleOf(e: Expression): Option[Expression] = e match {
    case c: Cast if c.dataType == DoubleType => Some(c.child)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(ml, mr, _), Seq(xv, yv), false)),
          zero,
          LambdaFunction(Add(al, ar, _), Seq(accv, vv), false),
          LambdaFunction(fin, Seq(finv), false))
        if floatArray(a) && floatArray(b) && isZeroDouble(zero) &&
          (for (x <- castToDoubleOf(ml); y <- castToDoubleOf(mr)) yield
            (sameVar(x, xv) && sameVar(y, yv)) || (sameVar(x, yv) && sameVar(y, xv)))
            .getOrElse(false) &&
          ((sameVar(al, accv) && sameVar(ar, vv)) || (sameVar(al, vv) && sameVar(ar, accv))) &&
          sameVar(fin, finv) =>
      VecDot(a, b)
  }
}
