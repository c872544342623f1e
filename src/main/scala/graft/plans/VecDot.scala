package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd float-vector dot product: `vec_dot(a, b)`.
  *
  * The escalation ladder for custom scalar kernels (SURVEY §4 / the 100 TB
  * design rules) is: built-in functions → native Catalyst `Expression` with
  * `doGenCode` → Scala UDF → interpreted higher-order functions. The
  * similarity operators' hot path is a 64-float dot product per candidate
  * pair; the HOF formulation (`aggregate(zip_with(...))`) evaluates
  * interpreted with per-element boxing, and a UDF pays serialization at the
  * row boundary. This expression compiles to a primitive loop inside
  * whole-stage codegen — no boxing, no lambda dispatch, fuseable with the
  * surrounding operators.
  *
  * Semantics are IDENTICAL to the HOF fold the oracle SQL mirrors: a
  * sequential float64 accumulation in array order (each f32×f32 product is
  * exact in f64); ragged inputs return NULL — exactly what
  * `aggregate(zip_with(...))` produces when zip_with null-pads the shorter
  * array — and a NULL ELEMENT returns NULL too (a null product absorbs the
  * whole fold in the HOF). Swapping it in therefore cannot change any
  * value, with or without the extension installed; the element-null check
  * is only code-generated when the input type says `containsNull`, so the
  * non-null fast path stays a bare fused loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // nullable even over non-null children: length mismatch yields NULL
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two ARRAY<FLOAT> inputs, got (${left.dataType}, ${right.dataType})")
  }

  // val, not def: the interpreted path reads this per element per row
  // inside the hot loop — the dataType pattern match must run once
  @transient private lazy val elementsNullable: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _ => false
    })

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (elementsNullable && (a.isNullAt(i) || b.isNullAt(i))) return null
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val nullCheck = if (elementsNullable)
        s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the native functions; enable with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  * Query builders fall back to the equivalent HOF formulation when the
  * extension is not installed (e.g. a vanilla driver session). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (children: Seq[Expression]) => SortedIntersectCount(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinhashSig(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (children: Seq[Expression]) => Simhash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ivf_argmax_dot"),
      new ExpressionInfo(classOf[ArgmaxDot].getName, "ivf_argmax_dot"),
      (children: Seq[Expression]) => ArgmaxDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sign_buckets"),
      new ExpressionInfo(classOf[SignBuckets].getName, "sign_buckets"),
      (children: Seq[Expression]) => SignBuckets(children.head, children(1), children(2))))
    // queries written against the documented HOF fallback get the native
    // kernel automatically (see [[RewriteHofDotProduct]] soundness gates)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}
