package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd IVF coarse-quantizer assignment:
  * `ivf_argmax_dot(u, centroids)` → the index of the centroid with the
  * largest dot product against `u` (ties keep the LOWEST index — strict
  * `>` comparison, identical to the Scala UDF it replaces bit for bit).
  *
  * `centroids` must be a FOLDABLE `ARRAY<ARRAY<DOUBLE>>` (the trained
  * table is driver-side state, pushed in as one literal): it is evaluated
  * ONCE into a primitive `double[][]` held as a codegen reference object,
  * so the per-row work is a bare fused argmax loop — no per-row array
  * conversion (the UDF paid a Seq[Double] materialization per row), no
  * boxing, no lambda dispatch, and the expression stays inside
  * whole-stage codegen with the surrounding projection.
  *
  * This was the last Scala UDF on an LLM-path hot loop (VERDICT r17 item
  * 9): the k-means assignment runs over the whole corpus once per Lloyd
  * round and once at final assignment, O(N · nCells · dim) multiplies —
  * exactly the loop shape codegen exists for. */
case class ArgmaxDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_argmax_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _))
        if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "ivf_argmax_dot expects (ARRAY<DOUBLE>, foldable ARRAY<ARRAY<DOUBLE>>), " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  /** The centroid table, materialized once per task from the literal. */
  @transient private lazy val cents: Array[Array[Double]] = {
    val ad = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(c => ad.getArray(c).toDoubleArray())
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val u = l.asInstanceOf[ArrayData]
    val n = u.numElements()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < n) { d += u.getDouble(i) * cent(i); i += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    nullSafeCodeGen(ctx, ev, (u, _) => {
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val cent = ctx.freshName("cent")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      s"""
         |int $best = 0;
         |double $bestDot = Double.NEGATIVE_INFINITY;
         |int $n = $u.numElements();
         |for (int $c = 0; $c < $centsRef.length; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $d += $u.getDouble($i) * $cent[$i];
         |  }
         |  if ($d > $bestDot) { $bestDot = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
