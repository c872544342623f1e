package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Native codegen'd multi-table sign-LSH bucketing:
  * `sign_buckets(v, nTables, nBits)` → `ARRAY<INT>` — table `t`'s bucket is
  * the sign pattern of `v` against `nBits` deterministic splitmix64
  * pseudo-hyperplanes (table 0 reproduces the original single-table seed
  * layout).
  *
  * This was the last recurring Scala UDF on an LLM hot loop (VERDICT r19):
  * the `llm_sim_ann` / `llm_dedup_embed` bucketing pass runs
  * O(N · nTables · nBits · dim) multiplies over the whole corpus — the same
  * loop shape [[ArgmaxDot]] migrated for IVF in r18. The UDF paid a
  * Seq[Float] materialization per row and fell out of whole-stage codegen;
  * this expression reads `ArrayData` floats directly and codegens to one
  * static kernel call inside the surrounding projection.
  *
  * BIT-IDENTICAL to [[graft.ops.TextOps.signBuckets]] by shared-kernel
  * construction (the UDF twin delegates to [[SignBuckets.kernel]]);
  * VecDotSpec pins the equality on fixture embeddings — a flipped sign
  * would move bucket ids and change LSH candidate sets.
  *
  * `nTables`/`nBits` must be FOLDABLE ints (they parameterize the plan, not
  * the data): they are evaluated once and inlined into the generated code
  * as constants.
  */
case class SignBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "sign_buckets expects (ARRAY<FLOAT>, foldable INT nTables, foldable INT nBits), " +
          s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  @transient private lazy val nTables: Int = second.eval().asInstanceOf[Int]
  @transient private lazy val nBits: Int = third.eval().asInstanceOf[Int]

  override def nullSafeEval(v: Any, t: Any, b: Any): Any =
    new GenericArrayData(SignBuckets.kernel(v.asInstanceOf[ArrayData], nTables, nBits))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, _, _) =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.plans.SignBuckets$$.MODULE$$.kernel($v, $nTables, $nBits))")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SignBuckets {
  /** Shared kernel for the expression and the UDF twin
    * ([[graft.ops.TextOps.signBuckets]]): per (table, bit), one splitmix64
    * pseudo-hyperplane component per vector element, accumulated in float64
    * (each f32 element widens exactly); bit set iff the projection is
    * ≥ 0. Identical arithmetic and seed layout to the original UDF, so
    * bucket ids cannot drift between the native and fallback paths. */
  def kernel(v: ArrayData, nTables: Int, nBits: Int): Array[Int] = {
    val len = v.numElements()
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var j = 0
      while (j < nBits) {
        var acc = 0.0
        var i = 0
        while (i < len) {
          var z = ((t * nBits + j).toLong * 1021 + i) * 0x9E3779B97F4A7C15L + 0x632BE59BD9B4E019L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^= (z >>> 31)
          acc += v.getFloat(i) * (z.toDouble / 9.223372036854776e18)
          i += 1
        }
        if (acc >= 0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    out
  }
}
