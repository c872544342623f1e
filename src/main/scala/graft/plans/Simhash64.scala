package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 64-bit SimHash: `simhash64(tokens)` → `LONG`.
  *
  * Same rationale as [[MinhashSig]]: the corpus-wide signature pass of
  * `llm_dedup_simhash` runs a tight per-token bit-vote loop that a compiled
  * UDF already does in milliseconds — but the UDF still converts every
  * `ArrayData` to a `Seq[String]` wrapper per row. This expression votes
  * directly over `UTF8String` elements and codegens to one static call
  * inside whole-stage codegen.
  *
  * BIT-IDENTICAL to [[graft.ops.TextOps.simhash64]] by shared-kernel
  * construction (MurmurHash3 string hash → splitmix64 finalize → 64 bit
  * votes, ties to 0); VecDotSpec pins the equality on fixture tokens — a
  * flipped bit would move hamming distances and band buckets.
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    Simhash64.kernel(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks =>
      s"graft.plans.Simhash64$$.MODULE$$.kernel($toks)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash64 {
  /** Shared kernel for the expression and the UDF twin: per token, one
    * string hash + splitmix64 finalize, then a ±1 vote per bit; the
    * signature takes each bit's majority sign (ties to 0). Empty input
    * yields signature 0 — the all-ties case. */
  def kernel(toks: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      var z = scala.util.hashing.MurmurHash3
        .stringHash(toks.getUTF8String(i).toString).toLong + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= (z >>> 31)
      var b = 0
      while (b < 64) { if (((z >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1; b += 1 }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
