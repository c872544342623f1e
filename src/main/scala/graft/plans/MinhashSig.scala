package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: `minhash_sig(tokens)` → `ARRAY<LONG>` of
  * [[MinhashSig.NumHashes]] min-signatures over 3-word shingles.
  *
  * Same escalation ladder as [[VecDot]]: the corpus-wide signature pass of
  * `llm_dedup_near` originally ran as an interpreted HOF (measured ~8 s at
  * sf0.1), then as a compiled Scala UDF (milliseconds — the r3 fix). The
  * UDF still pays the Catalyst↔Scala boundary per row: `ArrayData` →
  * `Seq[String]` wrapper → `Array[Long]` → `ArrayData` conversions around
  * the kernel. This expression runs the identical kernel directly on
  * `ArrayData`/`UTF8String`, and its codegen emits one static call inside
  * whole-stage codegen — no per-row converter allocation, no lambda
  * dispatch.
  *
  * BIT-IDENTICAL to [[graft.ops.Llm.minhashSig]] by construction: both
  * call the same [[MinhashSig.kernel]] (MurmurHash3 string hash of the
  * shingle, splitmix64 stream per hash slot, min fold). LlmSpec pins the
  * equality on fixture data, so swapping the UDF for the expression can
  * never move a bucket boundary.
  */
case class MinhashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING> tokens, got $other")
  }

  override def nullSafeEval(toks: Any): Any =
    MinhashSig.kernel(toks.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, toks =>
      s"graft.plans.MinhashSig$$.MODULE$$.kernel($toks)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  /** Signature width — fixed at the 16 hashes / 8 bands × 2 rows scheme
    * `llm_dedup_near` documents; a width knob would belong in the banding,
    * not the kernel. */
  val NumHashes = 16

  /** The shared kernel: 3-word shingles → MurmurHash3 string hash →
    * splitmix64 stream per slot → min fold. Works directly on Catalyst
    * `ArrayData` (UTF8String elements); called from both the interpreted
    * eval and the generated code. Null tokens cannot occur (`split` output);
    * fewer than 3 tokens yields the all-MaxValue signature, same as the
    * UDF on an empty shingle set. */
  def kernel(toks: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val n = toks.numElements() - 2
    var i = 0
    while (i < n) {
      val shingle = toks.getUTF8String(i).toString + " " +
        toks.getUTF8String(i + 1).toString + " " +
        toks.getUTF8String(i + 2).toString
      val h = scala.util.hashing.MurmurHash3.stringHash(shingle).toLong
      var j = 0
      while (j < NumHashes) {
        var z = h + 0x9E3779B97F4A7C15L * (j + 1)
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        z ^= (z >>> 31)
        if (z < mins(j)) mins(j) = z
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
