package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Hamming distance between two packed bit-signature columns
  * (`array<bigint>` of 32-bit words — [[graft.llm.Similarity.signSig]]).
  *
  * This is the q15c candidate scan's hot path: N×|Q| pairs × one
  * xor/popcount per word. The composable form —
  * `aggregate(zip_with(a, b, bit_count(xor)), 0, +)` — allocates a
  * per-pair intermediate array and walks the interpreted-lambda call
  * sites Spark's higher-order functions share JVM-wide (the round-3
  * megamorphic finding, same motivation as [[WordHits]] and
  * [[CosineSimilarity]]); measured at the 10× replica it made the binary
  * scan SLOWER than the float brute scan it exists to undercut. This
  * expression is one allocation-free xor/`Long.bitCount` loop in both the
  * interpreted and generated paths, so the pair scan stays inside
  * whole-stage codegen.
  *
  * Semantics are bit-identical to the composable form: NULL input → NULL
  * (`nullSafeEval`), length mismatch → NULL (`zip_with` pads the short
  * side with null elements and the null poisons the fold), null ELEMENT →
  * NULL (same poisoning). The equivalence — including those edges — is
  * property-pinned in SimilaritySpec.
  *
  * Registered as SQL function `hamming_sig` by [[graft.GraftExtensions]].
  */
case class HammingSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"hamming_sig requires two array<bigint> arguments, got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      // numElements() hoisted to a local: it is a virtual call across
      // Unsafe/GenericArrayData call sites, and this loop runs once per
      // PAIR of the N×|Q| candidate scan — re-calling it per iteration
      // reintroduces the megamorphic dispatch this kernel exists to avoid
      // (r13 advisor find; mirrors the interpreted path's local `n`).
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingSig =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming_sig"
}
