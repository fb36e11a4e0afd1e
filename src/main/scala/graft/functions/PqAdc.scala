package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native asymmetric-distance (ADC) lookup-sum for product-quantized
  * vectors (Jégou, Douze & Schmid 2011, public PQ literature): given a
  * candidate's per-subspace code array `codes` (M entries, each in
  * [0, k)) and a query's flattened lookup table `lut` (M·k micro-unit
  * partial dot products, row-major by subspace — entry `m·k + j` is
  * `round(dot(querySub_m, codeword_{m,j}) · 1e6)`), returns
  * `Σ_m lut[m·k + codes[m]]` as one exact BIGINT.
  *
  * This is the q15d/q16h pair scan's hot path: N×|Q| pairs × M lookups.
  * Integer lookup entries are load-bearing twice over: (a) a BIGINT sum
  * is exact and association-free, so the engine-side sum (here, m order)
  * and the DuckDB oracle's `GROUP BY` sum (arbitrary order) are equal by
  * arithmetic, not by evaluation-order luck — the same determinism
  * discipline as [[graft.llm.Similarity.meanPool]]'s DECIMAL sums; and
  * (b) the scan does M integer loads + adds per pair instead of the d
  * multiply-adds of a float dot — the PQ bandwidth win (M=8 vs d=64).
  * The composable HOF form (`aggregate(zip_with(codes, sequence(...)))`)
  * walks the shared interpreted-lambda call sites — the round-3
  * megamorphic finding that motivated [[WordHits]] / [[HammingSig]] —
  * so the kernel keeps the pair scan inside whole-stage codegen.
  *
  * The codebook size k is DERIVED per row as `lut.length / codes.length`
  * — the LUT layout itself defines it. A literal-k variant shipped first
  * and produced a real bug during development: a k inconsistent with the
  * LUT construction (8 vs 16 subspaces) mis-indexed entries that were
  * still in bounds, yielding plausible garbage sums no defensive null
  * could catch. Deriving k from the shapes makes that mismatch class
  * unrepresentable.
  *
  * Null/poison semantics (property-pinned in SimilaritySpec): NULL input
  * array → NULL (`nullSafeEval`); a NULL code or LUT element → NULL; a
  * code outside [0, k), an empty codes array, or a LUT whose length is
  * not a positive multiple of `M` → NULL (defensive — encode/LUT
  * construction can't produce either, but a hand-built frame must not
  * read out of bounds or alias another subspace's entry).
  *
  * Registered as SQL function `pq_adc` by [[graft.GraftExtensions]].
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc requires (array<bigint> codes, array<bigint> lut), got " +
            s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val k = lut.numElements() / m
    var acc = 0L
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getLong(i)
      if (c < 0L || c >= k) return null
      val idx = i * k + c.toInt
      if (lut.isNullAt(idx)) return null
      acc += lut.getLong(idx)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val kk = ctx.freshName("k")
      val mm = ctx.freshName("m")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      // numElements() hoisted to locals — same rationale as HammingSig's
      // codegen: virtual calls in a per-PAIR hot loop are the megamorphic
      // dispatch the kernel exists to avoid (r13 advisor find).
      s"""
         |int $mm = $a.numElements();
         |if ($mm == 0 || $b.numElements() % $mm != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $kk = $b.numElements() / $mm;
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $mm; $i++) {
         |    if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $c = $a.getLong($i);
         |    if ($c < 0L || $c >= (long) $kk) { ${ev.isNull} = true; break; }
         |    int $idx = $i * $kk + (int) $c;
         |    if ($b.isNullAt($idx)) { ${ev.isNull} = true; break; }
         |    $acc += $b.getLong($idx);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_adc"
}
