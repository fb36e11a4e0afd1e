package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** [[PqAdc]] over BIT-PACKED codes: `codes` carries 8-bit code fields, 6
  * per 64-bit word in subspace order (field `m % 6` of word `m / 6` is
  * subspace m's codeword index), and the expression returns
  * `Σ_m lut[m·k + code_m]` — the same exact-BIGINT ADC sum as the
  * unpacked kernel on 6× fewer array cells.
  *
  * Why this exists (r14, `BASELINE.md` wide-dim section): at production
  * embedding widths PQ needs M = d/4 subspaces to hold recall, and an
  * `array<bigint>` code row then grows linearly with d (1.5 KB at
  * d=768/M=192) — the measured reason the persisted-index search LOST to
  * raw adaptive IVF at the 100× wide-dim point. Packing restores the
  * at-rest layout public PQ systems ship (FAISS packs code fields
  * contiguously): ⌈M/6⌉ longs = 24 B at the registered M=16 geometry and
  * 256 B at M=192 — the binary-signature footprint class, at any d.
  * 8-bit fields (not the 4-bit minimum) keep every k ≤ 256 codebook
  * representable (stride-selected codebooks can exceed 16 entries on
  * small corpora, so a 4-bit field would silently truncate); SIX per
  * word (48 bits), not eight, so every word stays below 2^48 — positive,
  * and exactly representable in a double, which is what lets
  * [[graft.llm.Similarity.unpackCodes]] invert the packing in plain
  * Column arithmetic (long→double is exact under 2^53 and division by a
  * power of two only moves the exponent).
  *
  * The subspace count `m` is the third (foldable) argument: unlike
  * [[PqAdc]] — whose k derives from the shapes, making mismatch
  * unrepresentable — packed codes lose M's exact value to the ⌈M/6⌉
  * rounding, so the caller passes the SAME geometry constant that built
  * both the codes and the LUT in the same operator. Guards make every
  * shape inconsistency NULL, never an out-of-bounds read: m ≤ 0, a LUT
  * whose length is not a positive multiple of m, or a codes array whose
  * length ≠ ⌈m/6⌉ → NULL; an extracted field ≥ k → NULL (fields are
  * non-negative by construction of the unsigned extract).
  *
  * Registered as SQL function `pq_adc_packed` by
  * [[graft.GraftExtensions]]. Null semantics mirror [[PqAdc]]:
  * any NULL input or NULL element → NULL.
  */
case class PqAdcPacked(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"pq_adc_packed requires (array<bigint> packed codes, " +
            s"array<bigint> lut, int m), got ${first.dataType.simpleString}, " +
            s"${second.dataType.simpleString} and ${third.dataType.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = c.asInstanceOf[Int]
    if (m <= 0 || lut.numElements() % m != 0) return null
    val words = (m + 5) / 6
    if (codes.numElements() != words) return null
    val k = lut.numElements() / m
    // word-outer / field-inner: one getLong per 6 codes and a running
    // 8-bit shift — no per-code div/mod (the first cut paid i/6 and i%6
    // on every iteration of the N×|Q| pair scan; at a cache-resident
    // corpus that ALU overhead made the packed scan SLOWER than the
    // unpacked one it replaced — measured at the 100× wide-dim point)
    var acc = 0L
    var i = 0
    var w = 0
    while (w < words) {
      if (codes.isNullAt(w)) return null
      var word = codes.getLong(w)
      var f = 0
      while (f < 6 && i < m) {
        val code = word & 0xFFL
        if (code >= k) return null
        val idx = i * k + code.toInt
        if (lut.isNullAt(idx)) return null
        acc += lut.getLong(idx)
        word >>>= 8
        f += 1
        i += 1
      }
      w += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val f = ctx.freshName("f")
      val word = ctx.freshName("word")
      val words = ctx.freshName("words")
      val code = ctx.freshName("code")
      val kk = ctx.freshName("k")
      val mm = ctx.freshName("m")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      // Mirrors the interpreted path: word-outer / shift-inner (no
      // per-code div/mod), numElements() hoisted to locals (the
      // HammingSig/PqAdc r13 rule) — this loop runs once per PAIR of the
      // N×|Q| candidate scan. Multi-term conditions stay on ONE
      // generated line: a continuation line beginning with "||" loses
      // its pipes to a later stripMargin pass in the codegen plumbing
      // (observed: Janino got the line with the operator stripped).
      s"""
         |int $mm = $c;
         |int $words = ($mm + 5) / 6;
         |if ($mm <= 0 || $b.numElements() % $mm != 0 || $a.numElements() != $words) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $kk = $b.numElements() / $mm;
         |  long $acc = 0L;
         |  int $i = 0;
         |  outer: for (int $w = 0; $w < $words; $w++) {
         |    if ($a.isNullAt($w)) { ${ev.isNull} = true; break; }
         |    long $word = $a.getLong($w);
         |    for (int $f = 0; $f < 6 && $i < $mm; $f++, $i++) {
         |      long $code = $word & 0xFFL;
         |      if ($code >= (long) $kk) { ${ev.isNull} = true; break outer; }
         |      int $idx = $i * $kk + (int) $code;
         |      if ($b.isNullAt($idx)) { ${ev.isNull} = true; break outer; }
         |      $acc += $b.getLong($idx);
         |      $word >>>= 8;
         |    }
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): PqAdcPacked =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "pq_adc_packed"
}
