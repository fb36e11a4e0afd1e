package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `lsh_buckets(emb, planeBits, np)`: ALL multi-table hyperplane LSH
  * bucket ids of one `array<double>` embedding in a single compiled pass —
  * an `array<long>` of `planeBits.length / np` per-table buckets, where
  * bit `i` of table `t`'s bucket is set iff
  * `round(dot(emb, plane_{t,i}), 6) > 0`.
  *
  * Planes are ±1 hyperplanes packed one BIGINT per (table, plane) — bit
  * `d` carries dim `d`'s sign — exactly the encoding the q16g DuckDB twin
  * reads, and the packed stream is generated from the same
  * [[graft.llm.Similarity.hyperplanes]] literals, so engine and oracle
  * share geometry by construction.
  *
  * Why this exists (round-12 scale finding): the composable form — one
  * `lshBucket` column per table, each a sum of `np` literal-array
  * `when(round(dot(...)))` terms — builds an expression tree of
  * L × np × dims nodes. At the adaptive 10× geometry (L=45, np=10,
  * dims=64 ⇒ ~29k nodes, duplicated into both the candidate and the query
  * branch) Catalyst analysis/optimization dominated q16g's measured 82 s
  * wall; at 100× (L=107, np=13 ⇒ ~89k nodes) planning goes superlinear.
  * This kernel is ONE expression node regardless of geometry; the work
  * moves to a tight compiled loop (`s += bit ? e_d : −e_d`).
  *
  * Bit-identical to the composable form, including the edges the
  * SimilaritySpec property test pins:
  *
  *  - the dot is the same sequential left-to-right fold as
  *    [[graft.llm.Similarity.dot]] (±1 products are EXACT sign flips, so
  *    partial sums match bit-for-bit);
  *  - `round(s, 6) > 0` is evaluated as `s >= 5e-7`: Spark's HALF_UP
  *    round at scale 6 yields a positive value iff the decimal expansion
  *    is ≥ 0.0000005, shortest-decimal conversion preserves double
  *    ordering, and the double `5e-7`'s shortest decimal IS 0.0000005 —
  *    so the comparisons are equivalent on every double, no BigDecimal in
  *    the hot loop;
  *  - a null element or a length ≠ dims poisons the composable dot to
  *    null for EVERY plane (`zip_with` pads with nulls), and `null > 0`
  *    is false — so such rows take all-zero buckets, reproduced here;
  *  - a null ARRAY takes the same all-zero buckets (the composable
  *    `when(null > 0).otherwise(0)` kept such rows in table-0 buckets;
  *    the default null-propagating `nullSafeEval` would instead return
  *    NULL and the downstream `posexplode` would silently DROP the row —
  *    ADVICE r12), so the expression is non-nullable by construction and
  *    [[eval]]/[[doGenCode]] handle the null child themselves.
  *
  * Registered by [[graft.GraftExtensions]].
  */
case class HyperplaneBuckets(child: Expression, planeBits: Seq[Long], np: Int, dims: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if np > 0 && np <= 64 && dims > 0 && dims <= 64 &&
          planeBits.nonEmpty && planeBits.size % np == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets needs 0 < np <= 64, 0 < dims <= 64 and |planeBits| a " +
          s"multiple of np, got np=$np dims=$dims |planeBits|=${planeBits.size}")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"lsh_buckets requires an array<double> embedding, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  @transient private lazy val kernel =
    new HyperplaneKernel(planeBits.toArray, np, dims)

  override def eval(input: InternalRow): Any = child.eval(input) match {
    case null => kernel.zeroBuckets()
    case a => kernel.buckets(a.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneKernel", kernel,
      classOf[HyperplaneKernel].getName)
    val childGen = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${childGen.code}
        $javaType ${ev.value} = ${childGen.isNull} ?
          $ref.zeroBuckets() : $ref.buckets(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)

  override def prettyName: String = "lsh_buckets"
}

/** Runtime for [[HyperplaneBuckets]]: `planeBits` is row-major —
  * table `t`'s plane `i` sits at `t * np + i`.
  */
class HyperplaneKernel(planeBits: Array[Long], np: Int, dims: Int)
    extends Serializable {

  private val nTables = planeBits.length / np

  /** The all-zero bucket row poisoned inputs (null array, null element,
    * wrong length) map to. Fresh array per call: `GenericArrayData` is
    * handed to consumers that may retain it across rows.
    */
  def zeroBuckets(): ArrayData = {
    val out = new Array[Any](nTables)
    java.util.Arrays.fill(out, 0L)
    new GenericArrayData(out)
  }

  def buckets(input: ArrayData): ArrayData = {
    val out = new Array[Any](nTables)
    var ok = input.numElements() == dims
    if (ok) {
      var d = 0
      while (ok && d < dims) { if (input.isNullAt(d)) ok = false; d += 1 }
    }
    if (!ok) return zeroBuckets()
    val e = new Array[Double](dims)
    var d = 0
    while (d < dims) { e(d) = input.getDouble(d); d += 1 }
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var i = 0
      while (i < np) {
        val bits = planeBits(t * np + i)
        var s = 0.0
        var k = 0
        while (k < dims) {
          val v = e(k)
          s += (if (((bits >> k) & 1L) == 1L) v else -v)
          k += 1
        }
        if (s >= 5e-7) bucket |= (1L << i)
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
