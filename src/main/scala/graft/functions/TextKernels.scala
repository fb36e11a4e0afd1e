package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-statistics kernels.
  *
  * Spark's higher-order array functions (`filter`, `transform`,
  * `aggregate`) never compile their lambda bodies — each element evaluation
  * walks the interpreted `Expression.eval` tree through call sites SHARED
  * by every higher-order function in the JVM. With several text queries
  * exercising those sites with different lambda shapes, the shared call
  * sites go megamorphic and whole queries swing 4-10x run-to-run with JIT
  * state (the round-3 bench instability). These expressions remove that
  * surface the same way [[CosineSimilarity]] and [[JsonShred]] do: one
  * static, monomorphic runtime call per row that stays inside whole-stage
  * codegen.
  */

/** `word_hits(tokens, wordsCsv)`: the number of elements of the
  * `array<string>` `tokens` that are members of the static word list —
  * occurrences, not distinct types. Exactly
  * `size(filter(tokens, t => array_contains(array(words*), t)))` with
  * null-element tokens not counted (`array_contains` yields null there,
  * which `filter` drops) and a null tokens array yielding null.
  *
  * The word list is compile-time static (a comma-separated string literal
  * in SQL, so words must not contain commas — stopword/marker lists don't),
  * hashed once into a set instead of a per-element linear array scan.
  */
case class WordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"word_hits requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType

  @transient private lazy val kernel = new WordHitsKernel(words.toArray)

  override protected def nullSafeEval(input: Any): Any =
    kernel.count(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordHitsKernel", kernel,
      classOf[WordHitsKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.count($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordHits =
    copy(child = newChild)

  override def prettyName: String = "word_hits"
}

class WordHitsKernel(words: Array[String]) extends Serializable {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def count(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }
}

/** `minhash_sigs(shingles, numHashes)`: all `numHashes` seeded-md5 MinHash
  * minima of an `array<string>` shingle set in ONE traversal. Element `i`
  * (0-based) is bit-identical to
  * `array_min(transform(shingles, s => md5(concat(lit(s"$i:"), s))))` —
  * lowercase-hex md5 of the UTF-8 bytes of `"<seed>:<shingle>"`, minimum
  * by binary (= lexicographic ASCII) order, null element when the shingle
  * array is empty or all-null, null result for a null array.
  *
  * Replaces `numHashes` sequential interpreted `transform` passes (8 array
  * allocations + 8 interpreted lambda walks per row) with a single
  * compiled loop that reuses one thread-local MessageDigest.
  */
case class MinHashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("minhash_sigs requires numHashes > 0")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sigs requires array<string> shingles, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  @transient private lazy val kernel = new MinHashKernel(numHashes)

  override protected def nullSafeEval(input: Any): Any =
    kernel.signatures(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashKernel", kernel,
      classOf[MinHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.signatures($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatures =
    copy(child = newChild)

  override def prettyName: String = "minhash_sigs"
}

class MinHashKernel(numHashes: Int) extends Serializable {

  // "<seed>:" prefixes, precomputed once.
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(i => s"$i:".getBytes(StandardCharsets.UTF_8))

  // MessageDigest is stateful and not thread-safe; generated code can share
  // the references array across task threads, so keep one digest per thread.
  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray.map(_.toByte)

  private def md5Hex(md: MessageDigest, prefix: Array[Byte], s: UTF8String): Array[Byte] = {
    md.reset()
    md.update(prefix)
    md.update(s.getBytes)
    val raw = md.digest()
    val hex = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexChars((raw(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexChars(raw(i) & 0xf)
      i += 1
    }
    hex
  }

  // Lexicographic compare of equal-length ASCII hex strings (all bytes
  // < 0x80, so signed byte compare == unsigned == UTF8String binary order).
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  def signatures(shingles: ArrayData): ArrayData = {
    val md = digests.get()
    val mins = new Array[Array[Byte]](numHashes)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var k = 0
        while (k < numHashes) {
          val h = md5Hex(md, prefixes(k), s)
          if (mins(k) == null || less(h, mins(k))) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) = if (mins(k) == null) null else UTF8String.fromBytes(mins(k))
      k += 1
    }
    new GenericArrayData(out)
  }
}
