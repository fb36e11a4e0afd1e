package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
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

/** `winnow_fps(tokens, k, w)`: winnowing document fingerprints
  * (Schleimer–Wilkerson–Aiken) over an `array<string>` of tokens — the
  * md5s of all positional k-grams, then the distinct sliding-window-of-w
  * minima in first-occurrence order. Bit-identical to the composable form
  * in [[graft.llm.TextStats.winnowFingerprints]] (which chains
  * `transform`/`sequence`/`slice`/`array_min`/`md5`/`array_distinct`),
  * including the edges: null array → null, empty → empty, fewer than k
  * tokens → one whole-string gram, fewer than w grams → one global min.
  *
  * The composable chain evaluates its interpreted lambdas O(grams · w)
  * times per row AND re-computes the gram-hash subtree wherever it is
  * referenced; this kernel is one compiled pass — O(grams) md5 calls and an
  * O(grams) monotonic-deque sliding minimum.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k > 0 && w > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("winnow_fps requires k > 0 and w > 0")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fps requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val kernel = new WinnowKernel(k, w)

  override protected def nullSafeEval(input: Any): Any =
    kernel.fingerprints(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel,
      classOf[WinnowKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.fingerprints($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

class WinnowKernel(k: Int, w: Int) extends Serializable {

  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray.map(_.toByte)

  // md5 hex of the space-joined non-null tokens in [start, start+len) —
  // concat_ws semantics: null elements are skipped, separators only between
  // kept elements.
  private def gramHash(
      md: MessageDigest, tokens: ArrayData, start: Int, len: Int): Array[Byte] = {
    md.reset()
    var first = true
    var i = start
    val end = start + len
    while (i < end) {
      if (!tokens.isNullAt(i)) {
        if (!first) md.update(' '.toByte)
        md.update(tokens.getUTF8String(i).getBytes)
        first = false
      }
      i += 1
    }
    val raw = md.digest()
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((raw(j) >> 4) & 0xf)
      hex(2 * j + 1) = hexChars(raw(j) & 0xf)
      j += 1
    }
    hex
  }

  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 32) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  def fingerprints(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = digests.get()
    val numGrams = if (n < k) 1 else n - k + 1
    val hashes = new Array[Array[Byte]](numGrams)
    if (n < k) hashes(0) = gramHash(md, tokens, 0, n)
    else {
      var i = 0
      while (i < numGrams) { hashes(i) = gramHash(md, tokens, i, k); i += 1 }
    }
    if (numGrams < w) {
      var min = hashes(0)
      var i = 1
      while (i < numGrams) { if (less(hashes(i), min)) min = hashes(i); i += 1 }
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(min)))
    }
    // monotonic deque of candidate-min indices; emit once per full window,
    // dedup'd in first-occurrence order (array_distinct semantics)
    val out = new java.util.LinkedHashSet[UTF8String]
    val deque = new Array[Int](numGrams)
    var head = 0
    var tail = 0
    var i = 0
    while (i < numGrams) {
      while (tail > head && !less(hashes(deque(tail - 1)), hashes(i))) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) < i - w + 1) head += 1
      if (i >= w - 1) out.add(UTF8String.fromBytes(hashes(deque(head))))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }
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

/** `simhash_md5(tokens, bits)`: the md5-parity SimHash sketch of an
  * `array<string>` of tokens in ONE pass — one md5 per token instead of
  * the composable form's `bits` interpreted `aggregate` walks that each
  * re-hash every token ([[graft.llm.Dedup.simhash]] with
  * [[graft.llm.Dedup.md5Bit]], whose 32-bit q64 variant cost 32
  * re-evaluations of the token array per row). Bit-identical semantics:
  * bit j of the result is set iff sum over tokens of (+1 when hex digit
  * j of md5(token) is odd, else −1) is positive; a NULL token element
  * contributes −1 to every bit (`when(null).otherwise(-1)`); an empty
  * array yields 0; a null array yields null (callers wanting the
  * composable chain's 0-on-null wrap in `coalesce(.., 0)`). `bits` <= 64:
  * bit position j reads BIT PLANE j/32 of md5 hex digit j%32 — plane 0
  * (j < 32) is the original digit-parity semantics unchanged, plane 1
  * (32 <= j < 64) taps the digit's second bit, so one md5 yields up to 64
  * independent hyperplane signs (md5's 128 bits support 4 planes; two
  * keep the sketch inside a non-negative-safe BIGINT for the SQL twin).
  */
case class SimHashSketch(child: Expression, bits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if bits > 0 && bits <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckFailure("simhash_md5 requires 0 < bits <= 64")
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"simhash_md5 requires array<string> tokens, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val kernel = new SimHashKernel(bits)

  override protected def nullSafeEval(input: Any): Any =
    kernel.sketch(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHashKernel", kernel,
      classOf[SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.sketch($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSketch =
    copy(child = newChild)

  override def prettyName: String = "simhash_md5"
}

class SimHashKernel(bits: Int) extends Serializable {

  @transient private lazy val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def sketch(tokens: ArrayData): Long = {
    val md = digests.get()
    val sums = new Array[Int](bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (tokens.isNullAt(i)) {
        // composable parity: when(null-condition).otherwise(-1) per bit
        var j = 0
        while (j < bits) { sums(j) -= 1; j += 1 }
      } else {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val raw = md.digest()
        var j = 0
        while (j < bits) {
          // bit j reads bit plane j/32 of hex digit j%32; hex digit d =
          // high nibble of raw(d/2) for even d, low for odd. Plane 0 is
          // the original digit-parity (odd hex char <=> low bit set).
          val d = j & 31
          val nibble = if ((d & 1) == 0) (raw(d >> 1) >> 4) & 0xf else raw(d >> 1) & 0xf
          sums(j) += (if (((nibble >> (j >> 5)) & 1) == 1) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sk = 0L
    var j = 0
    while (j < bits) {
      if (sums(j) > 0) sk |= 1L << j
      j += 1
    }
    sk
  }
}

/** `nfc_norm(text)`: Unicode NFC normalization (canonical decomposition +
  * canonical composition, UAX #15) of a string column — the operator Spark
  * has no built-in for. A static kernel call inside whole-stage codegen,
  * same monomorphic-call-site design as the kernels above; the DuckDB twin
  * is `nfc_normalize` (both sides implement the same Unicode algorithm, so
  * results agree byte-for-byte).
  *
  * Fast path: `Normalizer.isNormalized` is O(n) with no allocation and is
  * true for ASCII and for already-composed text — the overwhelming case in
  * a web corpus — so the String round-trip (UTF8String has no direct
  * normalizer) is only paid by rows that actually change.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nfc_norm requires a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcKernel.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcKernel.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_norm"
}

/** `cut_spans(tokens, starts, k)`: drop from an `array<string>` of tokens
  * every position covered by a k-token span beginning at any of the
  * `array<int>` `starts` (each start s covers positions [s, s+k-1]),
  * returning `struct(n_removed int, cleaned string)` — the covered-position
  * count and the surviving tokens re-joined with single spaces. The
  * span-cut half of exact duplicated-substring dedup: upstream marks which
  * span occurrences are corpus-duplicates; this rewrites the row.
  *
  * CONTRACT: `starts` must be sorted ascending (the operator feeds it from
  * `sort_array(collect_list(..))`) — the kernel is a single O(n + m)
  * two-pointer merge over the token stream and the start list, so an
  * out-of-order start would be consumed too late and its span ignored.
  * Null start elements are skipped. Semantics of the composable twin
  * `concat_ws(' ', filter(tokens, (t, j) -> NOT exists(starts, s -> j
  * between s and s+k-1)))`: a null TOKEN element is never emitted
  * (concat_ws skips nulls) but its position still counts as removed when
  * covered; either input array null → null. The quadratic HOF twin walks
  * interpreted lambdas O(n·m) per row — boilerplate-heavy documents have
  * m ~ n, and the megamorphic-callsite instability all TextKernels exist
  * to avoid (see file header).
  */
case class CutSpans(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure("cut_spans requires k > 0")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"cut_spans requires (array<string>, array<int>), got " +
            s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_removed", IntegerType, nullable = false),
    StructField("cleaned", StringType, nullable = false)))

  @transient private lazy val kernel = new SpanCutKernel(k)

  override protected def nullSafeEval(tokens: Any, starts: Any): Any =
    kernel.cut(tokens.asInstanceOf[ArrayData], starts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("spanCutKernel", kernel,
      classOf[SpanCutKernel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.cut($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CutSpans =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cut_spans"
}

class SpanCutKernel(k: Int) extends Serializable {

  @transient private lazy val space = UTF8String.fromString(" ")

  def cut(tokens: ArrayData, starts: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val m = starts.numElements()
    val kept = new java.util.ArrayList[UTF8String](n)
    var covered = -1L // rightmost position covered by any span opened so far
    var removed = 0
    var p = 0
    var j = 0
    while (j < n) {
      while (p < m && (starts.isNullAt(p) || starts.getInt(p) <= j)) {
        if (!starts.isNullAt(p)) {
          val end = starts.getInt(p).toLong + k - 1
          if (end > covered) covered = end
        }
        p += 1
      }
      if (j <= covered) removed += 1
      else if (!tokens.isNullAt(j)) kept.add(tokens.getUTF8String(j))
      j += 1
    }
    val cleaned = UTF8String.concatWs(
      space, kept.toArray(new Array[UTF8String](kept.size)): _*)
    new GenericInternalRow(Array[Any](removed, cleaned))
  }
}

object NfcKernel {
  import java.text.Normalizer

  def normalize(s: UTF8String): UTF8String = {
    // pure-ASCII (numBytes == numChars) is always NFC: no String allocation
    if (s.numBytes == s.numChars) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
