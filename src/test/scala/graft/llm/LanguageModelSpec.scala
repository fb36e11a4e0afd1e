package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[LanguageModel]] — the CCNet-shaped interpolated-bigram perplexity
  * filter. The arithmetic is hand-checked on a corpus small enough to fold
  * by eye; the filter PROPERTY (reference-like text scores lower than
  * gibberish) is asserted directly, since that is the thing a curation
  * pipeline actually consumes.
  */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "lang")

  private val ref = col("lang") === "en"

  /** Spark `round(_, 6)` twin: HALF_UP on BigDecimal, NOT rint's half-even. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's exact output arithmetic: per-position log-probs rounded
    * to 6 decimals, summed EXACTLY in micro-units, then the mean's 6-decimal
    * round decided by half-away-from-zero integer division (never a double
    * round of a double division — the q73 tie class).
    */
  private def nll(lps: Double*): Double = {
    val micros = lps.map(x =>
      (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) * 1000000).toLongExact)
    val m = -micros.sum
    val n = lps.size
    ((2 * m + n) / (2L * n)).toDouble / 1e6
  }

  test("hand-computed: single-token doc is unigram-scored") {
    // Reference: "a b a b" -> T=4, V=2, c(a)=2, c(b)=2; bigrams
    // (a,b)x2 kept, (b,a)x1 pruned at minCount=2.
    val df = frame((1L, "a b a b", "en"), (2L, "a", "xx"))
    val out = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .filter(col("doc_id") === 2L).head()
    // p_uni(a) = (2+1)/(4+2+1) = 3/7; nll = -round(ln(3/7),6)
    val expected = nll(math.log(3.0 / 7.0))
    assert(out.getLong(1) == 1L)
    assert(math.abs(out.getDouble(2) - expected) < 1e-9,
      s"got ${out.getDouble(2)}, expected $expected")
  }

  test("hand-computed: bigram interpolation uses lambda*cond + (1-lambda)*p_uni") {
    val df = frame((1L, "a b a b", "en"), (2L, "a b", "xx"))
    val out = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .filter(col("doc_id") === 2L).head()
    // position 1: p = p_uni(a) = 3/7
    // position 2: cond(b|a) = c(a,b)/c(a) = 2/2 = 1; p_uni(b) = 3/7
    //             p = 0.7*1 + 0.3*(3/7)
    val expected =
      nll(math.log(3.0 / 7.0), math.log(0.7 + 0.3 * (3.0 / 7.0)))
    assert(out.getLong(1) == 2L)
    assert(math.abs(out.getDouble(2) - expected) < 1e-9,
      s"got ${out.getDouble(2)}, expected $expected")
  }

  test("pruned bigram falls back to the unigram-only interpolation term") {
    // (b,a) occurs once in the reference -> pruned; cond = 0, so the pair
    // position scores ln(0.3 * p_uni(a)).
    val df = frame((1L, "a b a b", "en"), (2L, "b a", "xx"))
    val out = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .filter(col("doc_id") === 2L).head()
    // p_uni(b) = 3/7 at position 1
    val expected =
      nll(math.log(3.0 / 7.0), math.log(0.3 * (3.0 / 7.0)))
    assert(math.abs(out.getDouble(2) - expected) < 1e-9)
  }

  test("filter property: reference-like text scores lower nll than unseen text") {
    val df = frame(
      (1L, "the cat sat on the mat and the cat sat again", "en"),
      (2L, "the dog sat on the mat and the dog sat again", "en"),
      (3L, "the cat sat on the mat", "xx"),
      (4L, "zqx wvu ppl mno qrs ttt", "xx"))
    val out = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(3) < out(4),
      s"reference-like doc must beat gibberish: ${out(3)} vs ${out(4)}")
  }

  test("empty-tokenizing docs drop out; every other doc appears exactly once") {
    val df = frame((1L, "a b", "en"), (2L, "   ", "xx"), (3L, "c", "xx"))
    val out = LanguageModel.perplexity(df, "doc_id", "text", ref).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("empty reference slice fails fast instead of scoring every doc 0") {
    val df = frame((1L, "a b", "xx"), (2L, "c d", "yy"))
    val e = intercept[IllegalArgumentException] {
      LanguageModel.perplexity(df, "doc_id", "text", ref)
    }
    assert(e.getMessage.contains("reference slice is empty"))
  }

  test("scoring is deterministic across invocations") {
    val df = frame(
      (1L, "a b c a b", "en"), (2L, "b c a", "en"), (3L, "c c c", "xx"))
    val a = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .orderBy("doc_id").collect().toSeq
    val b = LanguageModel.perplexity(df, "doc_id", "text", ref)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
