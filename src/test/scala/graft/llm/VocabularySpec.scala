package graft.llm

import graft.SparkTestBase

class VocabularySpec extends SparkTestBase {
  import spark.implicits._

  test("vocabulary: occurrence totals, document frequency, deterministic top-k cut") {
    val docs = Seq(
      (1L, "the cat sat"),
      (2L, "the dog sat sat"),
      (3L, "the bird")
    ).toDF("doc_id", "text")
    val out = TextStats.vocabulary(docs, "doc_id", "text", 3)
      .as[(String, Long, Long)].collect()
    // df order: the(3), sat(2), then df-1 terms tie-broken by term asc
    assert(out(0) == (("the", 3L, 3L)))
    assert(out(1) == (("sat", 3L, 2L))) // 3 occurrences (doubled in doc 2), 2 docs
    assert(out(2) == (("bird", 1L, 1L))) // bird < cat < dog at df=1
  }

  test("tfidf: hand-computed scores, smoothed idf, deterministic per-doc cut") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // N=2; df: a=2, b=1, c=1; idf_a = ln(3/3)+1 = 1.0,
    // idf_b = idf_c = round(ln(3/2)+1, 6) = 1.405465
    val all = TextStats.tfidf(docs, "doc_id", "text", topK = 5)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> (t._3, t._4, t._5)).toMap
    assert(all == Map(
      (1L, "a") -> ((2L, 2L, 2.0)),
      (1L, "b") -> ((1L, 1L, 1.405465)),
      (2L, "a") -> ((1L, 2L, 1.0)),
      (2L, "c") -> ((1L, 1L, 1.405465))))
    // topK=1: doc 1 keeps a (2.0 beats 1.405465), doc 2 keeps c
    val top1 = TextStats.tfidf(docs, "doc_id", "text", topK = 1)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(top1 == Map(1L -> "a", 2L -> "c"))
  }

  test("tfidf plan: per-doc top-k lowers to WindowGroupLimit") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextStats.tfidf(docs, "doc_id", "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("bpeMergeStep: leftmost-greedy pass, distinct-sided precondition enforced") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Seq("a", "b", "a", "b")),      // two disjoint matches
      (2L, Seq("x", "a", "b", "b")),      // match mid-array, trailing b kept
      (3L, Seq("b", "a")),                // reversed pair: no match
      (4L, Seq.empty[String])             // empty passes through
    ).toDF("id", "toks")
    val out = df.select(col("id"), TextStats.bpeMergeStep(col("toks"), "a", "b").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(out(1L) == Seq("ab", "ab"), s"got ${out(1L)}")
    assert(out(2L) == Seq("x", "ab", "b"), s"got ${out(2L)}")
    assert(out(3L) == Seq("b", "a"))
    assert(out(4L) == Seq.empty[String])
    intercept[IllegalArgumentException] {
      TextStats.bpeMergeStep(col("toks"), "a", "a")
    }
  }

  test("bpeApply: merges fire in rank order and consume their operands") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a b c"), (2L, "b c a")).toDF("doc_id", "text")
    // rank order matters: merge 2's left side ("ab") only exists AFTER
    // merge 1 ran — applying in order tokenizes doc 1 to the single "abc"
    val byId = TextStats.bpeApply(docs, "doc_id", "text",
      Seq(("a", "b"), ("ab", "c"))).collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) == 3 && byId(1L).getLong(2) == 1 &&
      byId(1L).getString(3) == "abc", s"doc 1: ${byId(1L)}")
    // merges consume operands: (b,c) never fires in doc 2's "b c a"? it
    // DOES fire (b,c are adjacent) — but after (a,b) consumed nothing
    val consumed = TextStats.bpeApply(docs, "doc_id", "text",
      Seq(("a", "b"), ("b", "c"))).collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 "a b c": (a,b) -> [ab, c]; then (b,c) finds no bare b -> [ab, c]
    assert(consumed(1L).getString(3) == "ab c", s"doc 1: ${consumed(1L)}")
    // doc 2 "b c a": (a,b) no match; (b,c) -> [bc, a]
    assert(consumed(2L).getString(3) == "bc a", s"doc 2: ${consumed(2L)}")

    // the apply side is a pure projection chain: no exchange anywhere
    val p = TextStats.bpeApply(docs, "doc_id", "text", Seq(("a", "b")))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"bpeApply must not shuffle:\n$p")
  }

  test("bpeApply carry: passthrough columns ride the chain without a shuffle or value change") {
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a b c", "en", 5L), (2L, "", "de", 0L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = TextStats.bpeApply(docs, "doc_id", "text", Seq(("a", "b")),
      carry = Seq("lang", "n_chars"))
    assert(out.columns.toSeq ==
      Seq("doc_id", "lang", "n_chars", "n_before", "n_after", "tokens"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) == "en" && byId(1L).getLong(2) == 5L &&
      byId(1L).getLong(3) == 3L && byId(1L).getLong(4) == 2L &&
      byId(1L).getString(5) == "ab c")
    // empty doc: zero tokens before and after, carries intact
    assert(byId(2L).getString(1) == "de" && byId(2L).getLong(3) == 0L &&
      byId(2L).getLong(4) == 0L)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"carry must not introduce a shuffle:\n$p")
  }

  test("bpeTrainChained: round 2 selects a pair containing round 1's merged token") {
    // Pinned corpus: "a b" dominates round 1 (5 occurrences) -> merge "ab".
    // AFTER that rewrite, ("ab","c") appears 4 times and dominates round 2
    // — a pair whose left side EXISTS only post-merge, the chaining the
    // one-shot q75 learnedMerges ranking cannot produce (its single global
    // count never contains "ab"). Round 3 then consumes round 2's output.
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c d"), (3L, "a b c d"), (4L, "a b c"),
      (5L, "a b x")).toDF("doc_id", "text")
    val table = TextStats.bpeTrainChained(docs, "text", 3)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(table(0) == ((1, "a", "b", "ab", 5L)), s"round 1: ${table(0)}")
    assert(table(1) == ((2, "ab", "c", "abc", 4L)), s"round 2: ${table(1)}")
    assert(table(2) == ((3, "abc", "d", "abcd", 3L)), s"round 3: ${table(2)}")
    // the q75 apply path consumes the chained table directly
    val merges = table.map(r => (r._2, r._3)).toSeq
    val applied = TextStats.bpeApply(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(applied(1L) == "abcd" && applied(4L) == "abc" && applied(5L) == "ab x",
      s"chained merges must tokenize end-to-end: $applied")
  }

  test("vocabulary plan: top-k lowers to TakeOrderedAndProject, never a global sort") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextStats.vocabulary(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
