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

  test("vocabulary plan: top-k lowers to TakeOrderedAndProject, never a global sort") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val plan = TextStats.vocabulary(docs, "doc_id", "text", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
