package graft.operators

import graft.SparkTestBase

class SpecParseSpec extends SparkTestBase {
  import spark.implicits._

  private def specRows = Seq(
    // channel, version, event_name, release_date, p1, p2, p3
    ("web", "2.1", "click", "2024-05-20", "k", "org_id", "project_id"),
    // cells equal to event name / "user_id" / channel / version / event date / empty are excluded
    ("web", "2.1", "signup", "2024-05-20", "signup", "user_id", "web"),
    ("web", "2.1", "view", "2024-05-20", "2.1", "2024-06-01", ""),
    ("web", "2.1", "purchase", "2024-05-20", null, "amount", null)
  ).toDF("channel", "version", "event_name", "release_date", "p1", "p2", "p3")
    .collect().toSeq

  test("pairs: exclusion semantics of event_verify.py:109-111") {
    val pairs = SpecParse.pairs(specRows, "web", "2.1", "2024-06-01")
    val byEvent = pairs.groupBy(_.eventName).view.mapValues(_.map(_.propName)).toMap
    assert(byEvent("click") == Seq("k", "org_id", "project_id"))
    assert(!byEvent.contains("signup"), "all signup cells hit an exclusion rule")
    assert(!byEvent.contains("view"), "version/event-date/empty cells are excluded")
    assert(byEvent("purchase") == Seq("amount"))
    // channel/version/event_name columns themselves are excluded by value
    assert(pairs.forall(p => p.propName != "web" && p.propName != "2.1"))
  }

  test("pairs: duplicates are kept (the reference appends without dedup)") {
    val rows = Seq(("web", "2.1", "click", "x", "k", "k", null))
      .toDF("channel", "version", "event_name", "release_date", "p1", "p2", "p3")
      .collect().toSeq
    val pairs = SpecParse.pairs(rows, "web", "2.1", "2024-06-01")
    assert(pairs.map(_.propName) == Seq("k", "k"))
  }

  test("pairs: dropCols are not flattened (rank/release_date intent, SURVEY 2.11(1))") {
    val rows = Seq(("web", "2.1", "click", "NOT_EXCLUDED_BY_VALUE", "k"))
      .toDF("channel", "version", "event_name", "release_date", "p1")
      .collect().toSeq
    val pairs = SpecParse.pairs(rows, "web", "2.1", "2024-06-01")
    assert(pairs.map(_.propName) == Seq("k"), "release_date cell must not become a property")
  }

  test("pairsDf: S3 local source round-trips") {
    val pairs = Seq(SpecPair("web", "2.1", "click", "k"), SpecPair("web", "2.1", "view", "x"))
    val df = SpecParse.pairsDf(spark, pairs)
    assert(df.columns.toSeq == Seq("channel", "version", "event_name", "prop_name"))
    assert(df.count() == 2)
  }
}
