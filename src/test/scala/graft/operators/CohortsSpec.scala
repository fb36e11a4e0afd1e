package graft.operators

import graft.SparkTestBase

class CohortsSpec extends SparkTestBase {
  import spark.implicits._

  private def events = Seq(
    // user 1: clean signup -> view -> purchase
    (1L, "signup", 10L), (1L, "view", 20L), (1L, "purchase", 30L),
    // user 2: view BEFORE signup only — view must not count
    (2L, "view", 5L), (2L, "signup", 10L), (2L, "purchase", 50L),
    // user 3: signup then purchase with no view — purchase must not count
    (3L, "signup", 10L), (3L, "purchase", 20L),
    // user 4: never signed up — counts nowhere
    (4L, "view", 10L),
    // user 5: view ties the signup timestamp — strict > excludes it
    (5L, "signup", 10L), (5L, "view", 10L)
  ).toDF("user_id", "event_type", "tus")

  test("funnel: strictly-ordered stages, ties and re-orderings excluded") {
    val row = Cohorts
      .funnel(events, "user_id", "event_type", "tus", Seq("signup", "view", "purchase"))
      .as[(Long, Long, Long, Double, Double)].head()
    assert(row == ((4L, 1L, 1L, 0.25, 0.25)))
  }

  test("funnel: single stage degenerates to a distinct-user count, no conv columns") {
    val df = Cohorts.funnel(events, "user_id", "event_type", "tus", Seq("view"))
    assert(df.columns.toSeq == Seq("n_view"))
    assert(df.as[Long].head() == 4L) // users 1, 2, 4, 5 ever viewed
  }

  test("funnel: duplicate or empty stage lists are rejected") {
    intercept[IllegalArgumentException] {
      Cohorts.funnel(events, "user_id", "event_type", "tus", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Cohorts.funnel(events, "user_id", "event_type", "tus", Seq("view", "view"))
    }
  }

  test("funnel plan: all stage windows ride ONE user-key exchange") {
    val p = Cohorts
      .funnel(events, "user_id", "event_type", "tus", Seq("signup", "view", "purchase"))
      .queryExecution.executedPlan.toString
    assert(p.split("Exchange hashpartitioning").length - 1 == 1,
      s"stage windows and the per-user reduce must share one user shuffle:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the window form must not plan stage joins:\n$p")
  }

  test("retention: cohort = first period per user, distinct users per cell") {
    val ev = Seq(
      (1L, 5L), (1L, 15L), (1L, 25L), // cohort 0, offsets 0/1/2
      (2L, 15L), (2L, 35L), // cohort 1, offsets 0/2
      (3L, 5L), (3L, 7L) // cohort 0, offset 0 (two events, one user)
    ).toDF("user_id", "tus")
    val out = Cohorts.retention(ev, "user_id", "tus", 10L)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      (0L, 0L) -> 2L, (0L, 1L) -> 1L, (0L, 2L) -> 1L,
      (1L, 0L) -> 1L, (1L, 2L) -> 1L))
  }

  test("transitions: lead pairs per user, row-normalized probabilities, last events drop") {
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "b", 20L, 2L), (1L, "a", 30L, 3L),
      (2L, "a", 10L, 4L), (2L, "a", 20L, 5L),
      (3L, "c", 10L, 6L) // single event: no transition
    ).toDF("user_id", "event_type", "tus", "event_id")
    val out = Cohorts.transitions(ev, "user_id", "event_type", "tus", "event_id")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out == Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "a") -> ((1L, 0.5)), ("b", "a") -> ((1L, 1.0))))
  }

  test("transitions: same-timestamp events order on the tie column") {
    val ev = Seq(
      (1L, "x", 10L, 2L), (1L, "y", 10L, 1L) // y first by event_id
    ).toDF("user_id", "event_type", "tus", "event_id")
    val out = Cohorts.transitions(ev, "user_id", "event_type", "tus", "event_id")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out == Seq(("y", "x", 1L, 1.0)))
  }

  test("retention: period must be positive") {
    intercept[IllegalArgumentException] {
      Cohorts.retention(events, "user_id", "tus", 0L)
    }
  }
}
