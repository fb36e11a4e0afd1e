package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck-generated invariants for the cohort/funnel/transition
  * operators, evaluated through the real Spark plans. (Raw `Gen` sampling
  * with fixed seeds — the [[graft.llm.TextStatsPropertySpec]] convention:
  * the scalatest/scalacheck bridge isn't in the offline cache, and
  * deterministic seeds beat flaky property runs anyway.)
  */
class CohortsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val eventGen: Gen[(Long, String, Long)] = for {
    u <- Gen.choose(1L, 8L)
    t <- Gen.oneOf("signup", "view", "purchase", "click")
    ts <- Gen.choose(0L, 1000L)
  } yield (u, t, ts)

  private def corpus(seed: Long, n: Int): Seq[(Long, String, Long)] =
    (0 until n).flatMap(i =>
      eventGen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("funnel counts are monotonically non-increasing across stages") {
    for (seed <- Seq(1L, 100L, 10000L)) {
      val df = corpus(seed, 120).zipWithIndex
        .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
        .toDF("user_id", "event_type", "tus", "event_id")
      val row = Cohorts
        .funnel(df, "user_id", "event_type", "tus", Seq("signup", "view", "purchase"))
        .select("n_signup", "n_view", "n_purchase")
        .as[(Long, Long, Long)].head()
      assert(row._1 >= row._2 && row._2 >= row._3,
        s"seed $seed: funnel widened downstream: $row")
    }
  }

  test("retention: offsets are non-negative, cohort-0-offset cells cover every active user") {
    for (seed <- Seq(7L, 77L)) {
      val events = corpus(seed, 120).map { case (u, _, ts) => (u, ts) }
        .toDF("user_id", "tus")
      val cells = Cohorts.retention(events, "user_id", "tus", 100L)
        .as[(Long, Long, Long)].collect()
      assert(cells.forall(_._2 >= 0), s"seed $seed: negative offset")
      val nUsers = events.select("user_id").distinct().count()
      val atZero = cells.filter(_._2 == 0L).map(_._3).sum
      assert(atZero == nUsers,
        s"seed $seed: every user appears in their cohort's offset-0 cell exactly once")
    }
  }

  test("transitions: per-source probabilities sum to ~1 and counts equal events minus users") {
    for (seed <- Seq(3L, 33L)) {
      val df = corpus(seed, 150).zipWithIndex
        .map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
        .toDF("user_id", "event_type", "tus", "event_id")
      val m = Cohorts.transitions(df, "user_id", "event_type", "tus", "event_id")
        .as[(String, String, Long, Double)].collect()
      m.groupBy(_._1).foreach { case (from, rows) =>
        val pSum = rows.map(_._4).sum
        assert(math.abs(pSum - 1.0) < 1e-4,
          s"seed $seed: P(.|$from) sums to $pSum")
      }
      val nEvents = df.count()
      val nUsers = df.select("user_id").distinct().count()
      assert(m.map(_._3).sum == nEvents - nUsers,
        s"seed $seed: each user contributes exactly (events - 1) transitions")
    }
  }
}
