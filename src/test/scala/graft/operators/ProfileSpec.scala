package graft.operators

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("profile: totals, null counts, distincts, and null_pct per column") {
    val df = Seq(
      (1L, Some("a"), Some(1.5)),
      (2L, None, Some(1.5)),
      (3L, Some("a"), None),
      (4L, Some("b"), Some(2.5))
    ).toDF("id", "s", "d")
    val out = Profile.profile(df, Seq("id", "s", "d"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("id") == ((4L, 4L, 4L, 0.0)))
    assert(out("s") == ((4L, 3L, 2L, 25.0)))
    assert(out("d") == ((4L, 3L, 2L, 25.0)))
  }

  test("profile: hostile column names (backtick, quote) profile instead of breaking") {
    val df = Seq((1L, "x"), (2L, "y"))
      .toDF("a`b", "it's")
    val out = Profile.profile(df, Seq("a`b", "it's"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a`b") == ((2L, 2L, 2L, 0.0)))
    assert(out("it's") == ((2L, 2L, 2L, 0.0)))
  }

  test("histogram: floor-division buckets with inclusive lower bounds, nulls dropped") {
    val df = Seq(Some(0.5), Some(1.5), Some(2.5), Some(999.0), Some(1000.0),
      Some(2500.0), None).toDF("v")
    val out = Profile.histogram(df, "v", 1000.0)
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(0L -> ((0.0, 4L)), 1L -> ((1000.0, 1L)), 2L -> ((2000.0, 1L))))
  }

  test("histogram: width must be positive") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] { Profile.histogram(df, "v", 0.0) }
  }

  test("profile plan: one shuffle, partial aggregation before it") {
    val df = Seq((1L, "a")).toDF("id", "s")
    val p = Profile.profile(df, Seq("id", "s")).queryExecution.executedPlan.toString
    // count-distinct plans two aggregate phases over one exchange pair;
    // what must NOT appear is a per-column scan (one stack generator only)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
  }
}
