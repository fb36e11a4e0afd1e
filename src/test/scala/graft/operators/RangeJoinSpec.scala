package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Pins the binned range join to the O(P·I) ground truth it decomposes:
  * the crossJoin+BETWEEN result set, pair for pair, including negative
  * values, bin-edge landings, degenerate and inverted intervals, and
  * nulls. Uniqueness (no pair duplicated across bins) is asserted
  * separately — it is the property the "join only in the point's bin"
  * argument rests on.
  */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val W = 10L // bin width for every test: edges land at multiples of 10

  private def truth(
      ps: Seq[(Long, Long)], is: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, x) <- ps
      (iid, lo, hi) <- is
      if lo <= x && x <= hi
    } yield (pid, iid)).toSet

  private def binned(
      ps: Seq[(Long, Long)], is: Seq[(Long, Long, Long)]): Seq[(Long, Long)] = {
    val points = ps.toDF("pid", "x")
    val intervals = is.toDF("iid", "lo", "hi")
    RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", W)
      .select("pid", "iid").as[(Long, Long)].collect().toSeq
  }

  test("equals crossJoin+BETWEEN ground truth on generated data, negatives included") {
    val gen = for {
      np <- Gen.choose(0, 40)
      ps <- Gen.listOfN(np, Gen.choose(-120L, 120L))
      ni <- Gen.choose(0, 15)
      is <- Gen.listOfN(ni, Gen.zip(Gen.choose(-120L, 120L), Gen.choose(0L, 45L)))
    } yield (ps, is.map { case (lo, len) => (lo, lo + len) })
    (0 until 12).foreach { i =>
      val (xs, spans) = gen.apply(Gen.Parameters.default, Seed(31L + i)).get
      val ps = xs.zipWithIndex.map { case (x, j) => (j.toLong, x) }
      val is = spans.zipWithIndex.map { case ((lo, hi), j) => (j.toLong, lo, hi) }
      val got = binned(ps, is)
      assert(got.size == got.toSet.size, s"seed $i: a pair was emitted twice")
      assert(got.toSet == truth(ps, is), s"seed $i: diverged from brute force")
    }
  }

  test("bin edges: point and bounds exactly on multiples of the width") {
    val ps = Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, -10L), (5L, 0L))
    val is = Seq(
      (1L, 10L, 20L),   // both bounds on edges: 10 and 20 inclusive
      (2L, -10L, -10L), // degenerate negative interval on an edge
      (3L, 0L, 0L))     // degenerate at zero
    val got = binned(ps, is).toSet
    assert(got == truth(ps, is))
    assert(got == Set((1L, 1L), (2L, 1L), (4L, 2L), (5L, 3L)))
  }

  test("an interval spanning many bins matches each point exactly once") {
    val ps = (0L until 100L).map(x => (x, x))
    val is = Seq((1L, 5L, 83L)) // 9 bins at width 10
    val got = binned(ps, is)
    assert(got.size == 79 && got.toSet.size == 79)
  }

  test("inverted and null-bounded intervals and null points match nothing") {
    val points = Seq((1L, Some(15L)), (2L, None))
      .toDF("pid", "x")
    val intervals = Seq(
      (1L, Some(20L), Some(10L)),  // lo > hi
      (2L, None, Some(30L)),       // null lo
      (3L, Some(10L), None),       // null hi
      (4L, Some(10L), Some(20L)))  // the only live interval
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", W)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 4L)))
  }

  test("a hostile open-ended interval is dropped, not exploded into billions of bins") {
    // hi = Long.MaxValue sentinel at bin width 10 would sequence() a
    // ~9.2e17-element array per interval without the cap; the guard must
    // exclude it while every sane interval still matches — and the
    // excluded rows must be exactly what oversizedIntervals reports.
    val ps = Seq((1L, 15L), (2L, 500L))
    val is = Seq(
      (1L, 10L, 20L),             // sane: spans 2 bins
      (2L, 0L, Long.MaxValue),    // hostile open-ended sentinel
      (3L, Long.MinValue, Long.MaxValue)) // span itself overflows a long
    val points = ps.toDF("pid", "x")
    val intervals = is.toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", W)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)), s"capped join diverged: $got")
    val dropped = RangeJoin.oversizedIntervals(intervals, "lo", "hi", W)
      .select("iid").as[Long].collect().toSet
    assert(dropped == Set(2L, 3L), s"drop audit diverged: $dropped")
    // an interval exactly AT the cap still joins; one past it drops
    val w = 1L
    val cap = RangeJoin.DefaultMaxBinsPerInterval
    val edge = Seq((1L, 0L, cap - 1L), (2L, 0L, cap)).toDF("iid", "lo", "hi")
    val p1 = Seq((1L, 0L)).toDF("pid", "x")
    val gotEdge = RangeJoin.pointInInterval(p1, "x", edge, "lo", "hi", w)
      .select("iid").as[Long].collect().toSet
    assert(gotEdge == Set(1L), s"cap edge diverged: $gotEdge")
    assert(RangeJoin.oversizedIntervals(edge, "lo", "hi", w)
      .select("iid").as[Long].collect().toSet == Set(2L))
  }

  test("rejects a non-positive bin width and overlapping column names") {
    val p = Seq((1L, 1L)).toDF("id", "x")
    val i = Seq((1L, 0L, 2L)).toDF("id", "lo", "hi")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, "x", i, "lo", "hi", 0L)
    }
    intercept[IllegalArgumentException] { // both sides name a column `id`
      RangeJoin.pointInInterval(p, "x", i, "lo", "hi", W)
    }
  }
}
