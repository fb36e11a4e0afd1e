package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ScalaCheck-generated invariants for [[HeavyHitters]]: on random
  * zipf-ish streams the two-pass result equals the naive full
  * aggregation EXACTLY, and the per-partition summary never exceeds its
  * bound. (Raw `Gen` sampling with fixed seeds, the
  * [[CohortsPropertySpec]] convention.)
  */
class HeavyHittersPropertySpec extends SparkTestBase {
  import spark.implicits._

  // skewed keys: small ids appear often (id 1 ~ half the mass)
  private val keyGen: Gen[String] =
    Gen.frequency(
      (8, Gen.const("k1")), (4, Gen.const("k2")), (2, Gen.const("k3")),
      (1, Gen.choose(4, 500).map(i => s"k$i")))

  private def stream(seed: Long, n: Int): Seq[String] =
    (0 until n).flatMap(i => keyGen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("random skewed streams: two-pass ≡ naive exact, across denominators and partitionings") {
    for (seed <- Seq(3L, 777L, 424242L); denom <- Seq(5, 20, 100); parts <- Seq(1, 7)) {
      val rows = stream(seed, 1500)
      val df = rows.toDF("term").repartition(parts).persist()
      val got = HeavyHitters.heavyHitters(df, "term", denom)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expect = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * denom > rows.size }.toMap
      df.unpersist()
      assert(got == expect,
        s"seed=$seed denom=$denom parts=$parts: $got != $expect")
    }
  }

  test("misraGries on random streams: bounded size and superset of the true heavy set") {
    for (seed <- Seq(11L, 2024L); k <- Seq(3, 10, 50)) {
      val rows = stream(seed, 2000)
      val out = HeavyHitters.misraGries(rows.iterator, k).toSet
      assert(out.size <= k, s"seed=$seed k=$k: summary ${out.size} > $k")
      val truth = rows.groupBy(identity).view.mapValues(_.size)
        .filter { case (_, c) => c * k > rows.size }.keySet
      assert(truth.subsetOf(out),
        s"seed=$seed k=$k: missed ${truth -- out}")
    }
  }
}
