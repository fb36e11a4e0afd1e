package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val ids = (1L to 2000L).toDF("id")

  test("sampleByHash: selection rate tracks the requested rate, run-to-run identical") {
    val a = Sampling.sampleByHash(ids, col("id"), 0.3).as[Long].collect().toSet
    val b = Sampling.sampleByHash(ids, col("id"), 0.3).as[Long].collect().toSet
    assert(a == b, "hash sample must be deterministic")
    val rate = a.size.toDouble / 2000
    assert(rate > 0.25 && rate < 0.35, s"md5 uniformity: expected ~0.30, got $rate")
    // nested rates: a 0.1 sample is a subset of a 0.3 sample (same hash order)
    val small = Sampling.sampleByHash(ids, col("id"), 0.1).as[Long].collect().toSet
    assert(small.subsetOf(a), "lower rate must select a subset of a higher rate")
  }

  test("rateThresholdHex edges: 0 selects nothing, 1 selects everything") {
    assert(Sampling.sampleByHash(ids, col("id"), 0.0).count() == 0)
    assert(Sampling.sampleByHash(ids, col("id"), 1.0).count() == 2000)
  }

  test("stratifiedQuota: exactly quota rows per stratum (or all if fewer), deterministic") {
    val df = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val a = Sampling.stratifiedQuota(df, col("stratum"), col("id"), 10)
      .as[(Long, String)].collect().toSet
    val b = Sampling.stratifiedQuota(df, col("stratum"), col("id"), 10)
      .as[(Long, String)].collect().toSet
    assert(a == b)
    val perStratum = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perStratum.values.forall(_ == 10), s"quota violated: $perStratum")
    // tiny stratum keeps everything
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "stratum")
    assert(Sampling.stratifiedQuota(tiny, col("stratum"), col("id"), 10).count() == 2)
  }

  test("stratifiedQuota plan: rank filter lowers to WindowGroupLimit (no full per-stratum sort)") {
    val df = (1L to 100L).map(i => (i, s"s${i % 3}")).toDF("id", "stratum")
    val p = Sampling.stratifiedQuota(df, col("stratum"), col("id"), 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"quota must be group-limited:\n$p")
  }

  test("rankedQuota: keeps exactly the top-by-order rows per group, WindowGroupLimit plan") {
    // group g0: scores 100..91 must survive a cap of 3 as {100, 99, 98}
    val df = (1L to 30L).map(i => (i, s"g${i % 3}", (101 - i).toDouble))
      .toDF("id", "grp", "score")
    val out = Sampling.rankedQuota(df, col("grp"), 3, desc("score"), col("id"))
    val kept = out.as[(Long, String, Double)].collect()
    val byGrp = kept.groupBy(_._2)
    assert(byGrp.values.forall(_.length == 3), s"cap violated: $byGrp")
    // per group, the kept scores are the 3 LARGEST of that group's 10
    val all = df.as[(Long, String, Double)].collect().groupBy(_._2)
    byGrp.foreach { case (g, rows) =>
      val expect = all(g).map(_._3).sorted(Ordering[Double].reverse).take(3).toSet
      assert(rows.map(_._3).toSet == expect, s"group $g kept wrong rows")
    }
    // under-cap group keeps everything; plan stays group-limited
    val tiny = Seq((1L, "x", 5.0), (2L, "x", 4.0)).toDF("id", "grp", "score")
    assert(Sampling.rankedQuota(tiny, col("grp"), 10, desc("score"), col("id")).count() == 2)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"rankedQuota must be group-limited:\n$p")
  }
}
