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

  test("hashSplit: deterministic labels, rate-tracking, and cluster co-assignment") {
    val df = ids.withColumn("split", Sampling.hashSplit(col("id"), 0.9))
    val a = df.as[(Long, String)].collect()
    val b = ids.withColumn("split", Sampling.hashSplit(col("id"), 0.9))
      .as[(Long, String)].collect()
    assert(a.toSeq == b.toSeq, "split labels must be retry-stable")
    val trainRate = a.count(_._2 == "train").toDouble / a.length
    assert(trainRate > 0.85 && trainRate < 0.95, s"expected ~0.90 train, got $trainRate")
    // the leakage contract: rows sharing a cluster key share a split label
    val clustered = (1L to 300L).map(i => (i, i % 37)).toDF("id", "cluster")
      .withColumn("split", Sampling.hashSplit(col("cluster"), 0.8))
    val labelsPerCluster = clustered.groupBy("cluster")
      .agg(countDistinct("split").as("n")).agg(max("n")).as[Long].head()
    assert(labelsPerCluster == 1L, "a cluster must never straddle the split")
  }

  test("temperatureSample: smallest group keeps all, bigger groups thin toward sqrt, deterministic") {
    // groups: g0 = 100 rows, g1 = 400, g2 = 1600 → rates 1.0, 0.5, 0.25
    val df = ((1L to 100L).map(i => (i, "g0")) ++
      (101L to 500L).map(i => (i, "g1")) ++
      (501L to 2100L).map(i => (i, "g2"))).toDF("id", "grp")
    val out = Sampling.temperatureSample(df, col("grp"), col("id"))
    val again = Sampling.temperatureSample(df, col("grp"), col("id"))
    assert(out.as[(Long, String, Double)].collect().toSet ==
      again.as[(Long, String, Double)].collect().toSet, "draw must be deterministic")
    val kept = out.groupBy("grp").agg(count(lit(1)).as("n"), first("rate").as("r"))
      .as[(String, Long, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(kept("g0") == ((100L, 1.0)), "min group keeps everything at rate 1.0")
    assert(kept("g1")._2 == 0.5 && kept("g2")._2 == 0.25, s"sqrt anchor rates: $kept")
    // md5 draw tracks the rate (±35% relative at these sizes)
    assert(math.abs(kept("g1")._1 - 200.0) < 70, s"g1 kept ${kept("g1")._1}, expected ~200")
    assert(math.abs(kept("g2")._1 - 400.0) < 140, s"g2 kept ${kept("g2")._1}, expected ~400")
    // the corpus is never shuffled: rates arrive by broadcast join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast onto the corpus:\n$plan")
  }

  test("dsirWeightsFor: target-distinctive bigrams score positive, raw-typical negative; lp table broadcasts") {
    // Crafted corpus: target docs are saturated with one bigram ("alpha
    // beta"), raw-only docs with another ("gamma delta"). DSIR must give
    // target-like docs positive log-ratio weights (keep) and raw-typical
    // docs negative (drop) — and a fresh doc made of target-language
    // bigrams must classify positive even though it is NOT in the target
    // slice (the generalization that makes importance sampling a sampler,
    // not a lookup).
    val docs = (
      (1L to 20L).map(i => (i, "alpha beta " * 10, "tgt")) ++
      (21L to 80L).map(i => (i, "gamma delta " * 10, "raw")) ++
      Seq((99L, "alpha beta alpha beta", "raw"))
    ).toDF("doc_id", "text", "source")
    val out = graft.LlmQueries.dsirWeightsFor(docs, col("source") === "tgt")
    val byId = out.collect().map(r => r.getLong(0) ->
      (r.getDouble(2), r.getBoolean(3))).toMap
    assert(byId(1L)._1 > 0 && byId(1L)._2, s"target doc must keep: ${byId(1L)}")
    assert(byId(21L)._1 < 0 && !byId(21L)._2, s"raw-typical doc must drop: ${byId(21L)}")
    assert(byId(99L)._1 > 0 && byId(99L)._2,
      s"target-LANGUAGE doc outside the slice must still keep: ${byId(99L)}")
    // scale shape: the B-row log-ratio table broadcasts onto the gram
    // stream; the corpus grams never hash-shuffle except the two
    // B-bounded histograms and the final doc aggregation
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"lp table must broadcast onto grams:\n$p")
  }

  test("dsirResampleFrom: weight-proportional Gumbel draw — exact K, hand-checked key, bias toward heavy weights, heap-bounded plan") {
    // 200 light docs (weight 0) vs 200 heavy docs (weight 2): a K=100
    // Gumbel-top-k draw must over-select the heavy side (expected heavy
    // share e²/(1+e²) ≈ 0.88 per slot), be deterministic across runs,
    // and compute key = weight − ln(−ln(u_md5)) exactly.
    val w = ((1L to 200L).map(i => (i, 0.0)) ++
      (201L to 400L).map(i => (i, 2.0))).toDF("doc_id", "weight")
    val out = graft.LlmQueries.dsirResampleFrom(w, 100)
      .as[(Long, Double, Double)].collect()
    assert(out.length == 100)
    val again = graft.LlmQueries.dsirResampleFrom(w, 100)
      .as[(Long, Double, Double)].collect()
    assert(out.toSeq == again.toSeq, "md5-Gumbel draw must be deterministic")
    val heavy = out.count(_._1 > 200L)
    assert(heavy > 65, s"heavy-weight docs under-selected: $heavy/100")
    // hand-check one key: u from the first 6 md5 hex digits of "1"
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("1".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
    val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 16777216.0
    val expect = BigDecimal(0.0 - math.log(-math.log(u)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val k1 = graft.LlmQueries.dsirResampleFrom(w, 400)
      .as[(Long, Double, Double)].collect().find(_._1 == 1L).get._3
    assert(math.abs(k1 - expect) < 1e-9, s"key for doc 1: got $k1, expect $expect")
    // fixed-K global top-k lowers to per-partition heaps, not a full sort
    val p = graft.LlmQueries.dsirResampleFrom(w, 100)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"fixed-K top-k must lower to TakeOrderedAndProject:\n$p")
  }
}
