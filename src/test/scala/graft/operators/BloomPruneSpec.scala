package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the Bloom semi-join prune to its whole contract: the pruned join
  * is ROW-IDENTICAL to the plain join (the no-false-negative guarantee the
  * q67 oracle rests on) — including nulls, an empty dimension, and a
  * deliberately oversaturated sketch — while actually rejecting most
  * non-joining fact rows before the join.
  */
class BloomPruneSpec extends SparkTestBase {
  import spark.implicits._

  private def fact(rows: Seq[(Option[Long], String)]) =
    rows.toDF("fk", "payload")
  private def dim(keys: Seq[Long]) =
    keys.map(k => (k, s"d$k")).toDF("dk", "dval")

  private val factRows: Seq[(Option[Long], String)] =
    (0L until 200L).map(k => (Some(k), s"p$k")) :+ ((None: Option[Long], "pnull"))

  test("pruned join == plain join, with null fact keys and non-matching rows") {
    val f = fact(factRows)
    val d = dim(Seq(3L, 7L, 120L, 199L, 5000L))
    val got = BloomPrune.prunedJoin(f, "fk", d, "dk", expectedItems = 16L)
      .select("fk", "payload", "dk", "dval")
      .as[(Long, String, Long, String)].collect().toSet
    val want = f.join(d, col("fk") === col("dk"))
      .select("fk", "payload", "dk", "dval")
      .as[(Long, String, Long, String)].collect().toSet
    assert(got == want)
    assert(got.size == 4) // 5000L has no fact row; the null row joins nothing
  }

  test("oversaturated sketch stays correct: 50x more keys than expectedItems") {
    val f = fact(factRows)
    val d = dim(0L until 100L)
    val got = BloomPrune.prunedJoin(f, "fk", d, "dk", expectedItems = 2L)
      .count()
    assert(got == 100L)
  }

  test("empty dimension yields an empty join, not an NPE on the null sketch") {
    val f = fact(factRows)
    val d = dim(Seq.empty)
    assert(BloomPrune.prunedJoin(f, "fk", d, "dk", expectedItems = 4L).count() == 0L)
  }

  test("the probe actually prunes: most non-joining fact rows die before the join") {
    val f = fact(factRows)
    val sketch = BloomPrune.bloomOf(dim(Seq(3L, 7L)), "dk", expectedItems = 16L, fpp = 0.01)
    val survivors = f.filter(
      call_function("bloom_probe", lit(sketch), xxhash64(col("fk")))).count()
    // 2 true keys survive; of the 198 others each passes at ~fpp
    assert(survivors >= 2 && survivors <= 12,
      s"expected ~2 of 201 rows to pass the probe, got $survivors")
  }

  test("optimalNumBits: standard sizing, ~9.6 bits/item at 1% fpp") {
    val bits = BloomPrune.optimalNumBits(1000000L, 0.01)
    assert(bits > 9500000L && bits < 9700000L, s"got $bits")
    intercept[IllegalArgumentException](BloomPrune.optimalNumBits(0L, 0.01))
    intercept[IllegalArgumentException](BloomPrune.optimalNumBits(10L, 1.0))
  }

  test("rejects overlapping fact/dim column names") {
    val f = Seq((1L, "x")).toDF("k", "payload")
    val d = Seq((1L, "y")).toDF("k", "dval")
    intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin(f, "k", d, "k", expectedItems = 4L)
    }
  }

  test("shuffle-join regime: the probe filter survives below the exchange when the dim cannot broadcast") {
    // parquet-backed inputs: over a LocalTableScan the optimizer's
    // ConvertToLocalRelation evaluates the (deterministic) probe at plan
    // time and the Filter node vanishes — pruning still happens, but this
    // test pins WHERE it happens in a real scan plan
    val tmp = java.nio.file.Files.createTempDirectory("bloomprune").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      fact(factRows).write.parquet(s"$tmp/fact")
      dim(Seq(3L, 7L, 120L)).write.parquet(s"$tmp/dim")
      val f = spark.read.parquet(s"$tmp/fact")
      val d = spark.read.parquet(s"$tmp/dim")
      val p = BloomPrune.prunedJoin(f, "fk", d, "dk", expectedItems = 16L)
        .queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"with broadcast off the exact join must shuffle:\n$p")
      assert(p.contains("bloom_probe") || p.contains("might_contain"),
        s"the probe must appear in the plan:\n$p")
      val probeAt = p.indexOf("loom")
      val exchangeAt = p.indexOf("Exchange")
      assert(probeAt > exchangeAt && exchangeAt >= 0,
        s"probe filter must sit BELOW (after, in tree print order) the exchange:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
