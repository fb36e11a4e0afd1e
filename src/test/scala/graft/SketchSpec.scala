package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The approximate-aggregation switches the scaladocs point at for
  * unbounded cardinality at 100 TB (q27's count-distinct, q36's exact
  * percentile): prove the sketches actually land within their error
  * budgets on real data, so the "switch to approx" advice is tested, not
  * folklore. Both are single-pass, mergeable sketches (HLL++ and
  * KLL-style quantiles) — constant memory per group where the exact forms
  * grow with distinct values.
  */
class SketchSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct: within the configured rsd of exact on every lineitem column") {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val exact = li.select(cols.map(c => count_distinct(col(c)).as(c)): _*).first()
    val approx = li.select(
      cols.map(c => approx_count_distinct(col(c), rsd = 0.02).as(c)): _*).first()
    cols.zipWithIndex.foreach { case (c, i) =>
      val e = exact.getLong(i).toDouble
      val a = approx.getLong(i).toDouble
      // 0.02 rsd is a standard deviation, not a hard bound — 4 sigma is a
      // deterministic-enough ceiling for a fixed dataset and seed
      assert(math.abs(a - e) / e <= 0.08,
        s"$c: approx $a vs exact $e drifted beyond 4x rsd")
    }
  }

  test("HLL sketches: per-batch sketch + merge equals sketching everything at once, near exact") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, dir)
    // split the stream into three disjoint "days" and sketch each
    // independently — the persisted-increment shape
    val batches = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    val sketches = batches.map(b =>
      Sketches.distinctSketch(b, Seq("event_type"), "user_id")).reduce(_ unionAll _)
    val merged = Sketches.mergeEstimate(sketches, Seq("event_type")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // merging batch sketches must equal the single-pass sketch bit-for-bit
    // (HLL union of same-lgK sketches loses nothing vs sketching the union)
    val onePass = Sketches.mergeEstimate(
      Sketches.distinctSketch(ev, Seq("event_type"), "user_id"),
      Seq("event_type")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == onePass, "batch-merged and one-pass sketch estimates diverged")
    // replayed batch folds in idempotently (register max)
    val replayed = Sketches.mergeEstimate(sketches.unionAll(
      Sketches.distinctSketch(batches.head, Seq("event_type"), "user_id")),
      Seq("event_type")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(replayed == merged, "re-unioning a batch sketch must not move the estimate")
    // and the estimate tracks the exact distinct within the lgK error bar
    val exact = ev.groupBy("event_type").agg(count_distinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(merged(k) - e).toDouble / e <= 0.10,
        s"$k: estimate ${merged(k)} vs exact $e beyond 4x the lgK=12 rsd")
    }
  }

  test("freqItems: single-pass heavy hitters never miss an item above the support threshold") {
    // Karp-Papadimitriou-Shenker guarantee: every value with frequency
    // > support·n is IN the result (false positives allowed, misses not) —
    // the one-pass top-of-distribution triage before an exact count
    val ev = Tables.events(spark, dir)
    val support = 0.1
    val hits = ev.stat.freqItems(Array("event_type"), support)
      .head().getSeq[String](0).toSet
    val n = ev.count()
    val above = ev.groupBy("event_type").count()
      .filter(col("count") > support * n)
      .select("event_type").collect().map(_.getString(0)).toSet
    assert(above.subsetOf(hits),
      s"items above threshold $above must all be reported; got $hits")
  }

  test("approx_percentile: within accuracy bound of the exact interpolated percentile") {
    val li = Tables.lineitem(spark, dir)
    val row = li.select(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"),
      count(lit(1)).as("n")).first()
    val (exact, approx, n) = (row.getDouble(0), row.getDouble(1), row.getLong(2))
    // percentile_approx(accuracy=A) guarantees rank error <= n/A; convert
    // the rank window into a value window via the empirical distribution
    // (+2 ranks absorbs 0/1-index and even-n median conventions)
    val rankErr = ((n.toDouble / 10000).ceil.toLong max 1L) + 2L
    val sorted = li.select(col("l_extendedprice").cast("double")).orderBy("l_extendedprice")
    val mid = n / 2
    val window = sorted.limit((mid + rankErr + 1).toInt).collect()
      .drop((mid - rankErr).toInt).map(_.getDouble(0))
    assert(approx >= window.min && approx <= window.max,
      s"approx median $approx outside the rank-error window " +
        s"[${window.min}, ${window.max}] around exact $exact")
  }

  test("CMS frequency sketches: batch-merge is exact, never under-counts, eps-bounded over-count") {
    import graft.operators.Sketches
    val ev = Tables.events(spark, dir)
    val batches = (0 until 3).map(i => ev.filter(col("event_id") % 3 === i))
    val perBatch = batches.map(b =>
      Sketches.freqSketch(b, Seq("event_type"), "user_id").collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("cms")).toMap)
    val keys = perBatch.flatMap(_.keys).distinct
    val merged = keys.map(k =>
      k -> Sketches.mergeFreqSketches(perBatch.flatMap(_.get(k)))).toMap
    // cell-wise addition: merged batch sketches ≡ the one-pass sketch
    val onePass = Sketches.freqSketch(ev, Seq("event_type"), "user_id").collect()
      .map(r => r.getString(0) ->
        Sketches.mergeFreqSketches(Seq(r.getAs[Array[Byte]]("cms")))).toMap
    val exact = ev.groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = ev.groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case ((et, uid), n) =>
      val est = merged(et).estimateCount(uid)
      assert(est == onePass(et).estimateCount(uid),
        s"merged and one-pass CMS disagree for ($et, $uid)")
      assert(est >= n, s"CMS under-counted ($et, $uid): $est < $n")
      // eps=1e-4 bound: over-count ≤ eps × N per group (probabilistic at
      // confidence 0.99, deterministic here for fixed data + seed)
      assert(est - n <= math.max(1L, (1e-4 * totals(et)).ceil.toLong * 4),
        s"CMS over-count for ($et, $uid): est $est vs true $n, N=${totals(et)}")
    }
  }
}
