package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the two claims [[HeavyHitters]] makes: the per-partition
  * Misra-Gries summary is a bounded candidate SUPERSET (no global heavy
  * hitter can be missed, size ≤ k regardless of input), and the two-pass
  * result is EXACTLY the naive full-aggregation answer.
  */
class HeavyHittersSpec extends SparkTestBase {

  test("misraGries emits at most k keys and never misses an item above n/k") {
    // adversarial order: the heavy item arrives FIRST, then a flood of
    // distinct keys tries to evict it via decrement-all rounds
    val heavy = Seq.fill(400)("hot")
    val flood = (1 to 1100).map(i => s"cold_$i")
    val stream = heavy ++ flood // n = 1500, k = 10 → threshold 150
    val out = HeavyHitters.misraGries(stream.iterator, 10).toSet
    assert(out.size <= 10, s"summary exceeded k: $out")
    assert(out.contains("hot"), "an item with freq > n/k must survive")
  }

  test("misraGries under interleaved adversarial order still keeps the heavy key") {
    val interleaved = (1 to 3000).flatMap(i =>
      if (i % 3 == 0) Seq("hot") else Seq(s"cold_$i"))
    val out = HeavyHitters.misraGries(interleaved.iterator, 5).toSet
    // freq(hot) = 1000 > n/k = 600
    assert(out.size <= 5)
    assert(out.contains("hot"))
  }

  test("two-pass heavy hitters equals the naive groupBy + threshold exactly") {
    import spark.implicits._
    // zipfian-ish: key i appears ~ 4000/i times, spread over 8 partitions
    val rows = (1 to 60).flatMap(i => Seq.fill(4000 / i)(s"k$i"))
    val df = spark.createDataset(rows).toDF("term").repartition(8)
      .persist()
    val denom = 50
    val got = HeavyHitters.heavyHitters(df, "term", denom)
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    val n = rows.size
    val expect = df.groupBy("term").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") * denom > lit(n))
      .orderBy("term").collect().map(r => (r.getString(0), r.getLong(1)))
    df.unpersist()
    assert(expect.nonEmpty, "fixture must produce at least one heavy hitter")
    assert(got.sameElements(expect))
  }

  test("null keys are excluded from the result AND from N") {
    import spark.implicits._
    // 6 nulls + 4 "a" over 10 rows, denom 3: with nulls excluded N=4 and
    // "a" qualifies (4*3 > 4); if nulls leaked into N (N=10), "a" would
    // still qualify, but if nulls deflated ratios at larger scale keys
    // would vanish — pin the exact non-null contract instead
    val df = (Seq.fill(6)(Option.empty[String]) ++ Seq.fill(4)(Option("a")))
      .toDF("term").repartition(3)
    val got = HeavyHitters.heavyHitters(df, "term", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 4L)))
    // and a denominator where "a" is heavy only under non-null N:
    // N_nonnull=4 → threshold 4/2=2 < 4 (qualifies); N_withnulls=10 →
    // threshold 5 > 4 (would NOT qualify) — proves N excludes nulls
    val got2 = HeavyHitters.heavyHitters(df, "term", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got2 == Seq(("a", 4L)), s"N must exclude null rows: $got2")
  }

  test("no heavy hitters → empty result, not an error") {
    import spark.implicits._
    val df = spark.createDataset((1 to 1000).map(i => s"u$i")).toDF("term")
      .repartition(4)
    // every key unique: nothing exceeds n/denom for denom < n
    assert(HeavyHitters.heavyHitters(df, "term", 100).count() == 0)
  }

  test("zero-partition and empty inputs → empty result, not an NPE") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // a truly partitionless frame: no (null, n) summary rows are ever
    // emitted, so sum(_part_rows) is NULL — the coalesce-to-0 path
    val zeroPart = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("term", StringType))))
    assert(zeroPart.rdd.getNumPartitions == 0)
    assert(HeavyHitters.heavyHitters(zeroPart, "term", 10).count() == 0)
    // and the all-null variant (rows exist, none survive the filter)
    val allNull = Seq.fill(5)(Option.empty[String]).toDF("term")
    assert(HeavyHitters.heavyHitters(allNull, "term", 10).count() == 0)
  }

  test("long keys above 2^53 that collide as doubles stay distinct") {
    import spark.implicits._
    // 2^53 and 2^53+1 are the smallest adjacent longs with the same
    // double image: a recount joined on the native bigint column would
    // coerce the string candidates to double and merge the two keys.
    val a = 9007199254740992L // 2^53
    val b = a + 1
    val df = (Seq.fill(40)(a) ++ Seq.fill(30)(b) ++ (1L to 30L))
      .toDF("id").repartition(4)
    val got = HeavyHitters.heavyHitters(df, "id", 4) // N=100, threshold 25
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set((a.toString, 40L), (b.toString, 30L)),
      s"double coercion merged adjacent >2^53 keys: $got")
  }
}
