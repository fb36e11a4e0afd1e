package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Proves the bucketing scale claims on the physical plan: a join of two
  * co-bucketed tables runs with ZERO exchanges, and a groupBy on the bucket
  * key aggregates without a shuffle — while the same plans over plain
  * parquet shuffle both sides. AQE and auto-broadcast are disabled inside
  * the test so the Exchange count is deterministic plan structure, not a
  * runtime re-plan.
  */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def countExchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("Exchange"))

  private def withPlanStableConfs[A](body: => A): A = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("co-bucketed join has zero exchanges; plain parquet join shuffles both sides") {
    val warehouse = Files.createTempDirectory("graft_buckets").toString
    val events = Tables.events(spark, dir)
    val users = events.groupBy("user_id").agg(count(lit(1)).as("n_total"))
    Bucketing.writeBucketed(events, "ev_bucketed", 4, Seq("user_id"),
      Seq("user_id"), Some(s"$warehouse/ev"))
    Bucketing.writeBucketed(users, "users_bucketed", 4, Seq("user_id"),
      Seq("user_id"), Some(s"$warehouse/users"))
    try withPlanStableConfs {
      val bucketed = Bucketing.readBucketed(spark, "ev_bucketed")
        .join(Bucketing.readBucketed(spark, "users_bucketed"), "user_id")
      val plain = events.join(users, "user_id")
      assert(countExchanges(bucketed) == 0,
        s"co-bucketed join should be exchange-free:\n${bucketed.queryExecution.executedPlan}")
      assert(countExchanges(plain) >= 2, "plain join should shuffle both sides")
      // and the shuffle-free plan computes the same result
      assert(bucketed.count() == plain.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS users_bucketed")
    }
  }

  test("q69 registered query: the fact join is exchange-free, only the final agg shuffles") {
    graft.CoreQueries.bucketedRevenue(spark, dir) // first call writes the tables
    try withPlanStableConfs {
      val replanned = graft.CoreQueries.bucketedRevenue(spark, dir)
      val n = countExchanges(replanned)
      // one Exchange for the o_orderpriority aggregation; ZERO under the join
      assert(n == 1,
        s"expected only the agg exchange, got $n:\n${replanned.queryExecution.executedPlan}")
      assert(replanned.count() > 0)
    } finally {
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_bkt_"))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val warehouse = Files.createTempDirectory("graft_buckets").toString
    val events = Tables.events(spark, dir)
    Bucketing.writeBucketed(events, "ev_bucketed_agg", 4, Seq("user_id"),
      path = Some(s"$warehouse/ev"))
    try withPlanStableConfs {
      val agg = Bucketing.readBucketed(spark, "ev_bucketed_agg")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(countExchanges(agg) == 0,
        s"bucket-key aggregation should be exchange-free:\n${agg.queryExecution.executedPlan}")
      val plainAgg = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      assert(agg.count() == plainAgg.count())
    } finally spark.sql("DROP TABLE IF EXISTS ev_bucketed_agg")
  }
}
