package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** S1 scale path: reading the partitioned ROOT with discovery must let
  * Catalyst prune partitions from a filter — the plan-time equivalent of
  * the reference's path-construction pruning (`event_verify.py:21`).
  */
class PartitionPruningSpec extends SparkTestBase {
  import spark.implicits._

  test("filter on a discovered partition column prunes at plan time") {
    val base = Files.createTempDirectory("graft-part").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$base/process_date=2024-06-01/event_date=2024-06-01")
    Seq((3L, "c")).toDF("id", "v")
      .write.parquet(s"$base/process_date=2024-06-02/event_date=2024-06-02")

    val pruned = Tables.partitionedRoot(spark, base)
      .filter(col("process_date") === "2024-06-01")
    assert(pruned.count() == 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("process_date"),
      s"partition filter must reach the scan node:\n${scan.take(800)}")

    // path-parameterized variant (the reference's exact shape) reads only
    // the one directory
    val direct = Tables.partitioned(spark, base,
      "process_date" -> "2024-06-01", "event_date" -> "2024-06-01")
    assert(direct.count() == 2)
  }
}
