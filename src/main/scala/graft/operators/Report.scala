package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Final report assembly — J2/J3 joins, derived key-null metrics, metadata
  * stamps, and null fill (`event_verify.py:120-129,215-222`).
  */
object Report {

  /** The 13-column output contract (`event_verify.py:215-222`). */
  val outputColumns: Seq[String] = Seq(
    "prop_name", "event_name", "value_null_count", "value_not_null_count",
    "value_null_count_percentage", "keys_not_null_count", "total_records",
    "key_null_count", "key_null_count_percentage", "release_date", "channel",
    "version", "event_date")

  /** J2 — defined pairs LEFT JOIN observed key counts
    * (`event_verify.py:120-129`). `specPairs` carries
    * (joinCols…, prop_name); `keyCounts` carries
    * (joinCols…, exploded_key, key_count). Undefined-but-observed keys drop;
    * defined-but-unobserved pairs keep a null count. The stream side of the
    * left-outer join must be the spec pairs (Spark can't broadcast the
    * preserved side), so the post-aggregation key counts — small by
    * construction: distinct (channel, event, key) — are the broadcast build
    * side.
    */
  def keyMetrics(specPairs: DataFrame, keyCounts: DataFrame, joinCols: Seq[String]): DataFrame = {
    val cond = joinCols
      .map(c => specPairs(c) === keyCounts(c))
      .foldLeft(specPairs("prop_name") === keyCounts("exploded_key"))(_ && _)
    specPairs
      .join(broadcast(keyCounts), cond, "left")
      .select(
        joinCols.map(specPairs(_)) ++ Seq(
          specPairs("prop_name"),
          keyCounts("key_count").as("keys_not_null_count")): _*)
  }

  /** J3 + derived columns + stamps + fill (`event_verify.py:215-222`).
    *
    * Order is load-bearing (SURVEY §2.11, round-2 analysis): the derived
    * `key_null_count`/`key_null_count_percentage` are computed while
    * `keys_not_null_count` may still be NULL (a defined property never
    * observed as a key), so they are NULL too — and only then does
    * `na.fill(0)` zero all three. `total_records - 0` is NOT what the
    * reference produces for those rows; `0` is.
    */
  def assemble(
      valueMetrics: DataFrame,
      keyMetrics: DataFrame,
      joinCols: Seq[String],
      channelCol: Column,
      versionCol: Column,
      processDate: String,
      eventDate: String): DataFrame = {
    valueMetrics
      .join(broadcast(keyMetrics), joinCols :+ "prop_name", "left")
      .withColumn("key_null_count", col("total_records") - col("keys_not_null_count"))
      .withColumn(
        "key_null_count_percentage",
        col("key_null_count") * 100 / col("total_records"))
      .withColumn("release_date", lit(processDate))
      .withColumn("channel", channelCol)
      .withColumn("version", versionCol)
      .withColumn("event_date", lit(eventDate))
      .select(outputColumns.map(col): _*)
      .na.fill(0)
  }

  /** U2/U3 — union-reduce of per-event / per-channel frames
    * (`event_verify.py:212-214,227-229`). `unionByName` (the reference's
    * positional `union` is safe only because every frame shares one select
    * shape); caller beware logical-plan blowup for large `dfs` — the
    * scalable pipeline mode replaces this with grouping columns.
    */
  def unionAll(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "unionAll of zero frames")
    dfs.reduce(_ unionByName _)
  }
}
