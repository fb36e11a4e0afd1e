package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{JsonKeys, KeyPresence}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module registries; every entry has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible
  * (then the driver records a weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's whole job end-to-end: latest-version spec select →
    * key-presence + value-completeness metrics → 13-column report
    * (`event_verify.py:215-231`), in the scalable single-plan mode.
    */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.eventsReport(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ PipelineQueries.queries ++ LlmQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ PipelineQueries.oracles ++ LlmQueries.oracles
}

/** Core operator queries (SURVEY.md §2 inventory) over the synthetic
  * test corpus, each mirrored by ANSI SQL for the DuckDB oracle.
  */
object CoreQueries {

  /** q01 — S1/P1/F2/F3/A1/A2/J1/O1: per-event key presence vs totals.
    *
    * `array_distinct` matches the reference's merged-keys dedup
    * (`event_verify.py:85-86`) and pins duplicate-key JSON semantics to the
    * oracle's (DuckDB `json_keys` dedups; Spark `json_object_keys` doesn't).
    */
  def keyPresence(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    KeyPresence.keyCounts(ev, array_distinct(JsonKeys.keysOf(col("props"))), "event_type")
      .select(
        col("event_type"),
        col("exploded_key").as("prop_key"),
        col("key_count"),
        col("total_records"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_key_presence" -> ((s, dir) => keyPresence(s, dir))
  )

  def oracles: Map[String, String] = Map(
    "q01_key_presence" ->
      """WITH keys AS (
        |  SELECT event_type, unnest(json_keys(props)) AS prop_key FROM events
        |), counts AS (
        |  SELECT event_type, prop_key, count(*) AS key_count
        |  FROM keys GROUP BY 1, 2
        |), totals AS (
        |  SELECT event_type, count(*) AS total_records FROM events GROUP BY 1
        |)
        |SELECT counts.event_type, prop_key, key_count, total_records
        |FROM counts JOIN totals USING (event_type)""".stripMargin
  )
}
