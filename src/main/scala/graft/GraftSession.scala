package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that knows what a graft
  * session must carry. A user switching from the reference job builds their
  * session here and every native function (`cosine_sim`, `word_hits`,
  * `minhash_sigs`, `json_shred`) and engine convention (UTC, nanos-as-long
  * parquet timestamps) is in force; Bench and Verify build theirs the same
  * way, so the measured configuration IS the shipped configuration.
  */
object GraftSession {

  /** Configuration the engine requires for correctness. */
  val required: Map[String, String] = Map(
    // native Catalyst expressions register through the extension
    "spark.sql.extensions" -> "graft.GraftExtensions",
    // all oracle comparisons and window arithmetic assume UTC
    "spark.sql.session.timeZone" -> "UTC",
    // the corpus parquet carries TIMESTAMP(NANOS); read as long ns
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Scale defaults for cluster runs, set explicitly rather than relied on:
    * AQE re-plans at runtime (partition coalescing after filters, skew-join
    * splitting under hot keys) — at 100 TB that beats any static tuning of
    * `spark.sql.shuffle.partitions`.
    */
  val scaleDefaults: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true")

  /** A builder carrying [[required]] + [[scaleDefaults]]; callers add
    * master/app/site config and `getOrCreate()`.
    */
  def builder(): SparkSession.Builder =
    (required ++ scaleDefaults).foldLeft(SparkSession.builder()) {
      case (b, (k, v)) => b.config(k, v)
    }

  /** Local session shaped like the driver harness: `local[cores]` with
    * shuffle partitions = cores (not Spark's 200 default — at local scale
    * the empty-partition scheduling overhead dominates; see BASELINE.md).
    */
  def local(cores: Int, ui: Boolean = false): SparkSession =
    builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", ui.toString)
      .getOrCreate()
}
