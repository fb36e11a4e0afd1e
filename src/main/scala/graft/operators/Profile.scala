package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic table profiling — the reference's per-property completeness idea
  * (`event_verify.py:186-208`) generalized to ANY table: per column, the
  * row total, non-null count, null percentage, and distinct-value count.
  *
  * Shape: one dynamic `stack` unpivot (V1, the same machinery as
  * [[Completeness.unpivot]]) to (col_name, value) rows, then ONE shuffle
  * keyed on col_name with partial aggregation. Values are compared as
  * strings only INSIDE count/count-distinct — the cast is injective per
  * column, so engine-specific number formatting can never reach the
  * output. At 100 TB: the unpivot multiplies rows ×|cols| but stays
  * map-side; the shuffle carries |cols| × |distinct values| after partial
  * aggregation, and a skewed column (few distinct values) partial-counts
  * before it moves.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    // Column-based unpivot (explode of an array of (col_name, value)
    // structs, same generator altitude as stack): column names are passed
    // as values, never interpolated into SQL text, so a name containing a
    // backtick or quote profiles fine instead of producing malformed SQL.
    val kvs = array(cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("`" + c.replace("`", "``") + "`").cast("string").as("value"))
    }: _*)
    df.select(explode(kvs).as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.value").as("value"))
      .groupBy("col_name")
      .agg(
        count(lit(1)).as("total"),
        count(col("value")).as("non_null"),
        count_distinct(col("value")).as("n_distinct"))
      .withColumn("null_pct",
        (col("total") - col("non_null")) * 100.0 / col("total"))
  }

  /** Fixed-width histogram of a numeric column — the distribution view
    * next to [[profile]]'s counts and the q36 quantiles: bucket
    * `floor(value / width)`, plus its inclusive lower bound and the row
    * count. Empty buckets are absent (a dense grid would join a generated
    * series, the q39 gap-fill shape, when a consumer needs it).
    *
    * `floor` of an IEEE division is a per-row scalar both engines compute
    * identically, so the doubles are oracle-safe (the q36 argument — no
    * aggregation-order dependence). One shuffle on the bucket key, counts
    * partial-aggregate map-side; output is |buckets| rows, bounded by the
    * value range, never data volume. Nulls drop (no bucket).
    */
  /** Per-group winsorization: clip a numeric column to its group's
    * [pLo, pHi] exact interpolated percentiles — the outlier-taming
    * transform (fat-finger prices, runaway quality scores) that profiling
    * and quantiles feed. Output: the input columns plus `clipped`.
    *
    * The corpus-statistic-filter pattern as a TRANSFORM: one corpus
    * shuffle computes the |groups|-row bounds table, which then broadcasts
    * back onto the corpus (never a second corpus-wide shuffle — audited).
    * `least`/`greatest` over doubles are per-row order statements, and the
    * interpolated percentile is oracle-safe (the q36 argument), so the
    * result is bit-deterministic. Percentile memory is O(distinct values
    * per group) — at unbounded cardinality the documented switch is
    * `approx_percentile`, same plan shape.
    */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo <= pHi && pHi <= 1, "need 0 <= pLo <= pHi <= 1")
    val bounds = df.groupBy(col(groupCol)).agg(
      percentile(col(valueCol), lit(pLo)).as("__lo"),
      percentile(col(valueCol), lit(pHi)).as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .withColumn("clipped",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  def histogram(df: DataFrame, valueCol: String, width: Double): DataFrame = {
    require(width > 0, "width must be positive")
    df.select(floor(col(valueCol) / width).cast("long").as("bucket"))
      .filter(col("bucket").isNotNull)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", (col("bucket") * width).cast("double"))
      .select("bucket", "lo", "n")
  }
}
