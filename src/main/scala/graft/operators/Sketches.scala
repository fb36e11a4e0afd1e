package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built into
  * Spark as `hll_sketch_agg`/`hll_union_agg`): the incremental analogue of
  * an exact `count_distinct` — each ingest batch reduces to one small
  * binary sketch per group, and ANY set of sketches later merges to the
  * estimate of their union, without ever revisiting the raw rows.
  *
  * This is the distinct-count member of the engine's incremental family
  * (exact-dedup fingerprint index, MinHash band index, semantic vector
  * index): at 100 TB you cannot re-scan history to answer "distinct users
  * to date", but you can union a day's sketch into a persisted sketch
  * table — constant bytes per group per day, no shuffle wider than the
  * group count, and the merge is associative so late or replayed days
  * fold in idempotently (HLL register-max is idempotent under re-union of
  * the SAME batch sketch; re-sketching overlapping raw rows is also safe
  * because max absorbs duplicates).
  */
object Sketches {

  /** Reduce a batch to one mergeable sketch row per group: the artifact to
    * persist. `lgK` fixes the sketch's register count (2^lgK) — all
    * sketches that will ever merge must share it (12 ≈ 2.5% rsd, ~4 KB).
    */
  def distinctSketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Merge persisted sketch rows (any number of batches, any order) back
    * to one estimate per group. One shuffle over |groups| × |batches|
    * sketch rows — never the raw data.
    */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("n_distinct_est"))
}
