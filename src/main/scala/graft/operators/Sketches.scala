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

  // ---- Count-Min frequency sketches ------------------------------------

  /** Reduce a batch to one mergeable Count-Min frequency sketch per
    * group (Spark's own `count_min_sketch` aggregate — SPARK-18120): the
    * frequency member of the sketch family, next to HLL's distinct
    * counts. A CMS answers "how often did THIS value occur" for any
    * value, after the fact, in `depth × width × 8` bytes regardless of
    * cardinality — estimates never under-count, and over-count by at
    * most `eps × N` with probability `confidence`.
    *
    * Same lifecycle as [[distinctSketch]]: persist the per-batch rows;
    * sketches built with the SAME (eps, confidence, seed) merge by
    * cell-wise table addition ([[mergeFreqSketches]]), which is EXACT —
    * a merged sketch is bit-identical to one built over the union in one
    * pass, so replayed batches are the only merge hazard (CMS addition,
    * unlike HLL register-max, double-counts a re-merged batch; dedup
    * batch ids upstream, the [[graft.streaming.StreamingDistinct]]
    * convention records which batches landed).
    *
    * For EXACT frequent items use [[graft.operators.HeavyHitters]] (two
    * bounded passes); the CMS is the one-pass streaming complement for
    * when the raw rows are gone by query time.
    */
  def freqSketch(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      eps: Double = 0.0001, confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count_min_sketch(col(valueCol), lit(eps), lit(confidence), lit(seed))
        .as("cms"))

  /** Driver-side merge of serialized CMS rows (bounded: this merges
    * per-group batch rows, never data rows — but note a CMS row is
    * `ceil(2/eps) × depth × 8` bytes, ~1 MB at the 1e-4 default, NOT the
    * HLL's 4 KB; long-running sketch tables need periodic compaction,
    * see [[graft.streaming.StreamingHeavyHitters.compact]]). All inputs
    * must share (eps, confidence, seed) — Spark throws
    * `IncompatibleMergeException` otherwise, loudly.
    */
  def mergeFreqSketches(
      rows: Seq[Array[Byte]]): org.apache.spark.util.sketch.CountMinSketch = {
    require(rows.nonEmpty, "no sketches to merge")
    rows.map(b => org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce(_ mergeInPlace _)
  }
}
