package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join without a nested-loop plan.
  *
  * Spark has no range-join strategy: `points JOIN intervals ON x BETWEEN
  * lo AND hi` has no equi-key, so Catalyst plans a
  * BroadcastNestedLoopJoin (or a cartesian product) — O(|P|·|I|)
  * comparisons however sparse the true matches are, and a broadcast-sized
  * ceiling on one input. This operator manufactures the equi-key: the
  * number line splits into fixed-width bins, each interval replicates onto
  * every bin it overlaps, each point maps to the ONE bin containing it,
  * and the join becomes a hash/sort-merge equi-join on the bin id with the
  * exact `BETWEEN` re-checked as a residual predicate. The standard
  * binned-range-join layout (Flink's interval join and the range-join bin
  * optimization in several SQL engines use the same decomposition; public
  * knowledge).
  *
  * Every matching pair appears EXACTLY once — the pair meets only in the
  * point's bin: an interval containing x necessarily overlaps x's bin, and
  * a point joins in one bin only, so no post-dedup is needed.
  *
  * Scale shape: work per bin is |points in bin| × |intervals overlapping
  * bin|, shuffled on the bin id across the cluster. `binWidth` is the
  * knob: smaller bins cut the per-bin product (fewer false same-bin
  * pairs), wider bins cut interval replication (an interval emits
  * span/binWidth + 1 rows). Set it near the TYPICAL interval span, so
  * replication stays O(1) per interval while a bin's population stays a
  * density, not a table. Truncating integer division keys the bins, which
  * is monotone also for NEGATIVE values (x <= y implies x DIV w <= y DIV
  * w), so lo <= x <= hi always lands x's bin inside the interval's bin
  * range — pre-epoch timestamps are safe.
  *
  * Semantics (matches SQL `BETWEEN` under an inner join): intervals with
  * `lo > hi` or a null bound match nothing and are dropped; a null point
  * value matches nothing. Both inputs' columns pass through — their names
  * must be disjoint (required, so the output is unambiguous without
  * qualifier gymnastics). Bound columns must be integral (the bin id is
  * exact integer arithmetic; floating bounds would bin inconsistently at
  * the precision edge).
  *
  * Replication guard: an interval spanning `s` bins explodes into `s`
  * rows, and ONE hostile interval — an open-ended sentinel like
  * `hi = Long.MaxValue` — would otherwise attempt a multi-billion-element
  * `sequence()` array on an executor (fails ugly at best, crawls at
  * worst). Intervals spanning more than `maxBinsPerInterval` bins are
  * therefore EXCLUDED from the join, exactly the rows
  * [[oversizedIntervals]] returns — audit/count that frame when the drop
  * matters, route such intervals to a broadcast nested-loop join, or
  * widen `binWidth`. The default cap (2^16 bins) is ~4 decimal orders
  * above a well-chosen `binWidth ≈ typical span` while keeping the worst
  * single-interval array at 64k elements. The span arithmetic itself is
  * overflow-proof (`try_subtract`: a span wider than Long.MaxValue folds
  * to null, which the cap filter drops rather than wrapping around).
  */
object RangeJoin {

  /** Bins an interval spans, minus one: `hi DIV w - lo DIV w`, null on
    * long overflow (only reachable when lo and hi straddle ±2^62-ish).
    */
  private def spanBins(loCol: String, hiCol: String, binWidth: Long) =
    expr(s"try_subtract(CAST(`$hiCol` AS BIGINT) DIV $binWidth, " +
      s"CAST(`$loCol` AS BIGINT) DIV $binWidth)")

  val DefaultMaxBinsPerInterval: Long = 1L << 16

  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long,
      maxBinsPerInterval: Long = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty,
      s"point/interval column names must be disjoint, shared: ${dup.mkString(", ")}")
    val span = spanBins(loCol, hiCol, binWidth)
    val p = points.withColumn("__p_bin",
      expr(s"CAST(`$pointCol` AS BIGINT) DIV $binWidth"))
    val i = intervals
      .filter(col(loCol) <= col(hiCol)) // also drops null bounds
      .filter(span.isNotNull && span < lit(maxBinsPerInterval))
      .withColumn("__i_bin", explode(expr(
        s"sequence(CAST(`$loCol` AS BIGINT) DIV $binWidth, " +
          s"CAST(`$hiCol` AS BIGINT) DIV $binWidth)")))
    p.join(i,
        p("__p_bin") === i("__i_bin") &&
          col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__p_bin", "__i_bin")
  }

  /** The intervals [[pointInInterval]] excludes under the same cap: valid
    * bounds (`lo <= hi`, non-null) but a bin span of `maxBinsPerInterval`
    * or more. Built from the IDENTICAL predicate, so `join output ∪
    * (points × these)` is by construction the uncapped answer — count
    * this frame for the observable drop tally, or feed it to a fallback
    * nested-loop join when the oversized tail must still match.
    */
  def oversizedIntervals(
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long,
      maxBinsPerInterval: Long = DefaultMaxBinsPerInterval): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val span = spanBins(loCol, hiCol, binWidth)
    intervals
      .filter(col(loCol) <= col(hiCol))
      .filter(span.isNull || span >= lit(maxBinsPerInterval))
  }
}
