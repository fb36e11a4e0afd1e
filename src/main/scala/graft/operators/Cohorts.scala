package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event stream —
  * the two classic product-analytics reductions of the reference's event
  * table (`event_verify.py` reads the same per-event shape; these are the
  * aggregate views a verification job's consumers build next).
  *
  * Both operators reduce an unbounded event table to a bounded summary
  * (stage counts; cohort×offset cells), so the 100 TB story is the input
  * scan: one user-key shuffle carries all per-user sequencing, and every
  * aggregate after it is partial-aggregated or tiny.
  */
object Cohorts {

  /** Strictly-ordered funnel: for each user, stage i counts only when some
    * event of stage i's type happens STRICTLY AFTER the user's stage i−1
    * time (the standard ordered-funnel semantics — re-orderings don't
    * count, same-timestamp ties don't count). Returns ONE row: per stage a
    * `n_<stage>` user count, and for each post-anchor stage a
    * `conv_<stage>` ratio vs the anchor stage (rounded to 6, the repo
    * rule — exact-integer inputs make the double division deterministic).
    *
    * Implementation is windows, not joins: stage times chain as
    * `min(when(type = stage AND t > prev_stage_t, t)) over (partition by
    * user)` — unordered full-partition frames, so all stages ride ONE
    * user-key exchange with zero sorts (audited), where the textbook
    * self-join-per-stage form shuffles the event table once per stage.
    * The per-user reduction then reuses that partitioning (no second
    * exchange), and the final global aggregate moves one row per task.
    *
    * At 100 TB: the one shuffle carries (user, type, time) only — project
    * before calling; per-user window state is the full user history, which
    * is the operator's real bound (users are humans; billions of rows per
    * user key means upstream sessionization first).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct == stages, "funnel stages must be distinct")
    val w = Window.partitionBy(userCol)
    val staged = stages.zipWithIndex.foldLeft(
      events.select(col(userCol), col(typeCol), col(timeCol))) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col(typeCol) === stage
          else col(typeCol) === stage && col(timeCol) > col(s"__t${i - 1}")
        df.withColumn(s"__t$i", min(when(cond, col(timeCol))).over(w))
    }
    val perUser = staged
      .groupBy(col(userCol))
      .agg(min(s"__t0").as("__t0"),
        stages.indices.drop(1).map(i => min(s"__t$i").as(s"__t$i")): _*)
    val counts = perUser.agg(
      count(col("__t0")).as(s"n_${stages.head}"),
      stages.indices.drop(1).map(i => count(col(s"__t$i")).as(s"n_${stages(i)}")): _*)
    stages.drop(1).foldLeft(counts) { (df, stage) =>
      df.withColumn(s"conv_$stage",
        round(col(s"n_$stage").cast("double") / col(s"n_${stages.head}"), 6))
    }
  }

  /** Event-type transition matrix (first-order Markov view of user
    * behavior): for each ordered per-user event pair, count (from_type →
    * to_type) occurrences and the transition probability among all
    * transitions leaving `from_type`. Each user's LAST event has no
    * successor and drops; ties order on `tieCol` (the q55 convention —
    * same-timestamp events need a total order for `lead` to be
    * deterministic).
    *
    * One user-key exchange feeds the `lead` window; the pair counts then
    * partial-aggregate map-side before their (from, to) shuffle — at most
    * |types|² rows move. The probability denominator is a window sum OVER
    * THE AGGREGATED MATRIX (|types|² rows), so normalization costs nothing
    * at any corpus size. Counts are exact integers; the one division
    * rounds to 6 (the repo determinism rule).
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      timeCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(timeCol), col(tieCol))
    events
      .select(col(userCol), col(typeCol), col(timeCol), col(tieCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") /
        sum("n").over(Window.partitionBy("from_type")), 6))
  }

  /** Cohort retention: bucket event time into fixed `periodUs` periods,
    * cohort each user by their FIRST period, and count distinct users per
    * (cohort_period, period_offset) cell — the retention matrix, in
    * period-number form (callers multiply back by `periodUs` for
    * timestamps; keeping integers keeps the oracle exact).
    *
    * One user-key exchange feeds the cohort window (unordered min frame,
    * no sort); the distinct count then aggregates on the (cohort, offset,
    * user) triple map-side before its cell-key shuffle — Spark's standard
    * two-phase distinct — so the second shuffle carries at most one row
    * per (cell, user). At 100 TB the exact distinct is the knob: swap
    * `count_distinct` for `approx_count_distinct` with an error budget and
    * the plan loses the expand phase; the cell grid itself is bounded by
    * (periods × offsets), never data volume.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      timeCol: String,
      periodUs: Long): DataFrame = {
    require(periodUs > 0, "periodUs must be positive")
    val w = Window.partitionBy(userCol)
    // FLOOR division, not `div`: `div` truncates toward zero, so a
    // pre-epoch timestamp of -1 µs would land in period 0 with its
    // positive neighbors while DuckDB's `//` (floor) puts it in -1 —
    // `(t - pmod(t, p)) div p` is exact floor for any long, matching the
    // oracle's `//` on negative time values too. (pmod is non-negative,
    // so the numerator is always an exact multiple of p.)
    events
      .select(col(userCol), expr(
        s"(($timeCol) - pmod($timeCol, ${periodUs}L)) div ${periodUs}L")
        .as("period"))
      .withColumn("cohort_period", min("period").over(w))
      .groupBy(col("cohort_period"),
        (col("period") - col("cohort_period")).as("period_offset"))
      .agg(count_distinct(col(userCol)).as("n_users"))
  }
}
