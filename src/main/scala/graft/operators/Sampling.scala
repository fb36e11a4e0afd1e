package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — the operators behind
  * repeatable subset selection and per-source mixing ratios.
  *
  * `rand()`-based sampling is nondeterministic across retries and engines;
  * everything here keys on the md5 of a stable id instead: uniform, stable
  * under task retry (a 100 TB requirement — a recomputed partition must
  * re-select the SAME rows), and reproducible by any engine with md5.
  *
  * Both operators are narrow until the stated shuffle: [[sampleByHash]] is
  * a pure filter (no shuffle at all); [[stratifiedQuota]] shuffles once on
  * the stratum key for its rank window, which Spark lowers to a
  * WindowGroupLimit (bounded per-group state, no full sort of the corpus —
  * pinned by `PlanAuditSpec`).
  */
object Sampling {

  /** First-8-hex-digits threshold for a sampling `rate` in [0, 1]: md5 is
    * uniform over hex strings, so `md5 prefix < hex(rate · 16^8)` selects
    * ~rate of rows via pure ASCII string comparison — identical in every
    * engine, no float arithmetic anywhere.
    */
  def rateThresholdHex(rate: Double): String = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val bound = math.floor(rate * 4294967296.0).toLong.min(4294967295L)
    f"$bound%08x"
  }

  /** Deterministic Bernoulli-style sample: keep rows whose md5(key) prefix
    * falls under the rate threshold. A pure filter — pushes down, never
    * shuffles, retry-stable. rate = 1.0 is an exact no-op (the threshold
    * comparison is strict, so it must not be used at full rate: a prefix of
    * exactly "ffffffff" — 1 row in 2^32, real at 100 TB — would drop).
    */
  def sampleByHash(df: DataFrame, keyCol: Column, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    if (rate == 1.0) df
    else df.filter(
      substring(md5(keyCol.cast("string")), 1, 8) < lit(rateThresholdHex(rate)))
  }

  /** Per-stratum quota (data mixing): keep at most `quota` rows per value
    * of `stratumCol`, chosen in md5(key) order (ties on the key itself) —
    * i.e. a deterministic uniform draw of fixed size per stratum, the
    * mixing-ratio primitive for curation pipelines.
    */
  def stratifiedQuota(
      df: DataFrame, stratumCol: Column, keyCol: Column, quota: Int): DataFrame = {
    val w = Window.partitionBy(stratumCol)
      .orderBy(md5(keyCol.cast("string")), keyCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Per-group cap in an EXPLICIT preference order — [[stratifiedQuota]]'s
    * ranked sibling: keep at most `cap` rows per value of `groupCol`,
    * choosing the TOP rows by `orderCols` (e.g. quality desc). The
    * per-source/per-domain cap every web-scale curation pipeline applies —
    * one spammy domain must not dominate the corpus — where the keeps
    * should be the BEST documents, not a uniform draw.
    *
    * Determinism contract: `orderCols` must end in a unique tiebreak key
    * (id asc) or retries and engines may keep different rows at the cap
    * boundary. Same plan shape as [[stratifiedQuota]]: one shuffle on the
    * group key, `row_number` lowered to WindowGroupLimit — bounded
    * per-group state, never a full sort of the corpus.
    */
  def rankedQuota(
      df: DataFrame, groupCol: Column, cap: Int, orderCols: Column*): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val w = Window.partitionBy(groupCol).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Deterministic two-way split label over a unit key — the train/holdout
    * assignment column. Same md5-prefix threshold as [[sampleByHash]], so
    * the label is retry-stable, engine-portable, and a pure projection (no
    * shuffle, no state).
    *
    * The KEY CHOICE is the leakage contract: splitting on doc_id leaks
    * near-duplicates across the boundary (a train doc's near-twin lands in
    * val and inflates eval), so callers splitting a deduped corpus must
    * pass the dedup CLUSTER id — every member of a cluster hashes
    * identically and lands on the same side.
    */
  def hashSplit(
      keyCol: Column, trainRate: Double,
      trainLabel: String = "train", holdoutLabel: String = "val"): Column = {
    require(trainRate > 0 && trainRate < 1,
      s"trainRate must be in (0,1), got $trainRate")
    when(substring(md5(keyCol.cast("string")), 1, 8)
        < lit(rateThresholdHex(trainRate)), trainLabel)
      .otherwise(holdoutLabel)
  }

  /** Temperature-based group rebalancing at α = 0.5 (exponentiated
    * smoothing, the multilingual-corpus mixing technique): the expected
    * kept count per group is ∝ n_g^α, so high-resource groups are
    * downsampled toward the small ones without ever upsampling. The keep
    * rate is anchored at the SMALLEST group (rate = (n_min/n_g)^α — the
    * smallest group keeps everything), and each row's keep decision is the
    * [[sampleByHash]] md5-prefix draw at its group's rate.
    *
    * α is hard-wired to 0.5 because sqrt is CORRECTLY ROUNDED under IEEE
    * 754 — identical in every engine — while pow(x, 0.3) is libm-dependent
    * and can differ in the last ulp between JVM and C engines, flipping
    * boundary rows. rate is rounded to 6 decimals before the threshold is
    * derived, in both engines, for the same reason. No cross-group float
    * SUM appears anywhere (summation order differs across engines), which
    * is why the anchor is min-count, not a normalizing constant.
    *
    * Scale shape: one partial-aggregated shuffle builds the |groups|-row
    * count table; the min anchors it; the tiny rate table BROADCASTS back
    * onto the corpus where the keep decision is a map-side string compare.
    * The corpus itself is never shuffled.
    */
  def temperatureSample(
      df: DataFrame, groupCol: Column, keyCol: Column): DataFrame = {
    val counts = df.groupBy(groupCol.as("__grp")).agg(count(lit(1)).as("__n"))
    // min anchor via a global window over the |groups|-row count table —
    // its SinglePartition pass is over groups, not rows, and it avoids the
    // cross join the registry-wide plan audit bans (Catalyst folds any
    // constant-key equi-join back into a nested-loop join)
    val anchored = counts.withColumn("__n_min",
      min("__n").over(Window.partitionBy()))
    val rates = anchored
      .select(col("__grp"),
        round(sqrt(col("__n_min").cast("double") / col("__n")), 6).as("rate"))
    val threshold = format_string("%08x",
      least(floor(col("rate") * lit(4294967296.0)).cast("long"),
        lit(4294967295L)))
    df.join(broadcast(rates), groupCol === col("__grp"))
      .filter(col("rate") >= 1.0 ||
        substring(md5(keyCol.cast("string")), 1, 8) < threshold)
      .drop("__grp")
  }
}
