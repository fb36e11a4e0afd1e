package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Supervised quality classifier — the trained-filter leg of the curation
  * stack (beside the rule filter q74, the LM-perplexity filter q80, and
  * the DSIR importance weights q78). The shape is the public
  * CCNet/fastText pattern (Wenzek et al. 2020; Joulin et al. 2016): a
  * LINEAR model over hashed bag-of-words features, trained on a labeled
  * slice in-engine, then scored corpus-wide as a row-local sparse dot
  * product against a broadcast weight table.
  *
  * Training is full-batch gradient descent on logistic loss for a FIXED
  * epoch count. Each epoch is two corpus passes over the training slice
  * (the q78 recompute-beats-persist convention — grams re-derive exactly,
  * a cache would buy determinism nothing):
  *
  *   1. margins: feature rows ⋈ broadcast weights → per-doc sum;
  *   2. gradient: per-doc residual (σ(margin) − y) ⋈ feature rows →
  *      per-BUCKET sum — at most B+1 rows, a bounded driver collect (the
  *      repo's bounded-metadata convention), from which the next weight
  *      table derives entirely driver-side.
  *
  * The model is never vocabulary-sized: like DSIR's histograms, everything
  * the driver holds or broadcasts is O(B) — that is the method's 100 TB
  * selling point (hash buckets bound the model, not the corpus).
  *
  * Determinism discipline (the q81 `meanPool` integer-millionths pattern,
  * strengthened past q78's DECIMAL sums): weights, margins, residuals and
  * gradients are all BIGINT micro-units, so every cross-row aggregation
  * is EXACT integer arithmetic — association-free on any partitioning,
  * any engine. The link function is the HARD sigmoid
  * `σh(m) = clamp(½ + m/4, 0, 1)` — the standard piecewise-linear
  * logistic stand-in from quantized/binarized training — evaluated
  * entirely in micro-unit integers (`clamp(5·10⁵ + halfUp(mI/4), 0,
  * 10⁶)`), so the fit contains NO transcendental at all. (The first
  * version used `round(10⁶·σ(m))` on a double `exp`; the r15 advisor
  * flagged that JVM `Math.exp` vs DuckDB's libm are only 1-ulp-agreed
  * and the round-after-divide-on-double hazard the meanPool round-13
  * note documents therefore applied per-doc-per-epoch. Replacing the
  * link closes the hazard CLASS instead of probing for it.) All
  * divisions use the half-away-from-zero integer quotient both engines
  * express exactly (`(2|x|+d) div (2d)`, signed — the meanPool tie-exact
  * form). The fixed learning rate 1/2 is FOLDED into the update division
  * (denominator 2N), so no fractional rate ever touches a double.
  *
  * Bias is a synthetic feature: every doc carries one (bucket = −1,
  * cnt = 1) row. That keeps the epoch uniform (one join, one aggregate —
  * no separate bias job) and guarantees every doc, including empty-text
  * ones, survives the margin inner-join.
  */
object Classifier {

  /** Bias pseudo-bucket — one row per doc, cnt 1. */
  val BiasBucket: Long = -1L

  /** Half-away-from-zero rounding of num/den (den > 0) in pure integer
    * arithmetic — the driver-side twin of the SQL
    * `(2·|num| + den) // (2·den)` CASE both engines evaluate exactly.
    */
  private[graft] def halfUpDiv(num: Long, den: Long): Long = {
    require(den > 0, s"halfUpDiv needs a positive denominator, got $den")
    val q = (2L * math.abs(num) + den) / (2L * den)
    if (num < 0) -q else q
  }

  /** Hashed-feature rows for `docs(doc_id, text, ...)`: one (doc_id,
    * bucket, cnt) per distinct token bucket per doc, PLUS the bias row.
    * The bucket hash is the q78 convention (first 6 md5 hex digits as an
    * integer, mod `buckets`) so the DuckDB twin is the same cast chain.
    */
  private[graft] def featureRows(docs: DataFrame, buckets: Int): DataFrame = {
    val grams = docs
      .select(col("doc_id"), explode(TextStats.tokens(col("text"))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long") % buckets)
      .groupBy("doc_id", "bucket").agg(count(lit(1)).as("cnt"))
    grams.unionAll(
      docs.select(col("doc_id"), lit(BiasBucket).as("bucket"),
        lit(1L).as("cnt")))
  }

  /** Hard sigmoid in micro-units over a micro-unit margin column:
    * `clamp(500000 + halfUp(mI/4), 0, 1000000)` — BIGINT in, BIGINT out,
    * the quarter-slope division in the meanPool half-away-from-zero form
    * (`(2|x|+4) div 8`, signed), so both engines evaluate it exactly.
    * σh(0) = ½ exactly, like the logistic it replaces.
    */
  private[graft] def hardSigmoidI(mI: Column): Column = {
    // (2|mI|+4) is non-negative, so >>3 IS the floor quotient by 8 —
    // a pure integral op (Column has no integer-div method; a double
    // round-trip here would reintroduce the hazard this removes).
    val q = shiftright(lit(2L) * abs(mI) + lit(4L), 3)
    greatest(lit(0L), least(lit(1000000L),
      lit(500000L) + when(mI < 0L, -q).otherwise(q)))
  }

  /** The per-doc margin in micro-units: feature rows ⋈ broadcast weight
    * table (B+1 rows — every bucket present, so the inner join drops
    * nothing), summed exactly in BIGINT. `private[graft]` so the plan
    * audit can inspect a single EPOCH's plan (r15 advice #3), not just
    * the final scoring pass.
    */
  private[graft] def margins(feats: DataFrame, wTable: DataFrame): DataFrame =
    feats.join(broadcast(wTable), "bucket")
      .groupBy("doc_id").agg(sum(col("wI") * col("cnt")).as("mI"))

  /** Fit `epochs` full-batch logistic-regression epochs on the
    * `isTrain` slice of `docs`, labels from `isTarget`. Returns the
    * final weight vector as (bucket → micro-unit weight), all B+1
    * buckets present ([[BiasBucket]] included).
    */
  def fitWeights(docs: DataFrame, isTarget: Column, isTrain: Column,
      buckets: Int, epochs: Int): Map[Long, Long] = {
    require(epochs >= 1, "fitWeights needs at least one epoch")
    val spark = docs.sparkSession
    val train = docs.filter(isTrain)
      .select(col("doc_id"), isTarget.cast("boolean").as("y"), col("text"))
    val nTrain = train.count()
    require(nTrain > 0, "classifier training slice is empty")
    val feats = featureRows(train, buckets)

    var w: Map[Long, Long] =
      ((BiasBucket until buckets.toLong).map(_ -> 0L)).toMap
    (1 to epochs).foreach { _ =>
      val wTable = weightTable(spark, w)
      // residual in micro-units: σh(m)·10⁶ − y·10⁶, hard sigmoid in pure
      // BIGINT (clamped ½ + m/4, halfUp quarter) — no double anywhere.
      val resid = margins(feats, wTable)
        .join(train.select("doc_id", "y"), "doc_id")
        .select(col("doc_id"),
          (hardSigmoidI(col("mI"))
            - when(col("y"), lit(1000000L)).otherwise(lit(0L))).as("rI"))
      // ≤ B+1 rows — bounded in the bucket count, never in corpus size
      val grad = feats.join(resid, "doc_id")
        .groupBy("bucket").agg(sum(col("rI") * col("cnt")).as("gI"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      w = w.map { case (b, wi) =>
        b -> (wi - halfUpDiv(grad.getOrElse(b, 0L), 2L * nTrain))
      }
    }
    w
  }

  private[graft] def weightTable(
      spark: org.apache.spark.sql.SparkSession, w: Map[Long, Long]): DataFrame = {
    val rows = w.toSeq.sortBy(_._1)
      .map { case (b, wi) => org.apache.spark.sql.Row(b, wi) }
    spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("bucket", LongType, nullable = false),
        StructField("wI", LongType, nullable = false))))
  }

  /** Train on the `isTrain` slice, score EVERY doc. Output one row per
    * doc: (doc_id, is_target, is_train, n_feats, score, keep) — score is
    * the raw margin (log-odds) in units, keep the margin>0 cut (p>½).
    * The scoring pass is one feature scan ⋈ broadcast weights — the
    * corpus-wide filter is row-local, no shuffle beyond the per-doc sum.
    */
  def trainScore(docs: DataFrame, isTarget: Column, isTrain: Column,
      buckets: Int, epochs: Int): DataFrame = {
    val spark = docs.sparkSession
    val w = fitWeights(docs, isTarget, isTrain, buckets, epochs)
    val base = docs.select(col("doc_id"),
      isTarget.cast("boolean").as("is_target"),
      isTrain.as("is_train"), col("text"))
    val scored = margins(featureRows(base, buckets), weightTable(spark, w))
    base.join(scored, "doc_id")
      .select(col("doc_id"), col("is_target"), col("is_train"),
        size(TextStats.tokens(col("text"))).cast("bigint").as("n_feats"),
        (col("mI").cast("double") / lit(1000000.0)).as("score"),
        (col("mI") > 0L).as("keep"))
  }
}
