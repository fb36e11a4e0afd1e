package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** [[Classifier]] — the hashed-feature linear quality filter
  * (CCNet/fastText shape; integer hard-sigmoid link since r16, so the
  * whole fit is BIGINT-exact). The gradient arithmetic is pinned on a
  * corpus small enough to fold by eye; the LEARNING property (a separable
  * corpus separates, with the discriminative buckets signed correctly,
  * including on held-out docs) is asserted directly, since that is what
  * a trained filter is for.
  */
class ClassifierSpec extends SparkTestBase {
  import spark.implicits._

  private val B = 64

  /** Two clean classes: target docs say "alpha", raw docs say "beta",
    * plus a shared filler token so the model has to discriminate, not
    * memorize doc length. */
  private def separable() = Seq(
    (0L, "alpha alpha filler", true),
    (1L, "alpha filler filler", true),
    (2L, "alpha alpha alpha", true),
    (3L, "beta beta filler", false),
    (4L, "beta filler filler", false),
    (5L, "beta beta beta", false)
  ).toDF("doc_id", "text", "y")

  private def bucketOf(tok: String): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(tok).substring(0, 6),
      16) % B

  test("separable corpus separates: every doc classified correctly") {
    val df = separable()
    val out = Classifier.trainScore(df, col("y"), lit(true), B, 2)
      .select("doc_id", "is_target", "keep", "score")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getDouble(3))).sortBy(_._1)
    assert(out.length === 6)
    out.foreach { case (id, y, keep, score) =>
      assert(keep === y, s"doc $id misclassified (score=$score)")
      assert((score > 0) === y)
    }
  }

  test("discriminative buckets carry the right sign; filler stays smaller") {
    // alpha and beta must not collide for the sign assertion to mean
    // anything — pinned here so a future hash change fails loudly.
    assert(bucketOf("alpha") !== bucketOf("beta"))
    val w = Classifier.fitWeights(separable(), col("y"), lit(true), B, 2)
    val wa = w(bucketOf("alpha"))
    val wb = w(bucketOf("beta"))
    assert(wa > 0L, s"target-only token weight should be positive, got $wa")
    assert(wb < 0L, s"raw-only token weight should be negative, got $wb")
    // The shared filler appears equally in both classes on a balanced
    // corpus — its weight must sit strictly between the class markers.
    val wf = w(bucketOf("filler"))
    assert(math.abs(wf) < math.abs(wa) && math.abs(wf) < math.abs(wb))
  }

  test("epoch-1 arithmetic, folded by eye on one doc per class") {
    // One train doc per class, one token each, no collisions. Epoch 1:
    // margins 0 -> p = 1/2 exactly -> rI = +-500000. Gradient for the
    // target token's bucket: -500000 * 1 (cnt); N = 2, update =
    // -halfUp(-500000 / 4) = +125000. Bias: rI sum = 0 -> stays 0.
    val df = Seq((0L, "alpha", true), (1L, "beta", false))
      .toDF("doc_id", "text", "y")
    val w = Classifier.fitWeights(df, col("y"), lit(true), B, 1)
    assert(w(bucketOf("alpha")) === 125000L)
    assert(w(bucketOf("beta")) === -125000L)
    assert(w(Classifier.BiasBucket) === 0L)
    // Every untouched bucket stays exactly zero.
    assert(w.count(_._2 != 0L) === 2)
  }

  test("empty-text doc survives scoring with bias-only margin") {
    val df = Seq((0L, "alpha", true), (1L, "beta", false), (2L, "", false))
      .toDF("doc_id", "text", "y")
    val out = Classifier.trainScore(df, col("y"), col("doc_id") < 2, B, 2)
      .filter(col("doc_id") === 2L).collect()
    assert(out.length === 1, "empty doc must not vanish from the output")
    assert(out.head.getAs[Long]("n_feats") === 0L)
    // Balanced training classes keep the bias at 0 -> empty doc scores 0.
    assert(out.head.getAs[Double]("score") === 0.0)
    assert(!out.head.getAs[Boolean]("keep"))
  }

  test("score is the exact micro-unit margin (train/score split honored)") {
    // Score docs OUTSIDE the train slice: doc 2 repeats the target token
    // 3 times, so its margin is exactly 3x the learned alpha weight.
    val df = Seq((0L, "alpha", true), (1L, "beta", false),
      (2L, "alpha alpha alpha", true)).toDF("doc_id", "text", "y")
    val w = Classifier.fitWeights(df, col("y"), col("doc_id") < 2, B, 2)
    val out = Classifier.trainScore(df, col("y"), col("doc_id") < 2, B, 2)
      .filter(col("doc_id") === 2L).collect().head
    val expected =
      (3L * w(bucketOf("alpha")) + w(Classifier.BiasBucket)).toDouble / 1e6
    assert(out.getAs[Double]("score") === expected)
    assert(!out.getAs[Boolean]("is_train"))
  }

  test("fitWeights is partitioning-independent — the BIGINT-exact claim") {
    // Every cross-row aggregation in the fit is an exact integer sum, so
    // the learned weights must be bit-identical on any partitioning (the
    // meanPool order-stability property, asserted on the gradient loop).
    val df = separable()
    val w1 = Classifier.fitWeights(df.repartition(1), col("y"), lit(true), B, 2)
    val w13 = Classifier.fitWeights(df.repartition(13), col("y"), lit(true), B, 2)
    assert(w1 === w13, "weights must not depend on partitioning")
  }

  test("hardSigmoidI: integer hard sigmoid — center, slope, ties, clamps") {
    // σh(m) = clamp(½ + m/4, 0, 1) in micro-units, halfUp quarter. The
    // values are pinned against the q85 oracle's CASE arithmetic.
    val in = Seq(0L, 2L, -2L, 4L, -4L, 2000000L, -2000000L, 3000000L,
      -3000000L).toDF("mI")
    val got = in.select(col("mI"),
        Classifier.hardSigmoidI(col("mI")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(0L) === 500000L)        // σh(0) = ½ exactly
    assert(got(2L) === 500001L)        // halfUp(0.5 µ) rounds away
    assert(got(-2L) === 499999L)       // symmetric
    assert(got(4L) === 500001L)
    assert(got(-4L) === 499999L)
    assert(got(2000000L) === 1000000L) // exactly at the upper clamp edge
    assert(got(-2000000L) === 0L)      // exactly at the lower clamp edge
    assert(got(3000000L) === 1000000L) // saturated
    assert(got(-3000000L) === 0L)
  }

  test("held-out eval on a separable corpus: precision and recall exactly 1.0") {
    // Train on 2 docs per class, hold out the purest doc of each class
    // (q88's split shape). A separable corpus must classify BOTH held-out
    // docs correctly — tp=1 fp=0 fn=0 tn=1, i.e. precision = recall = 1.0,
    // the spec-pinned claim behind the registered q88 metrics.
    val df = separable()
    val isTrain = col("doc_id").isin(0L, 1L, 3L, 4L)
    val held = Classifier.trainScore(df, col("y"), isTrain, B, 2)
      .filter(!col("is_train"))
      .select("doc_id", "is_target", "keep")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(held.map(_._1).toSet === Set(2L, 5L))
    val tp = held.count { case (_, y, k) => y && k }
    val fp = held.count { case (_, y, k) => !y && k }
    val fn = held.count { case (_, y, k) => y && !k }
    assert(tp === 1 && fp === 0 && fn === 0,
      s"held-out confusion must be perfect on a separable corpus: ${held.toSeq}")
  }

  test("halfUpDiv matches the SQL CASE on signs and ties") {
    assert(Classifier.halfUpDiv(5, 2) === 3)    // 2.5 -> 3
    assert(Classifier.halfUpDiv(-5, 2) === -3)  // -2.5 -> -3 (away from 0)
    assert(Classifier.halfUpDiv(4, 2) === 2)
    assert(Classifier.halfUpDiv(-4, 2) === -2)
    assert(Classifier.halfUpDiv(1, 3) === 0)
    assert(Classifier.halfUpDiv(2, 3) === 1)
    assert(Classifier.halfUpDiv(0, 7) === 0)
  }
}
