package graft.llm

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** ScalaCheck-generated invariants for the text operators, evaluated
  * through the real Spark expressions. (Raw `Gen` sampling with fixed
  * seeds — the scalatest/scalacheck bridge artifact isn't in the offline
  * cache, and deterministic seeds beat flaky property runs here anyway.)
  */
class TextStatsPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val wordGen = Gen.oneOf("the", "spark", "data", "a1", "zz9", "row", "of")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(1, 30)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("quality score stays in [0,1]; stopword hits never exceed token count") {
    val texts = samples(textGen, 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val rows = df.select(
      TextStats.qualityScore(col("text")).as("q"),
      size(TextStats.tokens(col("text"))).as("n"),
      TextStats.wordHits(TextStats.tokens(col("text")), TextStats.enStopwords).as("s"))
      .as[(Double, Int, Int)].collect()
    assert(rows.length == texts.length)
    rows.foreach { case (q, n, s) =>
      assert(q >= 0.0 && q <= 1.0, s"quality $q out of range")
      assert(s <= n && n >= 1)
    }
  }

  test("jaccard: reflexive 1.0, bounded [0,1] on generated shingle sets") {
    val pairs = samples(Gen.zip(textGen, textGen), 25)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      Dedup.jaccard(
        TextStats.shingles(TextStats.tokens(col("a")), 3),
        TextStats.shingles(TextStats.tokens(col("a")), 3)).as("self"),
      Dedup.jaccard(
        TextStats.shingles(TextStats.tokens(col("a")), 3),
        TextStats.shingles(TextStats.tokens(col("b")), 3)).as("cross"))
      .as[(Double, Double)].collect()
    rows.foreach { case (self, cross) =>
      assert(self == 1.0)
      assert(cross >= 0.0 && cross <= 1.0)
    }
  }

  test("simhash: equal text equal sketch, within declared bit range") {
    val texts = samples(textGen, 25)
    val df = texts.map(t => (t, t)).toDF("a", "b")
    val rows = df.select(
      Dedup.simhash(col("a"), 16), Dedup.simhash(col("b"), 16)).as[(Long, Long)].collect()
    rows.foreach { case (x, y) =>
      assert(x == y)
      assert(x >= 0 && x < (1 << 16))
    }
  }

  test("minhash signature is contained in the seeded-hash image of the shingle set") {
    val texts = samples(textGen, 10)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val sh = df.select(col("id"), TextStats.shingles(TextStats.tokens(col("text")), 3).as("s"))
    val rows = sh.select(
      TextStats.minShingleHash(col("s"), 0).as("mh"),
      transform(col("s"), x => md5(concat(lit("0:"), x))).as("all"))
      .as[(String, Seq[String])].collect()
    rows.foreach { case (mh, all) => assert(all.min == mh) }
  }

  test("winnowing: docs sharing a run of >= w+k-1 tokens share a fingerprint") {
    val k = 3
    val w = 4
    // pairs of texts built around a common (w + k - 1)-token run with
    // generated distinct prefixes/suffixes
    val run = "alpha beta gamma delta epsilon zeta"  // w + k - 1 = 6 tokens
    val pads = samples(textGen, 20)
    val df = pads.zipWithIndex.map { case (p, i) =>
      (i.toLong * 2, s"$p $run", i.toLong * 2 + 1, s"$run ${pads(pads.length - 1 - i)}")
    }.toDF("id_a", "text_a", "id_b", "text_b")
    val rows = df.select(
      TextStats.winnowFingerprints(col("text_a"), k, w).as("fa"),
      TextStats.winnowFingerprints(col("text_b"), k, w).as("fb"))
      .as[(Seq[String], Seq[String])].collect()
    rows.foreach { case (fa, fb) =>
      assert(fa.toSet.intersect(fb.toSet).nonEmpty,
        "winnowing guarantee violated: shared 6-token run, disjoint fingerprints")
    }
  }

  test("winnowOverlapPairs: containment bounded (0,1]; the winnowing guarantee lifts to pairs") {
    val run = "alpha beta gamma delta epsilon zeta" // w + k - 1 = 6 tokens
    val pads = samples(textGen, 15)
    // every even/odd id pair shares the 6-token run -> must pair at minShared=1
    val docs = pads.zipWithIndex.flatMap { case (p, i) =>
      Seq((i.toLong * 2, s"$p $run"), (i.toLong * 2 + 1, s"$run ${pads(pads.length - 1 - i)}"))
    }.toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs, "doc_id", "text", 3, 4, minShared = 1)
      .as[(Long, Long, Long, Double)].collect()
    pairs.foreach { case (a, b, shared, c) =>
      assert(a < b && shared >= 1)
      assert(c > 0.0 && c <= 1.0, s"containment $c out of (0,1] for ($a,$b)")
    }
    val found = pairs.map(p => (p._1, p._2)).toSet
    (0 until pads.length).foreach { i =>
      assert(found.contains((i.toLong * 2, i.toLong * 2 + 1)),
        s"docs ${i * 2}/${i * 2 + 1} share a 6-token run but produced no pair")
    }
  }

  test("rareTokenStats: rarity bounded by token count, totals reassemble the corpus") {
    val texts = samples(textGen, 30)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = TextStats.rareTokenStats(docs, "doc_id", "text", rareBelow = 3)
      .as[(Long, Long, Long, Double)].collect()
    out.foreach { case (_, n, rare, ratio) =>
      assert(rare >= 0 && rare <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - (rare.toDouble / n)) < 1e-6)
    }
    val totalTokens = docs.select(explode(TextStats.tokens(col("text")))).count()
    assert(out.map(_._2).sum == totalTokens, "per-doc token counts must reassemble the corpus")
    // every token is rare at an impossible threshold, none at threshold 1
    val allRare = TextStats.rareTokenStats(docs, "doc_id", "text", rareBelow = Long.MaxValue)
      .as[(Long, Long, Long, Double)].collect()
    assert(allRare.forall(r => r._2 == r._3 && r._4 == 1.0))
    val noneRare = TextStats.rareTokenStats(docs, "doc_id", "text", rareBelow = 1)
      .as[(Long, Long, Long, Double)].collect()
    assert(noneRare.forall(r => r._3 == 0 && r._4 == 0.0))
  }

  test("tfidf: tf/df positive, df bounded by corpus size, smoothed idf keeps scores positive") {
    val texts = samples(textGen, 20)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val n = docs.count()
    val out = TextStats.tfidf(docs, "doc_id", "text", topK = 3)
      .as[(Long, String, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, _, tf, df, score) =>
      assert(tf >= 1 && df >= 1 && df <= n)
      assert(score > 0.0, s"smoothed idf must keep scores positive, got $score")
    }
    // rank()-based cut: > topK rows per doc only on exact score-and-term
    // ties, which cannot happen (term is part of the order) — so <= topK
    out.groupBy(_._1).foreach { case (d, rows) =>
      assert(rows.length <= 3, s"doc $d returned ${rows.length} rows for topK=3")
    }
  }

  test("winnowing edges: empty -> no fingerprints; short docs -> one global min") {
    val df = Seq(
      (1L, ""), (2L, "   "),
      (3L, "one two"),               // < k tokens: one gram, one fingerprint
      (4L, "one two three four")     // 2 grams < w: one fingerprint (global min)
    ).toDF("id", "text")
    val rows = df.select(col("id"),
      TextStats.winnowFingerprints(col("text"), 3, 4).as("f"))
      .as[(Long, Seq[String])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty)
    assert(rows(3L).length == 1 && rows(4L).length == 1)
    // sketch is bounded: ~|grams|/w distinct mins, never more than |grams|
    val long = Seq((1L, Seq.fill(50)("tok").zipWithIndex.map(t => t._1 + t._2).mkString(" ")))
      .toDF("id", "text")
    val n = long.select(size(TextStats.winnowFingerprints(col("text"), 3, 4)))
      .as[Int].head()
    assert(n > 0 && n <= 48, s"fingerprint count $n exceeds gram count")
  }
}
