package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Data-cleaning operators: PII redaction, repetition stats, benchmark
  * decontamination.
  */
class CleaningSpec extends SparkTestBase {
  import spark.implicits._

  test("redactPii: emails, IPv4s, and phone runs become typed placeholders; clean text unchanged") {
    val df = Seq(
      (1L, "reach me at jane.doe+spam@sub.example.co.uk today"),
      (2L, "server 192.168.001.42 rebooted"),
      (3L, "call +1 (415) 555-0199 now"),
      (4L, "mixed: a@b.io at 10.0.0.1 or 020-7946-0958."),
      (5L, "no pii here, just words and 42")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextStats.redactPii(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "reach me at <EMAIL> today")
    assert(out(2L) == "server <IP> rebooted")
    assert(out(3L) == "call <PHONE> now")
    assert(out(4L) == "mixed: <EMAIL> at <IP> or <PHONE>.")
    assert(out(5L) == "no pii here, just words and 42")
  }

  test("normalizeText: NFC composes, zero-width/controls strip, document whitespace survives") {
    val df = Seq(
      (1L, "Café"), // decomposed e-acute
      (2L, "Café"), // precomposed — must equal row 1 after NFC
      (3L, "a​b‌c‍d⁠e﻿"), // the zero-width zoo
      (4L, "x\u0000y\u0007z\u007f"), // C0 controls + DEL
      (5L, "tab\there\nnewline\rcr"), // \t \n \r are NOT stripped
      (6L, "")
    ).toDF("id", "text")
    val out = df.select(col("id"), TextStats.normalizeText(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "Café" && out(1L) == out(2L))
    assert(out(3L) == "abcde")
    assert(out(4L) == "xyz")
    assert(out(5L) == "tab\there\nnewline\rcr")
    assert(out(6L) == "")
    // idempotent: normalizing normalized text is identity
    val twice = df.select(col("id"),
      TextStats.normalizeText(TextStats.normalizeText(col("text"))).as("t"))
      .as[(Long, String)].collect().toMap
    assert(twice == out)
  }

  test("normalized: audit columns — strip counts NFC-relative, mojibake heuristic, changed flag") {
    val df = Seq(
      (1L, "plain ascii"),
      (2L, "Café​"), // composes AND strips one char
      (3L, "naÃ¯ve â€™quoteâ€œ ï¿½"), // 3 mojibake hits
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextStats.normalized(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    assert(out(1L) == (Some("plain ascii"), Some(0L), Some(0), Some(0)))
    // n_stripped counts only the strip (1 ZWSP), not the composition
    assert(out(2L) == (Some("Café"), Some(1L), Some(0), Some(1)))
    assert(out(3L)._3 == Some(3), s"expected 3 mojibake hits: ${out(3L)}")
    assert(out(3L)._4 == Some(0), "mojibake alone must not flip changed")
    // null text propagates null audit columns, never throws
    assert(out(4L) == ((None, None, None, None)))
  }

  test("redaction order: an IPv4 is consumed by <IP>, never double-matched as a phone") {
    val df = Seq((1L, "ip 10.1.2.3 and phone 5551234567")).toDF("id", "text")
    val out = df.select(TextStats.redactPii(col("text"))).as[String].head()
    assert(out == "ip <IP> and phone <PHONE>")
  }

  test("repetition ratios: zero on all-distinct text, high on boilerplate loops, bounded") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "spam spam spam spam spam spam"),
      (3L, "line\nline\nline\nother"),
      (4L, ""),
      (5L, "a b a b a b a b a b")   // phrase loop: tokens repeat, 3-grams collapse
    ).toDF("id", "text")
    val rows = df.select(col("id"),
      TextStats.dupTokenRatio(col("text")).as("t"),
      TextStats.dupLineRatio(col("text")).as("l"),
      TextStats.dupShingleRatio(col("text")).as("s"))
      .as[(Long, Double, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L)._1 == 0.0 && rows(1L)._3 == 0.0)
    assert(rows(2L)._1 == 5.0 / 6.0)
    assert(rows(2L)._3 > 0.5, "constant text must have high shingle dup")
    assert(rows(3L)._2 == 0.5, "2 duplicate lines of 4")
    assert(rows(4L) == ((0.0, 0.0, 0.0)))
    assert(rows(5L)._3 == 6.0 / 8.0, "a-b loop has only 2 distinct 3-grams of 8")
    rows.values.foreach { case (t, l, s) =>
      assert(t >= 0 && t < 1 && l >= 0 && l < 1 && s >= 0 && s < 1)
    }
  }

  test("contamination overlap: flags exactly the docs sharing shingles with the bench set") {
    val df = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),  // bench (id % 2 == 0 filter below)
      (1L, "the quick brown fox went elsewhere entirely"),  // shares 'the quick brown' + 'quick brown fox'
      (3L, "completely different content with no overlap"),
      (5L, "jumps over the lazy dog said nobody")           // shares trailing shingles
    ).toDF("doc_id", "text")
    val out = Contamination.overlap(df, "doc_id", "text", col("doc_id") % 2 === 0)
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(1L, 5L), s"wrong contaminated set: $out")
    assert(out(1L) == 2L)
    assert(out(5L) == 3L, "jumps-over-the / over-the-lazy / the-lazy-dog")
    assert(!out.contains(0L), "bench docs themselves are never flagged")
  }

  test("semanticOverlap: cell-blocked bench hits; multi-probe recovers the cross-cell pair") {
    // two orthogonal centroid cells (ids 100/200, the %100 convention —
    // centroid rows stay ordinary corpus members); bench vector 7 sits in
    // cell A and probes A then B at nprobe=2
    val vecs = Seq(
      (100L, Seq(1f, 0f)),   // centroid A; train — cos .995 vs bench → hit
      (200L, Seq(0f, 1f)),   // centroid B; train — cos .0995 → below
      (7L, Seq(1f, 0.1f)),   // bench
      (1L, Seq(2f, 0f)),     // cell A — cos .995037 → hit
      (2L, Seq(0f, 3f)),     // cell B — cos .0995 → below threshold
      (3L, Seq(-1f, 0f)),    // cell B (0 beats −1) — cos −.995 → below
      (5L, Seq(0.9f, 1f))    // cell B, cos .74 vs bench: reachable ONLY
                             // via the bench's second probe
    ).toDF("vec_id", "embedding")
    val bench = col("id") === 7
    val cent = col("id") % 100 === 0
    def run(nprobe: Int): Map[Long, (Long, Double)] =
      Contamination.semanticOverlap(vecs, "vec_id", "embedding", bench, cent,
        threshold = 0.5, nprobe = nprobe)
        .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val top1 = run(1)
    assert(top1.keySet == Set(1L, 100L), s"top-1 cell blocking: got $top1")
    assert(top1(1L)._1 == 1L && math.abs(top1(1L)._2 - 0.995037) < 1e-6,
      s"rounded max cosine: got ${top1(1L)}")
    val top2 = run(2)
    assert(top2.keySet == Set(1L, 5L, 100L),
      s"multi-probing the bench side must recover the cross-cell pair, got $top2")
    assert(top2(5L)._1 == 1L && top2(5L)._2 >= 0.5 && top2(5L)._2 < 0.8)
    assert(!top2.contains(7L), "bench vectors themselves are never flagged")
  }

  test("overlapBloom: never misses a truly contaminated doc, counts upper-bound the exact form") {
    // run the sketch variant on the real corpus fixture at sf0.001 so the
    // probe covers hundreds of docs, and pin it against the exact join
    val corpus = graft.fixtures.DocumentsFixture.corpusDf(spark, "/root/testdata/sf0.001")
    val bench = col("doc_id") % 97 === 0
    val exact = Contamination.overlap(corpus, "doc_id", "text", bench)
      .as[(Long, Long)].collect().toMap
    val bloom = Contamination.overlapBloom(corpus, "doc_id", "text", bench,
      expectedItems = 10000L, fpp = 0.001)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must produce real contamination")
    assert(exact.keySet.subsetOf(bloom.keySet),
      s"false negative: missing ${exact.keySet -- bloom.keySet}")
    exact.foreach { case (id, n) =>
      assert(bloom(id) >= n, s"doc $id: bloom count ${bloom(id)} < exact $n")
    }
    // over-flagging stays near fpp: the flagged-doc set may exceed the
    // exact set only marginally (deterministic for fixed inputs/sizing)
    assert(bloom.size <= exact.size + math.max(2, corpus.count() / 100),
      s"over-flagging beyond the fpp contract: ${bloom.size} vs ${exact.size}")
  }

  test("rareTokenStats: corpus-relative rarity, exact integer counts, zero-token docs drop") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa bbb"), (2L, "aaa ccc"), (3L, "")).toDF("doc_id", "text")
    // global: aaa=3, bbb=1, ccc=1; rareBelow=2 -> bbb and ccc are rare
    val out = TextStats.rareTokenStats(docs, "doc_id", "text", rareBelow = 2)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out == Map(
      1L -> ((3L, 1L, 0.333333)),
      2L -> ((2L, 1L, 0.5))), s"got $out")
    assert(!out.contains(3L), "zero-token doc must drop (undefined ratio)")
  }

  test("interDocRepetition: shared-shingle fraction vs the rest of the corpus, exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),  // shingles: abc bcd cde
      (2L, "a b c x y"),  // shingles: abc bcx cxy — shares only abc with doc 1
      (3L, "p q r s t"),  // no overlap with anything
      (4L, "p q r s t")   // exact dup of doc 3: every shingle shared, both ways
    ).toDF("doc_id", "text")
    val out = TextStats.interDocRepetition(docs, "doc_id", "text", shingleSize = 3)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out == Map(
      1L -> ((3L, 1L, 0.333333)),
      2L -> ((3L, 1L, 0.333333)),
      3L -> ((3L, 3L, 1.0)),
      4L -> ((3L, 3L, 1.0))), s"got $out")
    // within-doc repetition alone must NOT count as shared: distinct
    // shingles are computed per doc before the corpus-frequency join
    val solo = Seq((1L, "z z z z z z")).toDF("doc_id", "text")
    val soloOut = TextStats.interDocRepetition(solo, "doc_id", "text", 3)
      .as[(Long, Long, Long, Double)].collect()
    assert(soloOut.toSeq == Seq((1L, 1L, 0L, 0.0)), s"got ${soloOut.toSeq}")
  }

  test("null-text rows: overlapBloom probes 0 instead of NPE-ing; dedupLines keeps the doc") {
    import spark.implicits._
    val docs = Seq(
      (0L, Some("the quick brown fox jumps")), // bench
      (1L, Some("the quick brown fox wanders")),
      (2L, None) // the DoS row: one null text in an untrusted corpus
    ).toDF("doc_id", "text")
    val bloom = Contamination.overlapBloom(docs, "doc_id", "text",
      col("doc_id") === 0, expectedItems = 100L)
      .as[(Long, Long)].collect().toMap
    assert(bloom.keySet == Set(1L), s"null-text doc must probe 0, job must survive: $bloom")
    val lines = TextStats.dedupLines(docs, "doc_id", "text", minOcc = 2)
      .as[(Long, Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(lines.contains(2L), "null-text doc must not vanish from the per-doc output")
    assert(lines(2L) == ((1L, 1L, "")), "null text reports as one empty line")
  }

  test("dedupLines: corpus-repeated lines vanish, order survives, empty result is ''") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep one\nboiler\nkeep two"),   // boiler appears in 3 docs
      (2L, "boiler\nunique line"),
      (3L, "boiler"),                        // nothing survives → ''
      (4L, "self\nself\nother")              // within-doc repeat counts too
    ).toDF("doc_id", "text")
    val out = TextStats.dedupLines(docs, "doc_id", "text", minOcc = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(out(1L) == ((3L, 2L, "keep one\nkeep two")), s"got ${out(1L)}")
    assert(out(2L) == ((2L, 1L, "unique line")))
    assert(out(3L) == ((1L, 0L, "")), "all-banned doc must yield empty text, not null")
    assert(out(4L) == ((3L, 1L, "other")),
      "occurrence count is corpus-wide including within-doc repeats")
    // determinism: line order is restored by position, not collection order
    val wide = Seq((9L, (1 to 50).map(i => s"u$i").mkString("\n") + "\nboiler"))
      .toDF("doc_id", "text")
    val cleaned = TextStats.dedupLines(docs.union(wide), "doc_id", "text", 2)
      .filter(col("doc_id") === 9L).select("clean_text").as[String].head()
    assert(cleaned == (1 to 50).map(i => s"u$i").mkString("\n"))
  }

  test("gopherFlags: each rule fails on exactly its crafted doc; the clean doc keeps") {
    // one doc per rule violation, each otherwise passing: the keep bit must
    // isolate the single failed threshold
    val good = ("the quick brown fox and the lazy dog ran to the old mill " * 6).trim // 72 words, stopwords, alpha
    val docs = Seq(
      (1L, good),                                            // keeps
      (2L, "the of and to is in a"),                         // under the 50-word floor
      (3L, good + " " + Seq.fill(20)("# ... #").mkString(" ")), // symbol ratio > 0.1
      (4L, (1 to 60).map(_ => "- bullet").mkString("\n") + "\nthe a of is plain"), // bullet lines > 0.9
      (5L, (1 to 60).map(_ => "the end comes...").mkString("\n")), // ellipsis line-ends > 0.3
      (6L, good + " " + Seq.fill(300)("42").mkString(" ")),   // alpha ratio < 0.8
      (7L, Seq.fill(60)("zzz qqq www").mkString(" "))         // no stopwords
    ).toDF("doc_id", "text")
    val out = TextStats.gopherFlags(docs, "doc_id", "text")
      .select("doc_id", "keep").as[(Long, Int)].collect().toMap
    assert(out(1L) == 1, "clean doc must keep")
    (2L to 7L).foreach(id => assert(out(id) == 0, s"doc $id must fail its rule"))

    // the metric columns isolate WHICH rule fired
    val m = TextStats.gopherFlags(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(2L).getLong(1) < 50, "doc 2 fails on word count")
    assert(m(3L).getDouble(3) > 0.1, "doc 3 fails on symbol ratio")
    assert(m(4L).getDouble(4) > 0.9, "doc 4 fails on bullet ratio")
    assert(m(5L).getDouble(5) > 0.3, "doc 5 fails on ellipsis ratio")
    assert(m(6L).getDouble(6) < 0.8, "doc 6 fails on alpha ratio")
    assert(m(7L).getLong(7) < 2, "doc 7 fails on stopword hits")

    // empty doc: null ratios, three-valued conjunction -> keep 0, no NPE
    val empty = TextStats.gopherFlags(Seq((8L, "")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_words", "keep").as[(Long, Int)].head()
    assert(empty == ((0L, 0)), "empty doc must report 0 words and drop")

    // scale shape: a pure narrow projection — no exchange anywhere
    val p = TextStats.gopherFlags(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"gopherFlags must not shuffle:\n$p")
  }
}
