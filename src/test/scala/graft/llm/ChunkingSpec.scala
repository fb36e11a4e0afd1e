package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunk: window/stride offsets, short tail, empty doc yields nothing") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "only three tokens"),
      (3L, "   ") // whitespace-only -> zero tokens -> no chunks
    ).toDF("doc_id", "text")
    val out = Chunking.chunk(docs, "doc_id", "text", windowTokens = 4, strideTokens = 3)
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // doc 1: starts 0,3,6,9 -> windows of 4,4,4 and a 1-token tail
    assert(out((1L, 0)) == ((0, 4, "t1 t2 t3 t4")))
    assert(out((1L, 1)) == ((3, 4, "t4 t5 t6 t7")))
    assert(out((1L, 2)) == ((6, 4, "t7 t8 t9 t10")))
    assert(out((1L, 3)) == ((9, 1, "t10")))
    // doc 2: single short chunk
    assert(out((2L, 0)) == ((0, 3, "only three tokens")))
    assert(!out.keySet.exists(_._1 == 3L))
    assert(out.size == 5)
  }

  test("chunk: consecutive chunks overlap by window - stride tokens") {
    val docs = Seq((1L, (1 to 20).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val rows = Chunking.chunk(docs, "doc_id", "text", 8, 5)
      .orderBy("chunk_id")
      .select("chunk_text").as[String].collect()
      .map(_.split(" ").toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.takeRight(3) == b.take(3), s"overlap broken: $a | $b")
      case _ => ()
    }
  }

  test("chunk: every chunk is a no-shuffle generator plan") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunk(docs, "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("pack: per-group running offsets and bin assignment") {
    val docs = Seq(
      (1L, "en", 100), (2L, "en", 150), (3L, "en", 80), (4L, "en", 200),
      (10L, "fr", 300)
    ).toDF("doc_id", "lang", "n")
    val out = Chunking.pack(docs, "lang", "doc_id", col("n"), budgetTokens = 256)
      .select("doc_id", "offset", "bin").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // en stream: offsets 0,100,250,330 -> bins 0,0,0,1
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((100L, 0L)))
    assert(out(3L) == ((250L, 0L)))
    assert(out(4L) == ((330L, 1L)))
    // fr group starts its own stream
    assert(out(10L) == ((0L, 0L)))
  }

  test("packedSequences: in-order concat per bin, counts and token totals") {
    val docs = Seq(
      (2L, "en", "second doc"),
      (1L, "en", "first doc"),   // out of order on purpose
      (3L, "en", "third doc"),
      (10L, "fr", "seul doc")
    ).toDF("doc_id", "lang", "text")
    val packed = Chunking.pack(docs, "lang", "doc_id", lit(2), budgetTokens = 4)
    val out = Chunking.packedSequences(packed, "lang", "doc_id", "text")
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // en: docs 1,2 fill bin 0 (offsets 0,2); doc 3 starts bin 1 (offset 4)
    assert(out(("en", 0L)) == ((2L, 4L, "first doc second doc")))
    assert(out(("en", 1L)) == ((1L, 2L, "third doc")))
    assert(out(("fr", 0L)) == ((1L, 2L, "seul doc")))
  }

  test("pack: a document longer than the budget starts its bin and pushes the next doc past it") {
    val docs = Seq((1L, "en", 500), (2L, "en", 100)).toDF("doc_id", "lang", "n")
    val out = Chunking.pack(docs, "lang", "doc_id", col("n"), budgetTokens = 256)
      .select("doc_id", "offset", "bin").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((0L, 0L)))   // oversized doc assigned by its FIRST token
    assert(out(2L) == ((500L, 1L))) // next doc lands past the straddled bin
  }

  test("chunk then pack: when chunks bound doc length, every sequence stays under budget + window") {
    val docs = Seq(
      (1L, (1 to 150).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 90).map(i => s"b$i").mkString(" "))
    ).toDF("doc_id", "text")
    val chunks = Chunking.chunk(docs, "doc_id", "text", windowTokens = 32, strideTokens = 32)
      .withColumn("lang", lit("en"))
      // a synthetic per-chunk order key that preserves (doc, chunk) order
      .withColumn("ck", col("id") * 1000 + col("chunk_id"))
    val packed = Chunking.pack(chunks, "lang", "ck", col("n_chunk_tokens"), budgetTokens = 64)
    val seqTokens = Chunking.packedSequences(packed, "lang", "ck", "chunk_text")
      .select("seq_tokens").as[Long].collect()
    // every member is <= window(32), so no sequence exceeds budget + window - 1
    assert(seqTokens.forall(_ <= 64 + 32 - 1), seqTokens.toSeq)
    assert(seqTokens.sum == 150 + 90, "chunking at stride == window partitions every token exactly once")
  }

  test("pack: group partitioning means no single global sort partition") {
    val docs = Seq((1L, "en", 10), (2L, "fr", 10)).toDF("doc_id", "lang", "n")
    val plan = Chunking.pack(docs, "lang", "doc_id", col("n"), 100)
      .queryExecution.executedPlan.toString
    // hashpartitioning on the group key, never SinglePartition
    assert(plan.contains("hashpartitioning(lang"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
