package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

class StreamingNearDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("foreachBatch ingest loop: each micro-batch probes the grown index, artifacts accumulate") {
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-stream-neardup").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"

    val ms = MemoryStream[(Long, String)]
    val docs = ms.toDS().toDF("doc_id", "text")
    val query = docs.writeStream
      .foreachBatch(StreamingNearDedup.pairSink("doc_id", "text", indexDir, pairsDir))
      .start()
    try {
      // trigger 1: empty index — only the within-batch exact dup pairs
      ms.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"),
        (10L, "completely different content about spark engines"))
      query.processAllAvailable()
      val after1 = spark.read.parquet(pairsDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(after1.map(p => (p._1, p._2)) == Set((1L, 2L)),
        s"first batch must find only its internal dup, got $after1")

      // trigger 2: doc 3 repeats doc 1's content — the index probe must
      // pair it with BOTH already-ingested copies; doc 4 matches nothing
      ms.addData(
        (3L, "the quick brown fox jumps over the lazy dog"),
        (4L, "unrelated text that matches nothing at all"))
      query.processAllAvailable()
      val after2 = spark.read.parquet(pairsDir)
        .as[(Long, Long, Double)].collect().toSet
      assert(after2.map(p => (p._1, p._2)) == Set((1L, 2L), (1L, 3L), (2L, 3L)),
        s"index probe must emit the cross pairs, got $after2")
      assert(after2.filter(p => p._2 == 3L).forall(_._3 == 1.0),
        "identical content must verify at jaccard 1.0")

      // the index holds every ingested doc's artifacts: 5 docs x 4 bands
      assert(spark.read.parquet(s"$indexDir/bands").count() == 20)
      assert(spark.read.parquet(s"$indexDir/shingles")
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L, 10L))
    } finally query.stop()
  }

  test("ingest loop resumes from checkpoint: unprocessed data flows, processed batches don't replay") {
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft-neardup-recovery").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"
    val ckpt = s"${tmp.getAbsolutePath}/ckpt"
    val ms = MemoryStream[(Long, String)]

    def startQuery() = ms.toDS().toDF("doc_id", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch(StreamingNearDedup.pairSink("doc_id", "text", indexDir, pairsDir))
      .start()

    val q1 = startQuery()
    try {
      ms.addData(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox jumps over the lazy dog"))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart on the SAME checkpoint: the committed first batch must not
    // replay (its pairs would duplicate), new data must flow
    val q2 = startQuery()
    try {
      ms.addData((3L, "the quick brown fox jumps over the lazy dog"))
      q2.processAllAvailable()
      val pairs = spark.read.parquet(pairsDir)
        .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSeq
      assert(pairs.sorted == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
        s"restart must neither replay batch 1 nor drop batch 2, got $pairs")
      assert(spark.read.parquet(s"$indexDir/shingles")
        .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L),
        "index must hold each doc's artifacts exactly once")
    } finally q2.stop()
  }

  test("replay of an already-ingested batch never emits self-pairs") {
    // at-least-once: a replayed batch's bands ALREADY sit in the index, so
    // every doc's own bands match on the probe join — without the
    // id-inequality predicate each would pair with itself, emitting
    // (x, x, 1.0) rows that minhashPairs (strict id_a < id_b) never
    // produces and that reader-side (id_a, id_b) dedup can't remove
    val tmp = Files.createTempDirectory("graft-neardup-replay").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (9L, "completely different content about spark engines")).toDF("doc_id", "text")
    StreamingNearDedup.ingestBatch(batch, "doc_id", "text", indexDir, pairsDir)
    // redeliver the exact same batch (crash-after-commit replay)
    StreamingNearDedup.ingestBatch(batch, "doc_id", "text", indexDir, pairsDir)
    val pairs = spark.read.parquet(pairsDir).as[(Long, Long, Double)].collect().toSeq
    assert(pairs.forall(p => p._1 != p._2),
      s"replay must not produce self-pairs, got $pairs")
    assert(pairs.map(p => (p._1, p._2)).distinct.sorted == Seq((1L, 2L)),
      s"reader-side (id_a, id_b) dedup must recover the true pair set, got $pairs")
  }

  test("ingestBatch returns the per-trigger pair count (the monitor signal)") {
    val tmp = Files.createTempDirectory("graft-ingest-count").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    assert(StreamingNearDedup.ingestBatch(b1, "doc_id", "text", indexDir, pairsDir) == 0L)
    val b2 = Seq((2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    assert(StreamingNearDedup.ingestBatch(b2, "doc_id", "text", indexDir, pairsDir) == 1L)
  }

  test("compactIndex: fewer files, identical rows, and ingest continues against the compacted index") {
    import scala.jdk.CollectionConverters._
    val tmp = Files.createTempDirectory("graft-neardup-compact").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"
    def parts(sub: String): Int =
      Files.list(java.nio.file.Paths.get(s"$indexDir/$sub")).iterator().asScala
        .count(_.getFileName.toString.startsWith("part-"))
    // several appends -> a small-file mess, the state the maintenance step
    // exists for
    (0 until 5).foreach { i =>
      val b = Seq((i * 2L, s"alpha beta gamma delta epsilon zeta doc$i"),
        (i * 2L + 1L, s"totally different words here nothing shared at all run$i"))
        .toDF("doc_id", "text")
      StreamingNearDedup.ingestBatch(b, "doc_id", "text", indexDir, pairsDir)
    }
    val bandsBefore = spark.read.parquet(s"$indexDir/bands")
      .collect().map(_.toSeq).toSet
    val shinglesBefore = spark.read.parquet(s"$indexDir/shingles")
      .select("id").as[Long].collect().toSet
    val filesBefore = parts("bands")
    val written = StreamingNearDedup.compactIndex(spark, indexDir)
    assert(written("bands") >= 1 && written("shingles") >= 1)
    assert(parts("bands") < filesBefore,
      s"compaction must shrink the ${filesBefore}-file append mess")
    // compaction is a no-op on the data
    assert(spark.read.parquet(s"$indexDir/bands").collect().map(_.toSeq).toSet
      == bandsBefore, "band rows must survive compaction bit-for-bit")
    assert(spark.read.parquet(s"$indexDir/shingles")
      .select("id").as[Long].collect().toSet == shinglesBefore)
    // the loop keeps working: a new doc matching an OLD one still pairs
    // through the compacted index
    val b6 = Seq((100L, "alpha beta gamma delta epsilon zeta doc0"))
      .toDF("doc_id", "text")
    val n = StreamingNearDedup.ingestBatch(b6, "doc_id", "text", indexDir, pairsDir)
    assert(n >= 1L, "probe against the compacted index must still find the near-dup")
  }

  test("ingest heals an interrupted compaction swap instead of probing an empty index") {
    val tmp = Files.createTempDirectory("graft-neardup-heal").toFile
    val indexDir = s"${tmp.getAbsolutePath}/index"
    val pairsDir = s"${tmp.getAbsolutePath}/pairs"
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (9L, "completely different content about spark engines")).toDF("doc_id", "text")
    StreamingNearDedup.ingestBatch(b1, "doc_id", "text", indexDir, pairsDir)
    // simulate a compactIndex crash between rename-away and rename-in on
    // BOTH tables: live dirs gone, committed rewrites parked at `.new`
    val fs = new org.apache.hadoop.fs.Path(indexDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("bands", "shingles").foreach { sub =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(s"$indexDir/$sub"),
        new org.apache.hadoop.fs.Path(s"$indexDir/$sub.new")))
    }
    // next trigger: without the heal this probes an EMPTY index — no
    // cross pair — and its append dooms the parked generation
    val b2 = Seq((3L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val n = StreamingNearDedup.ingestBatch(b2, "doc_id", "text", indexDir, pairsDir)
    assert(n == 1L, "the healed index must yield the cross pair")
    val pairs = spark.read.parquet(pairsDir)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    assert(pairs == Set((1L, 3L)), s"got $pairs")
    assert(spark.read.parquet(s"$indexDir/shingles")
      .select("id").as[Long].collect().toSet == Set(1L, 3L, 9L),
      "no artifact may be lost across the healed swap")
  }
}
