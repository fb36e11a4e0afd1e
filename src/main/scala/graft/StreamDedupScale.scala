package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.fixtures.EmbeddingsFixture
import graft.llm.{Dedup, Similarity}
import graft.sources.Tables
import graft.streaming.{StreamingNearDedup, StreamingSemanticDedup}

/** Scale-evidence probe for the near-dup INGEST loop (VERDICT r12 ask #5):
  * [[graft.streaming.StreamingNearDedup]] had correctness coverage but no
  * measured scale point — its 100 TB claim ("per-trigger cost scales with
  * the batch, never the corpus") was argued from the plan shape alone.
  * This main drives the loop over a replica documents table split into N
  * equal hash-slices and prints one JSON line per trigger:
  *
  *  - `ingest_sec` — the trigger's wall (sign + probe-join + verify +
  *    index fold). The claim under test: flat across triggers while the
  *    INDEX behind the probe grows N-fold. Any per-trigger growth here is
  *    index-scan/shuffle work leaking into the trigger path.
  *  - `pairs_appended`, `bands_rows`/`shingles_rows`/`index_bytes` — the
  *    emitted output and the index-to-date, so growth (expected, append-only)
  *    is visible next to the per-trigger cost (required flat).
  *
  * The final lines run the BATCH pipeline ([[Dedup.minhashPairs]], q12
  * semantics) over the same full corpus and check cumulative incremental ≡
  * batch pair-for-pair — StreamingNearDedupSpec's equivalence, re-proven at
  * replica scale.
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BATCHES=10 \
  *   sbt -batch "runMain graft.StreamDedupScale"
  * }}}
  *
  * `SPARK_GRAFT_MODE=semantic` runs the same ladder over
  * [[graft.streaming.StreamingSemanticDedup]] — the embedding-space twin
  * — using q48b's cell-blocking convention: the centroid set is derived
  * ONCE from the full catalog (`vec_id % 100 = 0`, the q16 IVF
  * convention) before ingest starts, exactly as a 100 TB pipeline trains
  * centroids offline, and each arriving batch is assigned row-locally
  * against the broadcast centroids ([[Similarity.ivfAssign]]). Because
  * assignment is row-local and the centroid set is pinned, per-batch
  * assignment ≡ full-corpus assignment, so cumulative incremental pairs
  * must equal the batch [[Similarity.cosinePairs]] over the assigned
  * corpus pair-for-pair — the check the final line performs.
  *
  * `SPARK_GRAFT_MODE=image` runs the ladder over
  * [[graft.streaming.StreamingImageDedup]] — the perceptual-hash twin
  * (decode + dHash per trigger, banded signature index, cumulative ≡
  * one-shot q83 check). See [[runImage]].
  */
object StreamDedupScale {

  private def dirBytes(p: Path): Long =
    if (!Files.exists(p)) 0L
    else {
      val s = Files.walk(p)
      try s.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
      finally s.close()
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_BATCHES", "10").toInt
    val skipBatchCheck = sys.env.get("SPARK_GRAFT_SKIP_BATCH_CHECK").contains("1")
    // Kill-and-resume (the StreamScale r13 protocol, r13 VERDICT ask #7
    // extended it to this loop): `SPARK_GRAFT_STATE_DIR` pins the
    // index/pairs location and BATCH_FROM/BATCH_TO bound the ladder
    // slice, so one JVM can ingest batches 0–4, die (optionally with a
    // torn compaction swap simulated between the JVMs), and a FRESH JVM
    // resume 5–9 against the same index — ingestBatch's heal-before-read
    // exercised at replica scale. The incremental ≡ batch check emits
    // only when a run ends on the last batch, i.e. from the resuming JVM.
    val batchFrom = sys.env.getOrElse("SPARK_GRAFT_BATCH_FROM", "0").toInt
    val batchTo = sys.env.getOrElse("SPARK_GRAFT_BATCH_TO", (nBatches - 1).toString).toInt
    // maintenance cadence: compact the index every K triggers (0 = never) —
    // the probe for the measured small-file growth term (see
    // StreamingNearDedup.compactIndex)
    val compactEvery = sys.env.getOrElse("SPARK_GRAFT_COMPACT_EVERY", "0").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_STATE_DIR",
      Files.createTempDirectory("graft-dedupscale").toString)
    val indexDir = s"$base/index"
    val pairsDir = s"$base/pairs"
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if (sys.env.get("SPARK_GRAFT_MODE").contains("semantic")) {
      runSemantic(spark, sfDir, nBatches, skipBatchCheck, compactEvery,
        indexDir, pairsDir, batchFrom, batchTo)
      spark.stop()
      return
    }
    if (sys.env.get("SPARK_GRAFT_MODE").contains("image")) {
      runImage(spark, sfDir, nBatches, skipBatchCheck, compactEvery,
        indexDir, pairsDir, batchFrom, batchTo)
      spark.stop()
      return
    }

    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // Deterministic equal-size hash slices (the StreamScale convention):
    // every micro-batch is a same-size sample of the corpus, so a flat
    // per-trigger line cannot be explained by shrinking batches.
    val sliced = docs.withColumn("__slice",
      pmod(xxhash64(col("doc_id")), lit(nBatches)))
    val total = docs.count()
    println(s"""{"sf":${Bench.jstr(sfDir)},"rows":$total,"batches":$nBatches,"index":${Bench.jstr(indexDir)}}""")

    (batchFrom to batchTo).foreach { b =>
      val batch = sliced.filter(col("__slice") === b).drop("__slice")
      val t0 = System.nanoTime()
      val nPairs = StreamingNearDedup.ingestBatch(
        batch, "doc_id", "text", indexDir, pairsDir)
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val bandsRows = spark.read.parquet(s"$indexDir/bands").count()
      val shinglesRows = spark.read.parquet(s"$indexDir/shingles").count()
      println(s"""{"batch":$b,"ingest_sec":${math.round(ingestSec * 1000) / 1000.0},"pairs_appended":$nPairs,"bands_rows":$bandsRows,"shingles_rows":$shinglesRows,"index_bytes":${dirBytes(Paths.get(indexDir))}}""")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0 && b + 1 < nBatches) {
        val tc = System.nanoTime()
        val written = StreamingNearDedup.compactIndex(spark, indexDir)
        val compactSec = (System.nanoTime() - tc) / 1e9
        println(s"""{"compact_after":$b,"compact_sec":${math.round(compactSec * 1000) / 1000.0},"files":${written.map { case (k, v) => s"${Bench.jstr(k)}:$v" }.mkString("{", ",", "}")}}""")
      }
    }

    // a kill-and-resume FIRST half exits here; the resuming run (the one
    // that reaches the final batch) emits the equivalence check
    if (!skipBatchCheck && batchTo == nBatches - 1) {
      // the contrast: one full batch near-dup over the same corpus, and the
      // exactness check that makes the per-trigger numbers meaningful
      val t1 = System.nanoTime()
      val batchPairs = Dedup.minhashPairs(docs, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val batchN = batchPairs.count()
      val batchSec = (System.nanoTime() - t1) / 1e9
      // distinct() first: an at-least-once replay legally re-appends an
      // already-ingested batch's pairs (readers dedup, per the replay
      // spec), so a multiset exceptAll on the raw append log would report
      // a false mismatch after any resume that re-ran a batch. distinct()
      // also forgives a GENUINE duplicate-emission bug (a batch written
      // twice within one trigger), so the raw-vs-distinct delta is
      // reported alongside: a no-replay run must show delta 0, and a
      // replayed run's delta must equal the replayed batches' pair count.
      val rawPairs = spark.read.parquet(pairsDir)
      val rawRows = rawPairs.count()
      val incremental = rawPairs.distinct()
      val diff = incremental.exceptAll(batchPairs).count() +
        batchPairs.exceptAll(incremental).count()
      val distinctRows = incremental.count()
      println(s"""{"batch_q12_sec":${math.round(batchSec * 1000) / 1000.0},"batch_q12_pairs":$batchN,"incremental_pairs":${distinctRows},"raw_pair_rows":$rawRows,"replay_dup_rows":${rawRows - distinctRows},"incremental_equals_batch":${diff == 0L}}""")
    }
    spark.stop()
  }

  /** The semantic ladder ([[StreamingSemanticDedup]]): same slicing and
    * per-trigger JSON as the lexical mode, cell-blocked the q48b way. The
    * centroid set is pinned from the full catalog BEFORE ingest (offline
    * training, the 100 TB convention), so batch-at-a-time assignment is
    * row-for-row identical to the one-shot assignment and the final
    * incremental ≡ batch check is exact, not approximate.
    */
  private def runSemantic(
      spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int, skipBatchCheck: Boolean, compactEvery: Int,
      indexDir: String, pairsDir: String,
      batchFrom: Int = 0, batchTo: Int = Int.MaxValue): Unit = {
    val threshold = 0.4 // q48/q48b CosineDupThreshold (LlmQueries.scala)
    val corpus = EmbeddingsFixture.corpusDf(spark, sfDir)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = corpus.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("id"), col("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = corpus.count()
    val nCentroids = centroids.count()
    println(s"""{"mode":"semantic","sf":${Bench.jstr(sfDir)},"rows":$total,"centroids":$nCentroids,"batches":$nBatches,"index":${Bench.jstr(indexDir)}}""")

    val sliced = corpus.withColumn("__slice",
      pmod(xxhash64(col("vec_id")), lit(nBatches)))
    (batchFrom to math.min(batchTo, nBatches - 1)).foreach { b =>
      val batch = sliced.filter(col("__slice") === b).drop("__slice")
      val t0 = System.nanoTime()
      val assigned = Similarity.ivfAssign(
        batch.select(col("vec_id").as("id"), col("emb")), centroids)
      val nPairs = StreamingSemanticDedup.ingestBatch(
        assigned, "id", "emb", "bucket", indexDir, pairsDir, threshold)
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val indexRows = spark.read.parquet(s"$indexDir/vectors").count()
      println(s"""{"batch":$b,"ingest_sec":${math.round(ingestSec * 1000) / 1000.0},"pairs_appended":$nPairs,"index_rows":$indexRows,"index_bytes":${dirBytes(Paths.get(indexDir))}}""")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0 && b + 1 < nBatches) {
        val tc = System.nanoTime()
        val written = StreamingSemanticDedup.compactIndex(spark, indexDir)
        val compactSec = (System.nanoTime() - tc) / 1e9
        println(s"""{"compact_after":$b,"compact_sec":${math.round(compactSec * 1000) / 1000.0},"files":${written.map { case (k, v) => s"${Bench.jstr(k)}:$v" }.mkString("{", ",", "}")}}""")
      }
    }

    // a kill-and-resume FIRST half exits here; the resuming run (the one
    // that reaches the last batch) emits the equivalence check
    if (!skipBatchCheck && math.min(batchTo, nBatches - 1) == nBatches - 1) {
      // contrast: the one-shot q48b pair stage over the same pinned
      // centroids, and the exactness check on the cumulative pair set
      val t1 = System.nanoTime()
      val assignedAll = Similarity.ivfAssign(
        corpus.select(col("vec_id").as("id"), col("emb")), centroids)
      val batchPairs = Similarity.cosinePairs(
        assignedAll, "id", "emb", col("bucket"), threshold)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val batchN = batchPairs.count()
      val batchSec = (System.nanoTime() - t1) / 1e9
      // distinct() first: an at-least-once replay legally re-appends an
      // already-ingested batch's pairs (readers dedup, per the replay
      // spec), so a multiset exceptAll on the raw append log would report
      // a false mismatch after any resume that re-ran a batch. distinct()
      // also forgives a GENUINE duplicate-emission bug (a batch written
      // twice within one trigger), so the raw-vs-distinct delta is
      // reported alongside: a no-replay run must show delta 0, and a
      // replayed run's delta must equal the replayed batches' pair count.
      val rawPairs = spark.read.parquet(pairsDir)
      val rawRows = rawPairs.count()
      val incremental = rawPairs.distinct()
      val diff = incremental.exceptAll(batchPairs).count() +
        batchPairs.exceptAll(incremental).count()
      val distinctRows = incremental.count()
      println(s"""{"batch_q48b_pairs_sec":${math.round(batchSec * 1000) / 1000.0},"batch_q48b_pairs":$batchN,"incremental_pairs":${distinctRows},"raw_pair_rows":$rawRows,"replay_dup_rows":${rawRows - distinctRows},"incremental_equals_batch":${diff == 0L}}""")
    }
  }

  /** `SPARK_GRAFT_MODE=image`: the ladder over
    * [[graft.streaming.StreamingImageDedup]] — the perceptual-hash twin
    * (r15 VERDICT ask #7). Each trigger DECODES its slice of the image
    * corpus (the per-batch cost a real ingest pays), dHashes it, probes
    * the persisted banded signature index, and folds itself in; the final
    * line checks cumulative pairs ≡ the one-shot q83
    * [[graft.llm.Multimodal.imageDupPairs]] pair-for-pair.
    */
  private def runImage(
      spark: org.apache.spark.sql.SparkSession, sfDir: String,
      nBatches: Int, skipBatchCheck: Boolean, compactEvery: Int,
      indexDir: String, pairsDir: String,
      batchFrom: Int = 0, batchTo: Int = Int.MaxValue): Unit = {
    import graft.llm.Multimodal
    import graft.streaming.StreamingImageDedup
    val corpus = graft.fixtures.ImagesFixture.imageCorpus(spark, sfDir)
    val total = corpus.count()
    println(s"""{"mode":"image","sf":${Bench.jstr(sfDir)},"rows":$total,"batches":$nBatches,"index":${Bench.jstr(indexDir)}}""")

    (batchFrom to math.min(batchTo, nBatches - 1)).foreach { b =>
      val batch = corpus.filter(pmod(xxhash64(col("id")), lit(nBatches)) === b)
      val t0 = System.nanoTime()
      val nPairs = StreamingImageDedup.ingestBatch(
        Multimodal.imageHashes(batch), indexDir, pairsDir)
      val ingestSec = (System.nanoTime() - t0) / 1e9
      val indexRows = spark.read.parquet(s"$indexDir/bands").count()
      println(s"""{"batch":$b,"ingest_sec":${math.round(ingestSec * 1000) / 1000.0},"pairs_appended":$nPairs,"index_rows":$indexRows,"index_bytes":${dirBytes(Paths.get(indexDir))}}""")
      if (compactEvery > 0 && (b + 1) % compactEvery == 0 && b + 1 < nBatches) {
        val tc = System.nanoTime()
        val written = StreamingImageDedup.compactIndex(spark, indexDir)
        val compactSec = (System.nanoTime() - tc) / 1e9
        println(s"""{"compact_after":$b,"compact_sec":${math.round(compactSec * 1000) / 1000.0},"files":$written}""")
      }
    }

    if (!skipBatchCheck && math.min(batchTo, nBatches - 1) == nBatches - 1) {
      val t1 = System.nanoTime()
      val batchPairs = Multimodal.imageDupPairs(corpus)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val batchN = batchPairs.count()
      val batchSec = (System.nanoTime() - t1) / 1e9
      // distinct() first: an at-least-once replay legally re-appends an
      // already-ingested batch's pairs (readers dedup, per the replay
      // spec), so a multiset exceptAll on the raw append log would report
      // a false mismatch after any resume that re-ran a batch. distinct()
      // also forgives a GENUINE duplicate-emission bug (a batch written
      // twice within one trigger), so the raw-vs-distinct delta is
      // reported alongside: a no-replay run must show delta 0, and a
      // replayed run's delta must equal the replayed batches' pair count.
      val rawPairs = spark.read.parquet(pairsDir)
      val rawRows = rawPairs.count()
      val incremental = rawPairs.distinct()
      val diff = incremental.exceptAll(batchPairs).count() +
        batchPairs.exceptAll(incremental).count()
      val distinctRows = incremental.count()
      println(s"""{"batch_q83_pairs_sec":${math.round(batchSec * 1000) / 1000.0},"batch_q83_pairs":$batchN,"incremental_pairs":${distinctRows},"raw_pair_rows":$rawRows,"replay_dup_rows":${rawRows - distinctRows},"incremental_equals_batch":${diff == 0L}}""")
    }
  }
}
