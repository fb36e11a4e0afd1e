package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.llm.Dedup

/** The OPERATIONAL form of incremental near-dup
  * ([[graft.llm.Dedup.incrementalMinhashPairs]], q41): a `foreachBatch`
  * ingest loop that probes every arriving micro-batch against the
  * persisted LSH index of everything ingested so far, appends the verified
  * near-dup pairs to an output table, and folds the batch's own artifacts
  * into the index for the next trigger.
  *
  * Index layout (plain parquet — readable by any later batch job):
  * `<indexDir>/bands` holds (id, band_id, band_hash) rows
  * ([[Dedup.bandFrame]]), `<indexDir>/shingles` holds (id, shingles) rows
  * ([[Dedup.shingleFrame]], needed for exact-Jaccard verification). Both
  * grow by append only; at 100 TB they are exactly the artifacts a batch
  * backfill would bucket/compact ([[graft.sources.Compaction]]).
  *
  * Failure semantics: `foreachBatch` gives at-least-once. A replayed batch
  * re-appends its pairs and artifacts, so downstream consumers dedupe on
  * (id_a, id_b) — the standard idempotent-reader convention for appended
  * pair logs; exactly-once needs a transactional table format, which is
  * out of scope for plain parquet.
  *
  * Batch shape per trigger: sign the batch once (persisted), one probe
  * join against the index bands (index-side hot-bucket cap applies), one
  * within-batch self-join (capped), one verification join — the q41 plan,
  * with per-trigger cost scaling in the batch, never the corpus.
  */
object StreamingNearDedup {

  /** Run one ingest step: emit verified pairs touching `batch` to
    * `pairsDir` (append), then fold the batch's bands+shingles into
    * `indexDir`. Usable directly on any batch DataFrame, or as the body of
    * [[pairSink]]. Returns the number of pairs appended (the one bounded
    * driver-side value an ingest monitor wants per trigger).
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      pairsDir: String,
      shingleSize: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      maxBucketSize: Int = 10000): Long = {
    val spark = batch.sparkSession
    val bandsPath = s"$indexDir/bands"
    val shinglesPath = s"$indexDir/shingles"

    val shingled = Dedup.shingleFrame(batch, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batchBands = Dedup
      .bandFrame(Dedup.withSignature(shingled, numHashes), numHashes, rowsPerBand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def readOrEmpty(path: String, like: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(path)
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        like.schema)
    }
    val pairs = Dedup.incrementalMinhashPairsFromArtifacts(
      readOrEmpty(bandsPath, batchBands), readOrEmpty(shinglesPath, shingled),
      batchBands, shingled, threshold, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val n = pairs.count()
    pairs.write.mode("append").parquet(pairsDir)
    // fold the batch into the index AFTER probing it (a batch never pairs
    // with itself through the index — within-batch pairs covered that)
    batchBands.write.mode("append").parquet(bandsPath)
    shingled.write.mode("append").parquet(shinglesPath)
    pairs.unpersist(false)
    batchBands.unpersist(false)
    shingled.unpersist(false)
    n
  }

  /** The `foreachBatch` function: `stream.writeStream.foreachBatch(
    * StreamingNearDedup.pairSink(...)).start()`.
    */
  def pairSink(
      idCol: String,
      textCol: String,
      indexDir: String,
      pairsDir: String,
      shingleSize: Int = 3,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      threshold: Double = 0.5,
      maxBucketSize: Int = 10000): (DataFrame, Long) => Unit =
    (batch, _) => {
      ingestBatch(batch, idCol, textCol, indexDir, pairsDir,
        shingleSize, numHashes, rowsPerBand, threshold, maxBucketSize)
      ()
    }
}
