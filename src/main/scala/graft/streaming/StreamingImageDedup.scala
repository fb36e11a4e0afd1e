package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.llm.{Dedup, MediaRecord, Multimodal}

/** The OPERATIONAL form of image near-dup (q83) — the
  * [[StreamingNearDedup]] ingest discipline over perceptual-hash
  * signatures: each arriving micro-batch of media payloads is decoded and
  * dHashed ONCE ([[Multimodal.imageHashes]], the batched mapPartitions
  * decode), probed against the persisted banded signature index of
  * everything ingested so far, verified-pair rows appended to an output
  * table, and the batch's own banded rows folded into the index for the
  * next trigger.
  *
  * Index layout (plain parquet, readable by any later batch job):
  * `<indexDir>/bands` holds (id, sk, band, bv) rows
  * ([[Dedup.simhashBandFrame]] of the 64-bit dHashes). ONE table — unlike
  * the lexical loop's bands+shingles split, the signature is its own
  * verifier, so the probe join carries everything the exact Hamming check
  * needs. Appends only; [[compactIndex]] is the maintenance step, through
  * the same [[AtomicState]] crash protocol, and [[Dedup
  * .incrementalSimhashPairsFromArtifacts]] shares the one-shot q64/q83
  * banding machinery, so batch and streaming blocking semantics cannot
  * drift.
  *
  * Failure semantics: `foreachBatch` at-least-once, same as the lexical
  * loop — a replayed batch re-appends pairs (downstream dedupes on
  * (id_a, id_b)) and its band rows; the id-inequality guard in the cross
  * join keeps a replayed image from pairing with its own indexed copy.
  *
  * Batch shape per trigger: one decode pass over the batch, one
  * band-bucket probe join against the index (index side capped per
  * bucket), one within-batch self-join (capped) — per-trigger cost scales
  * with the batch, never the corpus, the claim `StreamingSpec`'s
  * cumulative ≡ one-shot check and the kill-and-resume spec pin.
  */
object StreamingImageDedup {

  /** Run one ingest step over an already-hashed batch frame (id, dhash):
    * append verified pairs touching the batch to `pairsDir`, fold the
    * batch's banded rows into `indexDir`. Returns the number of pairs
    * appended. Kept hash-frame-shaped so specs and backfills can drive it
    * without binary payloads; [[pairSink]] adds the decode step.
    */
  def ingestBatch(
      batchHashes: DataFrame,
      indexDir: String,
      pairsDir: String,
      bits: Int = 64,
      bands: Int = 8,
      maxHamming: Int = 6,
      maxBucketSize: Int = 10000): Long = {
    val spark = batchHashes.sparkSession
    val bandsPath = s"$indexDir/bands"
    // Heal BEFORE reading or appending (the StreamingNearDedup rule): a
    // compaction swap that crashed between renames would otherwise leave
    // this trigger probing an empty index and seeding a fresh directory
    // that the next heal would treat as authoritative.
    AtomicState.heal(spark, bandsPath)

    val sigs = batchHashes.select(col("id"), col("dhash").as("sk"))
    val batchBands = Dedup.simhashBandFrame(sigs, bits, bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = new org.apache.hadoop.fs.Path(bandsPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val indexBands =
      if (fs.exists(p)) spark.read.parquet(bandsPath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batchBands.schema)

    val pairs = Dedup.incrementalSimhashPairsFromArtifacts(
        indexBands, batchBands, maxHamming, maxBucketSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = pairs.count()
    pairs.write.mode("append").parquet(pairsDir)
    // fold the batch into the index AFTER probing (within-batch pairs
    // came from the self-join; a batch never pairs with itself through
    // the index)
    batchBands.write.mode("append").parquet(bandsPath)
    pairs.unpersist(false)
    batchBands.unpersist(false)
    n
  }

  /** Compact the append-only band index — [[StreamingNearDedup
    * .compactIndex]]'s contract on the single signature table: rewritten
    * range-laid on the probe key (band, bv) so row-group pruning works,
    * file count floored at `minFiles`, swapped through [[AtomicState]].
    */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 0): Int =
    AtomicState.compactSwap(
      spark, s"$indexDir/bands", Seq("band", "bv", "id"),
      targetFileBytes, minFiles)

  /** The `foreachBatch` function over a [[MediaRecord]] stream: decode +
    * dHash the batch, then [[ingestBatch]].
    */
  def pairSink(
      indexDir: String,
      pairsDir: String,
      bits: Int = 64,
      bands: Int = 8,
      maxHamming: Int = 6,
      maxBucketSize: Int = 10000): (Dataset[MediaRecord], Long) => Unit =
    (batch, _) => {
      ingestBatch(Multimodal.imageHashes(batch), indexDir, pairsDir,
        bits, bands, maxHamming, maxBucketSize)
      ()
    }
}
