package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** The OPERATIONAL form of semantic dedup
  * ([[graft.llm.Similarity.semanticClusters]], q48): a `foreachBatch`
  * ingest loop that probes every arriving micro-batch of vectors against
  * the persisted vector index of everything ingested so far, appends the
  * over-threshold cosine pairs to an output table, and folds the batch's
  * vectors into the index for the next trigger — the embedding-space twin
  * of [[StreamingNearDedup]]'s lexical loop.
  *
  * Index layout (plain parquet): `<indexDir>/vectors` holds
  * (id, emb DOUBLE[], block) rows. Append-only between maintenance;
  * [[compactIndex]] rewrites it block-key-sorted on whatever cadence
  * keeps the file count bounded, so the per-trigger probe join plans a
  * bounded scan and row-group pruning works on the block key.
  *
  * Failure semantics match [[StreamingNearDedup]]: `foreachBatch` is
  * at-least-once, so a replayed batch re-appends its pairs and vectors;
  * downstream consumers dedupe on (id_a, id_b). The probe join carries an
  * id-inequality predicate so a replayed vector — already in the index —
  * never pairs with itself.
  *
  * Batch shape per trigger: one block-keyed self-join within the batch
  * (O(batch-block²)), one block-keyed probe join batch×index (the index
  * side never self-joins — index-internal pairs were emitted when those
  * vectors arrived), one append each for pairs and vectors. Per-trigger
  * cost scales with the batch's block overlap, never the corpus.
  */
object StreamingSemanticDedup {

  /** Run one ingest step: emit over-threshold pairs touching `batch` to
    * `pairsDir` (append), fold the batch's vectors into `indexDir`.
    * Returns the number of pairs appended (the per-trigger monitor
    * signal, as in [[StreamingNearDedup.ingestBatch]]).
    */
  def ingestBatch(
      batch: DataFrame,
      idCol: String,
      embCol: String,
      blockCol: String,
      indexDir: String,
      pairsDir: String,
      threshold: Double = 0.9): Long = {
    val spark = batch.sparkSession
    val vectorsPath = s"$indexDir/vectors"
    // Heal BEFORE reading or appending (same crash window as
    // [[StreamingNearDedup.ingestBatch]]): an interrupted [[compactIndex]]
    // swap leaves the live dir missing and the committed rewrite at
    // `.new`; probing without healing would miss every cross pair this
    // trigger and the fresh append would doom the parked index.
    AtomicState.heal(spark, vectorsPath)

    val b = batch.select(
      col(idCol).as("id"),
      Similarity.asDouble(col(embCol)).as("emb"),
      col(blockCol).as("block"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def readOrEmpty(path: String, like: DataFrame): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) spark.read.parquet(path)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], like.schema)
    }
    val index = readOrEmpty(vectorsPath, b)

    // within-batch pairs ARE the q48 batch operator on the batch frame —
    // one implementation, so the rounding/threshold convention can never
    // drift between the batch and streaming paths
    val within = Similarity.cosinePairs(b, "id", "emb", col("block"), threshold)
    // id inequality: a replayed vector's copy already sits in the index
    // (the at-least-once case) and must not pair with itself
    val cross = b.as("n")
      .join(index.as("i"),
        col("n.block") === col("i.block") && col("n.id") =!= col("i.id"))
      .withColumn("score", round(Similarity.fusedCosine(col("n.emb"), col("i.emb")), 6))
      .filter(col("score") >= threshold)
      .select(
        least(col("n.id"), col("i.id")).as("id_a"),
        greatest(col("n.id"), col("i.id")).as("id_b"),
        col("score"))
    // distinct over the union: under replay the same canonical pair can
    // arrive via within AND via both probe directions — one trigger must
    // still append each pair at most once (cross-trigger duplicates remain
    // the documented reader-side concern)
    val pairs = within.union(cross).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val n = pairs.count()
    pairs.write.mode("append").parquet(pairsDir)
    // fold the batch into the index AFTER probing it (a batch never pairs
    // with itself through the index — the within join covered that)
    b.write.mode("append").parquet(vectorsPath)
    pairs.unpersist(false)
    b.unpersist(false)
    n
  }

  /** Compact the append-only vector index — the same maintenance the
    * lexical loop's [[StreamingNearDedup.compactIndex]] ships, with the
    * same measured rationale (the per-trigger O(index) term is the
    * accumulating part-file count, and the rewrite must keep at least
    * `defaultParallelism` files — BASELINE.md r13). Vectors are
    * range-laid on (block, id), so after compaction the per-trigger
    * probe join's index scan gets row-group min/max pruning on the
    * block key — the scaladoc's "compact and bucket BY THE BLOCK KEY"
    * made operational. Swapped in through the [[AtomicState]] protocol;
    * crash mid-compaction never loses the index.
    */
  def compactIndex(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 0): Map[String, Int] =
    Map("vectors" -> AtomicState.compactSwap(
      spark, s"$indexDir/vectors", Seq("block", "id"), targetFileBytes, minFiles))

  /** The `foreachBatch` function: `stream.writeStream.foreachBatch(
    * StreamingSemanticDedup.pairSink(...)).start()`.
    */
  def pairSink(
      idCol: String,
      embCol: String,
      blockCol: String,
      indexDir: String,
      pairsDir: String,
      threshold: Double = 0.9): (DataFrame, Long) => Unit =
    (batch, _) => {
      ingestBatch(batch, idCol, embCol, blockCol, indexDir, pairsDir, threshold)
      ()
    }
}
