package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{EventsVerificationPipeline, VerificationParams}
import graft.operators.{Completeness, Report, SpecParse}

/** The flagship 13-column events-verification report (q06) maintained
  * INCREMENTALLY over arriving catalog partitions — the `foreachBatch`
  * member of the persisted-artifact family ([[StreamingDistinct]]'s sketch
  * table, [[StreamingNearDedup]]'s band index).
  *
  * Why this works: the report is algebraic. Its two data-scale inputs —
  * (channel, event, key) counts and (channel, version, event, prop)
  * value-completeness counts — are ADDITIVE over disjoint catalog slices,
  * so each trigger reduces its micro-batch to those partials
  * ([[EventsVerificationPipeline.prepare]], the same oracle-checked
  * derivation q06 runs, then [[Completeness.partialMetrics]]) and appends
  * them to a parquet partials table. [[reportToDate]] merges by summation
  * and applies the tiny spec joins + derived columns — identical math to
  * batch q06 over the union of the batches (pinned by StreamingReportSpec:
  * two triggers ≡ one batch run, row for row).
  *
  * State per trigger is |spec cells| × |batches| partial rows — bounded by
  * config size, never data volume; raw catalog rows are touched exactly
  * once, at arrival. At 100 TB the daily report becomes an append of
  * yesterday's partials instead of a full recompute.
  *
  * The one NON-algebraic ingredient is the observed-identifier-key rlike
  * flags (reference quirk, `event_verify.py:51-76`): a spelling first
  * observed in batch N could substring-match rows of batch N-1 that were
  * already counted without it. The maintainer therefore persists the
  * observed-key set and folds it into every later batch
  * (`observedToDate`), which makes incremental ≡ batch EXACT whenever each
  * channel's identifier-key vocabulary is stable across the stream (the
  * fixtures are; a genuinely new spelling mid-stream requires a replay,
  * which the partials layout makes cheap — drop the dirs, re-ingest).
  *
  * At-least-once caveat: unlike the HLL sketch table, summed partials are
  * NOT replay-idempotent — a re-delivered batch double-counts. Exactly-once
  * here comes from Structured Streaming's checkpointed batch IDs: the sink
  * skips batch IDs it has already committed (recorded in `$dir/_committed`),
  * the same transactional-sink convention Spark documents for foreachBatch.
  */
object StreamingReport {

  private def keysDir(dir: String) = s"$dir/keys"
  private def valuesDir(dir: String) = s"$dir/values"
  private def observedDir(dir: String) = s"$dir/observed"
  private def committedDir(dir: String) = s"$dir/_committed"

  /** Reduce one micro-batch of catalog rows to its additive partials and
    * append them; `batchId` makes redelivery a no-op. Returns true when the
    * batch was ingested, false when it was a replay skip.
    */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      spec: DataFrame,
      params: VerificationParams,
      dir: String): Boolean = {
    val spark = batch.sparkSession
    if (committedIds(spark, dir).contains(batchId)) return false
    // heal before appending: appending into the live-dir-missing state of
    // an interrupted [[compactPartials]] swap would create a fresh dir
    // that the next heal treats as authoritative, discarding the parked
    // compacted generation (the StreamingNearDedup.ingestBatch lesson)
    AtomicState.heal(spark, keysDir(dir))
    AtomicState.heal(spark, valuesDir(dir))
    val p = EventsVerificationPipeline.prepare(
      batch, spec, params, readObserved(spark, dir))
    try {
      p.keyCounts.write.mode("append").parquet(keysDir(dir))
      Completeness.partialMetrics(p.longDefined, Seq("channel", "version", "event_name"))
        .write.mode("append").parquet(valuesDir(dir))
      writeObserved(spark, p.observed, dir)
      // commit marker LAST: a crash mid-ingest leaves the batch uncommitted
      // and the retry overwrites observed/ and re-appends partials — the
      // append before a missing marker is the one at-most-once gap, closed
      // the usual way (batchId-named subdirs) if a deployment needs it.
      import spark.implicits._
      Seq(batchId).toDF("batch_id").write.mode("append").parquet(committedDir(dir))
      true
    } finally p.cat.unpersist(false)
  }

  /** The `foreachBatch` function:
    * `catalogStream.writeStream.foreachBatch(StreamingReport.sink(spec, params, dir)).start()`.
    */
  def sink(
      spec: DataFrame,
      params: VerificationParams,
      dir: String): (DataFrame, Long) => Unit =
    (batch, id) => { ingestBatch(batch, id, spec, params, dir); () }

  /** The full 13-column report over everything ingested so far: sum the
    * partials, then the same spec joins + derived columns as batch
    * [[EventsVerificationPipeline.run]]. Precondition: at least one
    * committed trigger ([[hasPartials]]).
    */
  def reportToDate(
      spark: SparkSession,
      spec: DataFrame,
      params: VerificationParams,
      dir: String): DataFrame = {
    // roll an interrupted [[compactPartials]] swap forward before reading
    // (cheap no-op when healthy) — without this, a crash mid-swap would
    // leave the live dir missing and the report would fail or undercount
    AtomicState.heal(spark, keysDir(dir))
    AtomicState.heal(spark, valuesDir(dir))
    val info = EventsVerificationPipeline.parseSpec(spec, params)
    val keyCounts = spark.read.parquet(keysDir(dir))
      .groupBy("channel", "event_name", "exploded_key")
      .agg(sum("key_count").as("key_count"))
    val valueM = Completeness.mergedMetrics(
      spark.read.parquet(valuesDir(dir)), Seq("channel", "version", "event_name"))
    val keyM = Report.keyMetrics(
      SpecParse.pairsDf(spark, info.keyPairs).drop("version"),
      keyCounts, Seq("channel", "event_name"))
    Report.assemble(valueM, keyM, Seq("channel", "event_name"),
      col("channel"), col("version"), params.processDate, params.eventDate)
  }

  /** True once at least one trigger committed (same committed-data-file
    * guard as [[StreamingDistinct.hasSketches]] — the dir alone can exist
    * mid-write).
    */
  def hasPartials(spark: SparkSession, dir: String): Boolean = {
    AtomicState.heal(spark, committedDir(dir))
    hasCommittedFile(spark, committedDir(dir))
  }

  /** Compact the append-only partials — each trigger appends a handful of
    * part files to keys/values/_committed forever, and scan planning over
    * the accumulated mess is the measured O(triggers) term every
    * [[reportToDate]] pays (the same file-count creep
    * `StreamingNearDedup.compactIndex` was built for; BASELINE.md r13).
    * Row-level no-op: files are merged range-laid on the group keys, so
    * the summed partials — and therefore the report — are unchanged.
    * Each dir swaps through the [[AtomicState]] protocol independently; a
    * crash anywhere leaves every dir recoverable, and readers heal first.
    * Run it on a maintenance cadence between triggers, never concurrently
    * with the sink (the usual log-structured-store contract).
    */
  def compactPartials(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 0): Map[String, Int] =
    Seq(
      "keys" -> (keysDir(dir), Seq("channel", "event_name", "exploded_key")),
      "values" -> (valuesDir(dir), Seq("channel", "version", "event_name")),
      "_committed" -> (committedDir(dir), Seq("batch_id"))
    ).map { case (name, (path, sortCols)) =>
      name -> AtomicState.compactSwap(spark, path, sortCols, targetFileBytes, minFiles)
    }.toMap

  private def committedIds(spark: SparkSession, dir: String): Set[Long] = {
    AtomicState.heal(spark, committedDir(dir))
    if (!hasCommittedFile(spark, committedDir(dir))) Set.empty
    else spark.read.parquet(committedDir(dir))
      .collect().map(_.getLong(0)).toSet
  }

  private def readObserved(
      spark: SparkSession, dir: String): Map[String, Seq[String]] = {
    // roll a half-finished writeObserved swap forward/back first: after a
    // crash mid-swap the committed generation lives in observed.new/.old
    AtomicState.heal(spark, observedDir(dir))
    if (!hasCommittedFile(spark, observedDir(dir))) Map.empty
    else spark.read.parquet(observedDir(dir))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getString(1)).toSeq.distinct.sorted).toMap
  }

  private def writeObserved(
      spark: SparkSession, observed: Map[String, Seq[String]], dir: String): Unit = {
    import spark.implicits._
    // tiny (channels × spellings); overwrite keeps it a set, not a log.
    // Through the AtomicState swap, NOT a plain mode("overwrite"): the
    // observed set folds into EVERY later batch's rlike flags, so losing
    // it to a crash mid-rewrite would silently change incremental-vs-batch
    // semantics for the rest of the stream (prior spellings forgotten),
    // with nothing downstream able to detect the loss.
    AtomicState.overwrite(
      observed.toSeq.flatMap { case (ch, ks) => ks.map(ch -> _) }
        .toDF("channel", "key"),
      observedDir(dir))
  }

  private def hasCommittedFile(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      val n = st.getPath.getName
      st.isFile && n.startsWith("part-") && n.endsWith(".parquet") && st.getLen > 0
    }
  }
}
