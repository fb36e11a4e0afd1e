package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-dedup — the ingest-time complement of the batch
  * [[graft.llm.Dedup.exact]] family: emit the FIRST arrival for each key,
  * drop later duplicates, with state bounded by the watermark.
  *
  * Built on `dropDuplicatesWithinWatermark`: state holds one entry per
  * distinct key seen within the watermark horizon and is evicted once the
  * event-time watermark passes, so a 100 TB/day ingest keeps
  * O(distinct keys per horizon) state instead of O(all keys ever) — the
  * deliberate trade is that a duplicate arriving AFTER its key's state was
  * evicted is re-emitted (exact global dedup needs the batch operator; this
  * is the standard bounded-state streaming semantics).
  *
  * `ts` follows the repo convention for the `events` table: long
  * nanoseconds (TIMESTAMP(NANOS) parquet read with `nanosAsLong`).
  */
object StreamingDedup {

  /** Batch twin of the dedup DECISION: one row per key with its min event
    * time. Output is keyCols + the ts column only — callers needing the
    * full first-arrival payload row should join this back on the keys.
    */
  def dedupBatch(df: DataFrame, tsColNs: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(tsColNs)).as(tsColNs))
      .select(keyCols.map(col) :+ col(tsColNs): _*)

  /** Streaming form: first occurrence per `keyCols` within the watermark
    * horizon; duplicates inside the horizon drop, state evicts as the
    * watermark advances.
    */
  def dedupStream(
      df: DataFrame, tsColNs: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    df
      .withColumn("ts_micro", timestamp_micros(expr(s"$tsColNs DIV 1000")))
      .withWatermark("ts_micro", watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
