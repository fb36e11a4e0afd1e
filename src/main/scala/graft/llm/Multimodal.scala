package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata. The
  * binary column is the contract — image/audio/video travel as bytes with
  * schema-level metadata, never as parsed driver-side objects.
  */
case class MediaRecord(id: Long, kind: String, media: Array[Byte], declaredBytes: Long)

/** Features extracted per record by the batched decode path. */
case class MediaFeatures(id: Long, kind: String, nBytes: Long, meanByte: Double, headHex: String)

/** Multimodal-column plumbing: binary payloads with typed metadata, and a
  * batched per-partition feature-extraction path — the Scala/Tungsten
  * analogue of a `mapInPandas` batch UDF (iterator-of-batches over
  * executor-local data, no driver round-trip).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB: this container has no
  * image/audio codec libraries, so [[decodeStub]] computes fake-but-stable
  * "decoded" features (byte statistics) in place of a real
  * JPEG/PNG/audio-frame decode. The Spark-side plumbing — schema, encoder,
  * partitioning, batch shape — is real and tested; swap [[decodeStub]] for
  * a codec call to productionize.
  */
object Multimodal {

  /** Deterministic media synthesis from the `documents` table: UTF-8 bytes
    * of the text stand in for an encoded image/audio payload.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val df = docs.select(
      col("doc_id").as("id"),
      (when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio"))).as("kind"),
      encode(col("text"), "utf-8").as("media"),
      length(col("text")).cast("long").as("declaredBytes"))
    df.as(Encoders.product[MediaRecord])
  }

  /** STUB decode — deterministic byte statistics standing in for a real
    * codec. Replace with an actual decoder where codec libs exist.
    */
  private[llm] def decodeStub(media: Array[Byte]): (Double, String) = {
    val mean =
      if (media.isEmpty) 0.0
      else media.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / media.length
    val head = media.take(8).map(b => f"${b & 0xff}%02x").mkString
    (mean, head)
  }

  /** Batched feature extraction: mapPartitions with an explicit batch size,
    * so per-batch setup cost (a real decoder's context, a model handle)
    * amortizes — the exact shape a mapInPandas/Arrow batch UDF gives
    * Python, here with JVM encoders instead of Arrow.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would live here
        batch.iterator.map { r =>
          val (mean, head) = decodeStub(r.media)
          MediaFeatures(r.id, r.kind, r.media.length.toLong, mean, head)
        }
      }
    }(Encoders.product[MediaFeatures])

  /** Declarative (oracle-able) feature projection over the same binary
    * column: pure built-in expressions, no stub — the path to prefer when
    * features are expressible in SQL (stays inside codegen).
    */
  def binaryFeatures(docs: DataFrame): DataFrame = {
    val bin = encode(col("text"), "utf-8")
    docs.select(
      col("doc_id"),
      octet_length(bin).as("n_bytes"),
      substring(upper(hex(bin)), 1, 16).as("head_hex"))
  }
}
