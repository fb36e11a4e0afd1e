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

/** One sampled frame of a media payload: 1-row-in → N-rows-out shape. */
case class MediaFrame(id: Long, kind: String, frameIdx: Int, frame: Array[Byte])

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

  /** STUB resize — deterministic byte decimation standing in for a real
    * image rescale: keep every `factor`-th byte, preserving the head. A real
    * implementation decodes, rescales pixels, re-encodes; the row shape
    * (1 → 1, payload shrinks, metadata updated) is what Spark sees either
    * way.
    */
  private[llm] def resizeStub(media: Array[Byte], factor: Int): Array[Byte] =
    media.grouped(factor).map(_.head).toArray

  /** Batched media resize: same mapPartitions batch shape as
    * [[extractFeatures]] (per-batch decoder/scaler setup amortizes).
    * `declaredBytes` is updated to the resized length so downstream
    * metadata stays truthful.
    */
  def resize(ds: Dataset[MediaRecord], factor: Int, batchSize: Int = 64): Dataset[MediaRecord] = {
    require(factor > 0, "factor must be positive")
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch scaler setup would live here
        batch.iterator.map { r =>
          val resized = resizeStub(r.media, factor)
          MediaRecord(r.id, r.kind, resized, resized.length.toLong)
        }
      }
    }(Encoders.product[MediaRecord])
  }

  /** STUB frame extraction — fixed-size byte windows standing in for video
    * frame decode: the payload splits into `frameBytes` chunks ("frames"),
    * of which every `stride`-th is kept. The 1-row-in → N-rows-out flatMap
    * shape, encoder, and batch amortization are the real contract a codec
    * implementation would inherit.
    */
  def sampleFrames(
      ds: Dataset[MediaRecord], frameBytes: Int, stride: Int,
      batchSize: Int = 64): Dataset[MediaFrame] = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch demuxer setup would live here
        batch.iterator.flatMap { r =>
          r.media.grouped(frameBytes).zipWithIndex
            .collect { case (frame, i) if i % stride == 0 =>
              MediaFrame(r.id, r.kind, i, frame)
            }
        }
      }
    }(Encoders.product[MediaFrame])
  }

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
