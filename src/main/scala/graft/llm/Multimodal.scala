package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque binary payload + typed metadata. The
  * binary column is the contract — image/audio/video travel as bytes with
  * schema-level metadata, never as parsed driver-side objects.
  */
case class MediaRecord(id: Long, kind: String, media: Array[Byte], declaredBytes: Long)

/** Features extracted per record by the batched decode path. The byte
  * statistics (nBytes/meanByte/headHex) exist for every payload; the image
  * fields are populated only when the payload actually decodes as an image
  * (None for audio/video kinds and for corrupt or unsupported bytes).
  */
case class MediaFeatures(
    id: Long, kind: String, nBytes: Long, meanByte: Double, headHex: String,
    width: Option[Int], height: Option[Int], meanLuma: Option[Double])

/** One sampled frame of a media payload: 1-row-in → N-rows-out shape. */
case class MediaFrame(id: Long, kind: String, frameIdx: Int, frame: Array[Byte])

/** Multimodal-column plumbing: binary payloads with typed metadata, and a
  * batched per-partition feature-extraction path — the Scala/Tungsten
  * analogue of a `mapInPandas` batch UDF (iterator-of-batches over
  * executor-local data, no driver round-trip).
  *
  * IMAGE DECODE IS REAL: [[decodeImage]] runs the JDK's own `javax.imageio`
  * readers (PNG/BMP/GIF/JPEG/WBMP ship with every JRE — zero external
  * dependencies), yielding width/height/mean-luminance, behind a
  * header-dimension pixel-budget guard ([[readImageGuarded]]) so hostile
  * payloads can't OOM an executor. Payloads no reader accepts — and
  * non-image kinds, which never attempt a decode — fall back
  * to the byte-statistics features only ([[decodeStub]], also the stand-in
  * for audio/video codecs this container lacks). The resize/frame-sample
  * payload transforms keep deterministic stubs ([[resizeStub]]) with the
  * real Spark-side shape.
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

  /** Pixel budget for [[readImageGuarded]]: 64 MP ≈ a 256 MB ARGB raster,
    * the most a single decode may allocate. Large enough for any sane
    * corpus image, small enough that a hostile header can't OOM an
    * executor core.
    */
  private[llm] val MaxImagePixels: Long = 64L * 1024 * 1024

  /** Header-guarded image read. `ImageIO.read` allocates the full
    * `BufferedImage` from the HEADER-DECLARED dimensions before any pixel
    * data streams, so a corrupt or hostile payload declaring huge
    * dimensions (a decompression bomb) raises `OutOfMemoryError` — which
    * no `catch Exception` sees — and kills the executor. On an untrusted
    * 100 TB corpus that is a denial-of-service row. So: pick the reader,
    * ask it for width/height (parses only the header), reject anything
    * over `maxPixels`, and only then decode. None for no-reader bytes,
    * over-budget declarations, and decode failures alike — callers fall
    * back to byte statistics. `ImageIO.setUseCache(false)` keeps
    * executors off temp-file staging — decode stays in-memory.
    */
  private[llm] def readImageGuarded(
      media: Array[Byte],
      maxPixels: Long = MaxImagePixels): Option[java.awt.image.BufferedImage] = {
    javax.imageio.ImageIO.setUseCache(false)
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      if (iis == null) None
      else
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis, true, true)
              val w = reader.getWidth(0).toLong
              val h = reader.getHeight(0).toLong
              if (w <= 0 || h <= 0 || w * h > maxPixels) None
              else Option(reader.read(0))
            } finally reader.dispose()
          }
        } finally iis.close()
    } catch {
      case _: Exception => None // unreadable bytes: byte-stats features only
    }
  }

  /** Real image decode via the JDK's `javax.imageio` readers. Returns
    * (width, height, mean Rec.601 luminance 0..255), or None when no
    * registered reader accepts the bytes (corrupt payload, or a format —
    * audio, video, exotic image codec — the JRE doesn't ship) or the
    * header declares more than [[MaxImagePixels]] ([[readImageGuarded]]'s
    * bomb guard). Luminance streams one pixel row at a time through a
    * reused buffer, so memory is O(width) regardless of image size.
    */
  private[llm] def decodeImage(media: Array[Byte]): Option[(Int, Int, Double)] = {
    try {
      readImageGuarded(media).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        var sum = 0.0
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            sum += 0.299 * ((rgb >> 16) & 0xff) +
              0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (w, h, sum / (w.toDouble * h))
      }
    } catch {
      case _: Exception => None // unreadable bytes: byte-stats features only
    }
  }

  /** Batched feature extraction: mapPartitions with an explicit batch size,
    * so per-batch setup cost (a real decoder's context, a model handle)
    * amortizes — the exact shape a mapInPandas/Arrow batch UDF gives
    * Python, here with JVM encoders instead of Arrow. Image-kind payloads
    * get the real [[decodeImage]] pass; everything else (and anything
    * unreadable) carries byte statistics only.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would live here
        batch.iterator.map { r =>
          val (mean, head) = decodeStub(r.media)
          val img = if (r.kind == "image") decodeImage(r.media) else None
          MediaFeatures(r.id, r.kind, r.media.length.toLong, mean, head,
            img.map(_._1), img.map(_._2), img.map(_._3))
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

  /** Real image downscale via JDK-only `Graphics2D`: decode (through
    * [[readImageGuarded]]'s pixel-budget bomb guard), scale so the longest
    * side is `maxDim` (never upscales), bilinear-interpolated draw,
    * re-encode as PNG. None when the bytes don't decode as an image.
    */
  private[llm] def rescaleImage(media: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    try {
      readImageGuarded(media)
        .map { img =>
          val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
          if (scale >= 1.0) media // already within bounds: bytes unchanged
          else {
            val w = math.max(1, math.round(img.getWidth * scale).toInt)
            val h = math.max(1, math.round(img.getHeight * scale).toInt)
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            bos.toByteArray
          }
        }
    } catch {
      case _: Exception => None
    }
  }

  /** REAL image resize over the media column: image-kind payloads that
    * decode are downscaled so their longest side is `maxDim` (bilinear,
    * re-encoded PNG — the standard thumbnail/feature-input prep step);
    * everything else passes through untouched. Same mapPartitions batch
    * shape as [[resize]], 1-row-in → 1-row-out, metadata tracks the new
    * payload.
    */
  def resizeImages(
      ds: Dataset[MediaRecord], maxDim: Int, batchSize: Int = 64): Dataset[MediaRecord] = {
    require(maxDim > 0, "maxDim must be positive")
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch scaler setup would live here
        batch.iterator.map { r =>
          val media =
            if (r.kind == "image") rescaleImage(r.media, maxDim).getOrElse(r.media)
            else r.media
          MediaRecord(r.id, r.kind, media, media.length.toLong)
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
