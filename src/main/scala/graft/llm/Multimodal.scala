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
  * fields are populated only when the payload actually decodes as an image,
  * the audio fields only when it parses as RIFF/WAVE PCM (None otherwise —
  * wrong kind, corrupt bytes, unsupported codec).
  */
case class MediaFeatures(
    id: Long, kind: String, nBytes: Long, meanByte: Double, headHex: String,
    width: Option[Int], height: Option[Int], meanLuma: Option[Double],
    sampleRate: Option[Int], channels: Option[Int], durationMs: Option[Double],
    rms: Option[Double])

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
  * payloads can't OOM an executor. AUDIO DECODE IS REAL for RIFF/WAVE PCM:
  * [[decodeWav]] parses the container bytes directly (sample rate,
  * channels, duration, RMS — no codec library, no allocation beyond the
  * payload). Payloads neither path accepts — and kinds needing codecs this
  * container lacks (compressed audio, video) — fall back to the
  * byte-statistics features only ([[decodeStub]]). The frame-sample
  * payload transform keeps a deterministic stub ([[resizeStub]] /
  * [[sampleFrames]]) with the real Spark-side shape.
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

  /** Real audio decode for RIFF/WAVE PCM — a pure header-plus-samples byte
    * parse (the WAV container is public-spec plain bytes; no codec library
    * involved), yielding (sampleRate, channels, duration ms, RMS of the
    * normalized signal). None for anything that isn't well-formed PCM WAV:
    * wrong magic, truncated chunks, compressed `fmt ` codes, or bit depths
    * other than 8/16.
    *
    * Bomb-safety mirrors [[readImageGuarded]]'s stance but needs no pixel
    * budget: the parse only ever walks bytes ALREADY in the payload array
    * (a declared `data` size is clamped to what is physically present), so
    * a hostile header can overstate sizes without forcing any allocation.
    */
  private[llm] def decodeWav(media: Array[Byte]): Option[(Int, Int, Double, Double)] = {
    def u16(i: Int): Int = (media(i) & 0xff) | ((media(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    def tag(i: Int): String = new String(media.slice(i, i + 4), "US-ASCII")
    try {
      if (media.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
      var data: Option[(Int, Int)] = None // (offset, length clamped to payload)
      while (pos + 8 <= media.length && (fmt.isEmpty || data.isEmpty)) {
        val id = tag(pos)
        val declared = u32(pos + 4)
        val len = math.min(declared, (media.length - pos - 8).toLong).toInt
        if (id == "fmt " && len >= 16) {
          val audioFormat = u16(pos + 8)
          if (audioFormat != 1) return None // PCM only
          fmt = Some((u16(pos + 10), u32(pos + 12).toInt, u16(pos + 22)))
        } else if (id == "data") {
          data = Some((pos + 8, len))
        }
        pos += 8 + len + (len & 1) // chunks are word-aligned
      }
      for {
        (channels, sampleRate, bits) <- fmt
        (off, len) <- data
        if channels > 0 && sampleRate > 0 && (bits == 8 || bits == 16)
      } yield {
        val bytesPerSample = bits / 8
        val nSamples = len / bytesPerSample
        val nFrames = nSamples / channels
        var sumSq = 0.0
        var i = 0
        while (i < nSamples) {
          val v =
            if (bits == 16) u16(off + i * 2).toShort / 32768.0
            else ((media(off + i) & 0xff) - 128) / 128.0
          sumSq += v * v
          i += 1
        }
        val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
        (sampleRate, channels, nFrames * 1000.0 / sampleRate, rms)
      }
    } catch {
      case _: Exception => None // malformed container: byte-stats only
    }
  }

  /** Batched feature extraction: mapPartitions with an explicit batch size,
    * so per-batch setup cost (a real decoder's context, a model handle)
    * amortizes — the exact shape a mapInPandas/Arrow batch UDF gives
    * Python, here with JVM encoders instead of Arrow. Image-kind payloads
    * get the real [[decodeImage]] pass, audio-kind payloads the real
    * [[decodeWav]] parse; everything else (and anything unreadable)
    * carries byte statistics only.
    */
  def extractFeatures(ds: Dataset[MediaRecord], batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would live here
        batch.iterator.map { r =>
          val (mean, head) = decodeStub(r.media)
          val img = if (r.kind == "image") decodeImage(r.media) else None
          val wav = if (r.kind == "audio") decodeWav(r.media) else None
          MediaFeatures(r.id, r.kind, r.media.length.toLong, mean, head,
            img.map(_._1), img.map(_._2), img.map(_._3),
            wav.map(_._1), wav.map(_._2), wav.map(_._3), wav.map(_._4))
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

  /** Perceptual difference-hash (dHash, public image-dedup practice: a
    * 64-bit row-wise gradient sign over a 9×8 downscale — robust to
    * re-encoding, resizing, and small edits, which byte-level dedup
    * misses entirely). The downscale is a pure integer-bucketed area
    * average over the decoded pixels — deliberately NOT `Graphics2D`
    * (whose interpolation is JVM/platform-dependent), so the hash is
    * bit-identical on every executor and across reruns, the property
    * every blocking key in this repo must have. None when the bytes
    * don't decode ([[readImageGuarded]]'s bomb guard included) or the
    * image is smaller than the 9×8 grid (no meaningful gradient exists).
    */
  private[llm] def dhash(media: Array[Byte]): Option[Long] = {
    val gw = 9
    val gh = 8
    try {
      readImageGuarded(media).flatMap { img =>
        val w = img.getWidth
        val h = img.getHeight
        if (w < gw || h < gh) None
        else {
          val sums = Array.ofDim[Double](gh, gw)
          val counts = Array.ofDim[Long](gh, gw)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            val gy = (y.toLong * gh / h).toInt
            var x = 0
            while (x < w) {
              val gx = (x.toLong * gw / w).toInt
              val rgb = row(x)
              sums(gy)(gx) += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              counts(gy)(gx) += 1
              x += 1
            }
            y += 1
          }
          var bits = 0L
          var i = 0
          var gy = 0
          while (gy < gh) {
            var gx = 0
            while (gx < gw - 1) {
              if (sums(gy)(gx) / counts(gy)(gx) <
                  sums(gy)(gx + 1) / counts(gy)(gx + 1)) bits |= 1L << i
              i += 1
              gx += 1
            }
            gy += 1
          }
          Some(bits)
        }
      }
    } catch {
      case _: Exception => None // unreadable bytes: no hash, row drops out
    }
  }

  /** One (id, dhash) row per payload that decodes as a ≥9×8 image — the
    * batched mapPartitions decode shape of [[extractFeatures]] (binary
    * decode is the one justified mapPartitions site), emitting the
    * narrow hash frame every downstream pairing step runs on. Rows whose
    * payload isn't a decodable image drop out here, so the expensive
    * banding never sees them.
    */
  def imageHashes(ds: Dataset[MediaRecord], batchSize: Int = 64): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch decoder setup would live here
        batch.iterator.flatMap(r => dhash(r.media).map(dh => (r.id, dh)))
      }
    }.toDF("id", "dhash")
  }

  /** Near-duplicate IMAGE pairs: dHash every decodable payload, then run
    * the hashes through the exact banded machinery text SimHash uses
    * ([[Dedup.simhashPairs]] with the identity sketch — the pigeonhole
    * band join, the observable hot-bucket cap, and the exact final
    * Hamming verify are shared code, so image and text near-dup can
    * never drift in blocking semantics). Defaults: 64-bit hash in 8
    * bands of 8 ⇒ any pair within Hamming 7 shares a band by
    * pigeonhole; `maxHamming = 6` keeps the guarantee with margin.
    *
    * Scale shape is [[Dedup.simhashPairs]]'s: one decode pass, band
    * explode on 16-byte rows, capped bucket self-join — never all-pairs
    * on the corpus. Not SQL-expressible (the hash needs a real pixel
    * decode), so correctness is spec-pinned like [[overlapBloom]]:
    * determinism, identical-image Hamming 0, small-edit locality, and
    * the shared-band guarantee are asserted in `MultimodalSpec`.
    */
  def imageDupPairs(
      ds: Dataset[MediaRecord],
      bands: Int = 8,
      maxHamming: Int = 6,
      maxBucketSize: Int = 10000): DataFrame =
    Dedup.simhashPairs(imageHashes(ds), "id", "dhash",
      bits = 64, bands = bands, maxHamming = maxHamming,
      sketchOf = (c, _) => c, maxBucketSize = maxBucketSize)

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
