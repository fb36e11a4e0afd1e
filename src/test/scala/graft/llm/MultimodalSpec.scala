package graft.llm

import graft.SparkTestBase
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("mediaFromDocuments: binary payload matches declared metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val rows = media.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.media.length.toLong == r.declaredBytes),
      "utf-8 bytes of ascii-only text must equal char length")
    assert(rows.forall(r => r.kind == (if (r.id % 2 == 0) "image" else "audio")))
  }

  test("extractFeatures: batched decode path is deterministic and batch-size independent") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val f1 = Multimodal.extractFeatures(media, batchSize = 1).collect().sortBy(_.id)
    val f64 = Multimodal.extractFeatures(media, batchSize = 64).collect().sortBy(_.id)
    assert(f1.toSeq == f64.toSeq, "batch shape must not change results")
    assert(f1.forall(f => f.meanByte > 0 && f.meanByte < 256))
    assert(f1.forall(f => f.headHex.length == 16))
  }

  test("resize: shrinks payloads by the factor, updates metadata, batch-size independent") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val before = media.collect().map(r => r.id -> r.media.length).toMap
    val r1 = Multimodal.resize(media, factor = 4, batchSize = 1).collect().sortBy(_.id)
    val r64 = Multimodal.resize(media, factor = 4, batchSize = 64).collect().sortBy(_.id)
    assert(r1.map(r => (r.id, r.media.toSeq, r.declaredBytes)).toSeq ==
      r64.map(r => (r.id, r.media.toSeq, r.declaredBytes)).toSeq)
    assert(r1.forall(r => r.media.length == (before(r.id) + 3) / 4),
      "every 4th byte kept (ceil division)")
    assert(r1.forall(r => r.declaredBytes == r.media.length.toLong),
      "metadata must track the resized payload")
  }

  test("sampleFrames: 1-row-in N-rows-out, stride respected, frames reassemble the sampled bytes") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, dir))
    val frames = Multimodal.sampleFrames(media, frameBytes = 16, stride = 2).collect()
    val byId = frames.groupBy(_.id)
    val originals = media.collect().map(r => r.id -> r.media).toMap
    byId.foreach { case (id, fs) =>
      val nChunks = (originals(id).length + 15) / 16
      assert(fs.map(_.frameIdx).sorted.toSeq == (0 until nChunks by 2).toSeq,
        s"doc $id: kept frame indices must be every 2nd chunk")
      fs.foreach { f =>
        val expected = originals(f.id).slice(f.frameIdx * 16, f.frameIdx * 16 + 16)
        assert(f.frame.toSeq == expected.toSeq, s"frame ${f.frameIdx} of doc $id drifted")
      }
    }
  }

  test("extractFeatures: real PNG/BMP payloads decode to true dimensions and luminance") {
    import spark.implicits._
    // 8x4 solid color (R=100, G=150, B=200): Rec.601 luma is exactly
    // .299*100 + .587*150 + .114*200 = 140.75 for every pixel
    def encoded(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 8) img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK must ship a $fmt writer")
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image", encoded("png"), 0L),
      MediaRecord(2L, "image", encoded("bmp"), 0L),
      MediaRecord(3L, "image", "not an image at all".getBytes("UTF-8"), 0L), // unreadable
      MediaRecord(4L, "audio", encoded("png"), 0L) // wrong kind: decode never attempted
    ).toDS()
    val out = Multimodal.extractFeatures(media).collect().map(f => f.id -> f).toMap
    for (id <- Seq(1L, 2L)) {
      assert(out(id).width.contains(8) && out(id).height.contains(4), s"doc $id dimensions")
      assert(math.abs(out(id).meanLuma.get - 140.75) < 1e-9, s"doc $id luminance")
    }
    assert(out(3L).width.isEmpty && out(3L).meanLuma.isEmpty, "unreadable bytes stay byte-stats-only")
    assert(out(4L).width.isEmpty, "non-image kinds never decode")
    assert(out.values.forall(f => f.nBytes > 0 && f.headHex.nonEmpty), "byte stats always present")
  }

  test("resizeImages: real downscale to maxDim, luminance preserved, non-images untouched") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val media = Seq(
      MediaRecord(1L, "image", png(64, 32), 0L),      // downscales to 16x8
      MediaRecord(2L, "image", png(8, 4), 0L),        // within bounds: untouched
      MediaRecord(3L, "audio", Array[Byte](1, 2, 3), 0L) // wrong kind: untouched
    ).toDS()
    val out = Multimodal.resizeImages(media, maxDim = 16).collect().map(r => r.id -> r).toMap
    val resized = Multimodal.decodeImage(out(1L).media).get
    assert((resized._1, resized._2) == ((16, 8)), s"got ${(resized._1, resized._2)}")
    // solid color survives bilinear downscale exactly
    assert(math.abs(resized._3 - 140.75) < 1e-9, s"luminance drifted: ${resized._3}")
    assert(out(1L).declaredBytes == out(1L).media.length.toLong)
    assert(out(2L).media.toSeq == png(8, 4).toSeq, "small image must pass through byte-identical")
    assert(out(3L).media.toSeq == Seq[Byte](1, 2, 3), "non-image must pass through")
  }

  test("decodeImage: header-declared decompression bomb is rejected before allocation") {
    // a real 8x4 PNG whose IHDR width/height fields are patched to declare
    // 100000x100000 (10 gigapixels — a ~40 GB raster if decoded); CRC is
    // recomputed so the PNG reader trusts the header. ImageIO.read would
    // OOM allocating the BufferedImage; the guard must reject it from the
    // header dimensions alone, without throwing
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bomb = out.toByteArray
    def putInt(off: Int, v: Int): Unit = {
      bomb(off) = ((v >>> 24) & 0xff).toByte; bomb(off + 1) = ((v >>> 16) & 0xff).toByte
      bomb(off + 2) = ((v >>> 8) & 0xff).toByte; bomb(off + 3) = (v & 0xff).toByte
    }
    // PNG layout: 8-byte signature, 4-byte chunk length, "IHDR" at offset
    // 12, width at 16, height at 20; chunk CRC (over type+data, bytes
    // 12..28) at offset 29
    putInt(16, 100000)
    putInt(20, 100000)
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17)
    putInt(29, crc.getValue.toInt)
    assert(Multimodal.decodeImage(bomb).isEmpty, "bomb must be rejected, not decoded")
    assert(Multimodal.rescaleImage(bomb, 16).isEmpty, "rescale path must reject it too")
    // the same bytes with truthful dimensions still decode: the guard
    // rejects on declared pixels, not on any other property of the file
    assert(Multimodal.decodeImage(out.toByteArray).exists(d => (d._1, d._2) == ((8, 4))))
    // over-budget via the parameter, independent of file patching
    assert(Multimodal.readImageGuarded(out.toByteArray, maxPixels = 31L).isEmpty,
      "8x4 = 32 pixels must fail a 31-pixel budget")
    assert(Multimodal.readImageGuarded(out.toByteArray, maxPixels = 32L).isDefined)
  }

  /** A well-formed 16-bit PCM WAV, built through the JDK's own writer so
    * the container layout is authoritative, not hand-rolled.
    */
  private def wav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val bytes = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      bytes(i * 2) = (samples(i) & 0xff).toByte
      bytes(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("extractFeatures: real WAV payloads parse to true rate/channels/duration/RMS") {
    import spark.implicits._
    // 1000 frames of a full-scale square wave at 8 kHz mono: duration is
    // exactly 125 ms and RMS of ±0.5 is exactly 0.5
    val square = Array.tabulate[Short](1000)(i => if (i % 2 == 0) 16384 else -16384)
    val stereo = Array.tabulate[Short](2000)(i => if (i % 2 == 0) 16384 else -16384)
    val media = Seq(
      MediaRecord(1L, "audio", wav(8000, 1, square), 0L),
      MediaRecord(2L, "audio", wav(16000, 2, stereo), 0L),
      MediaRecord(3L, "audio", "not audio".getBytes("UTF-8"), 0L), // unreadable
      MediaRecord(4L, "image", wav(8000, 1, square), 0L) // wrong kind: no parse
    ).toDS()
    val out = Multimodal.extractFeatures(media).collect().map(f => f.id -> f).toMap
    assert(out(1L).sampleRate.contains(8000) && out(1L).channels.contains(1))
    assert(math.abs(out(1L).durationMs.get - 125.0) < 1e-9)
    assert(math.abs(out(1L).rms.get - 0.5) < 1e-9, s"square-wave RMS: ${out(1L).rms}")
    assert(out(2L).sampleRate.contains(16000) && out(2L).channels.contains(2))
    assert(math.abs(out(2L).durationMs.get - 62.5) < 1e-9, "1000 stereo frames at 16 kHz")
    assert(out(3L).sampleRate.isEmpty, "non-WAV bytes stay byte-stats-only")
    assert(out(4L).sampleRate.isEmpty, "non-audio kinds never parse")
    assert(out(1L).width.isEmpty, "audio rows carry no image fields")
  }

  test("decodeWav: hostile declared sizes clamp to physical bytes — no allocation, no throw") {
    val good = wav(8000, 1, Array.tabulate[Short](100)(_ => 1000))
    // patch the data chunk's declared length to ~4 GB: features must still
    // come from the bytes actually present
    val patched = good.clone()
    val dataAt = {
      def tag(i: Int) = new String(patched.slice(i, i + 4), "US-ASCII")
      Iterator.from(12).find(i => tag(i) == "data").get
    }
    patched(dataAt + 4) = 0xff.toByte; patched(dataAt + 5) = 0xff.toByte
    patched(dataAt + 6) = 0xff.toByte; patched(dataAt + 7) = 0x7f.toByte
    val f = Multimodal.decodeWav(patched)
    assert(f.isDefined, "clamped parse must still succeed")
    assert(f.get._1 == 8000 && f.get._2 == 1)
    assert(math.abs(f.get._3 - Multimodal.decodeWav(good).get._3) < 1e-9,
      "duration must derive from physical bytes, not the declared size")
    // truncated mid-header and an empty payload both refuse cleanly
    assert(Multimodal.decodeWav(good.take(20)).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    // non-PCM format code refuses (patch audioFormat in `fmt `)
    val nonPcm = good.clone()
    val fmtAt = Iterator.from(12).find(i =>
      new String(nonPcm.slice(i, i + 4), "US-ASCII") == "fmt ").get
    nonPcm(fmtAt + 8) = 3 // IEEE float
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("decoder fuzz: arbitrary and RIFF-prefixed random bytes never throw, only None/features") {
    // the untrusted-corpus contract: no payload may kill an executor.
    // Seeded PRNG (deterministic run-to-run); RIFF/WAVE-prefixed tails
    // steer half the inputs into the WAV chunk walker's deeper paths
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { i =>
      val len = rnd.nextInt(200)
      val bytes = Array.fill(len)(rnd.nextInt(256).toByte)
      if (i % 2 == 1 && len >= 12) {
        Array[Byte]('R', 'I', 'F', 'F').copyToArray(bytes, 0)
        Array[Byte]('W', 'A', 'V', 'E').copyToArray(bytes, 8)
      }
      // must not throw; any Option result is acceptable
      Multimodal.decodeWav(bytes)
      Multimodal.decodeImage(bytes)
      Multimodal.readImageGuarded(bytes)
    }
  }

  private def grayImage(px: (Int, Int) => Int, w: Int = 18, h: Int = 16,
      fmt: String = "png"): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = px(x, y) & 0xff
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out))
    out.toByteArray
  }

  test("dhash: deterministic, re-encoding invariant, small-edit local, sub-grid images None") {
    // a horizontal ramp: every gradient bit is 1 (right cell brighter)
    val ramp = (x: Int, _: Int) => x * 14
    val a = Multimodal.dhash(grayImage(ramp))
    assert(a.contains(Multimodal.dhash(grayImage(ramp)).get), "bit-identical across calls")
    assert(a.get == -1L, s"ramp: every right cell is brighter, all 64 bits set; got ${a.get.toHexString}")
    // same pixels through a different CODEC hash identically — the
    // re-encoding robustness byte-dedup lacks
    assert(Multimodal.dhash(grayImage(ramp, fmt = "bmp")) == a)
    // one perturbed pixel moves only its grid cell's two adjacent bits
    val edited = (x: Int, y: Int) => if (x == 4 && y == 3) 255 else x * 14
    val b = Multimodal.dhash(grayImage(edited))
    assert(b.isDefined && java.lang.Long.bitCount(a.get ^ b.get) <= 2,
      s"local edit must stay local: hamming ${java.lang.Long.bitCount(a.get ^ b.get)}")
    // smaller than the 9x8 grid: no meaningful gradient, no hash
    assert(Multimodal.dhash(grayImage(ramp, w = 8, h = 4)).isEmpty)
    assert(Multimodal.dhash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageDupPairs: identical images pair at hamming 0, edits pair near, others don't") {
    import spark.implicits._
    val ramp = (x: Int, _: Int) => x * 14
    val edited = (x: Int, y: Int) => if (x == 4 && y == 3) 255 else x * 14
    val vramp = (_: Int, y: Int) => y * 15 // vertical ramp: all gradient bits 0
    val media = Seq(
      MediaRecord(1L, "image", grayImage(ramp), 0L),
      MediaRecord(2L, "image", grayImage(ramp, fmt = "bmp"), 0L), // re-encoded twin
      MediaRecord(3L, "image", grayImage(edited), 0L),            // near-dup edit
      MediaRecord(4L, "image", grayImage(vramp), 0L),             // unrelated
      MediaRecord(5L, "image", "corrupt".getBytes("UTF-8"), 0L)   // undecodable: drops out
    ).toDS()
    val pairs = Multimodal.imageDupPairs(media)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"cross-codec twin + local edit pair, nothing else: $pairs")
    assert(pairs((1L, 2L)) == 0L, "identical pixels across codecs: hamming 0")
    assert(pairs((1L, 3L)) <= 2L && pairs((1L, 3L)) >= 1L, "the edit is a near, not exact, match")
  }

  test("ImagesFixture: decoded-pixel dHash equals the closed-form formula hash (q83 bridge)") {
    import graft.fixtures.ImagesFixture
    // the exact assumption the q83 DuckDB oracle rests on: BMP encode →
    // imageio decode → area-average → luminance gradient sign computes the
    // SAME 64 bits as the integer cellValue formula. Ids cover all three
    // edit arms (r%3 = 0/1/2), several patterns, and — since the r16
    // replica-band mix — ids beyond ReplicaBand (bands 1, 2 and 999,
    // the 1000× ladder's top), so the bridge holds on replicated corpora.
    val ids = Seq(0L, 1L, 39L, 40L, 41L, 79L, 80L, 81L, 123L, 456L, 499L,
      12345L, 1000000L, 1000041L, 2000082L, 999000123L)
    ids.foreach { id =>
      val decoded = Multimodal.dhash(ImagesFixture.encodeBmp(id))
      assert(decoded.contains(ImagesFixture.formulaHash(id)),
        s"doc $id: decode-path hash ${decoded.map(_.toHexString)} != " +
          s"formula ${ImagesFixture.formulaHash(id).toHexString}")
    }
  }

  test("ImagesFixture near-dup structure: intra-pattern pairs found, edits bounded, base pair exact") {
    import graft.fixtures.ImagesFixture
    import spark.implicits._
    // ids 0/40/80 share pattern 0 with edit arms r%3 = 0/1/2; id 1 is a
    // different pattern (distinct base) and must not pair with them unless
    // its hash genuinely lands within hamming 6 — assert on the formula.
    val media = Seq(0L, 40L, 80L, 1L).map { id =>
      val m = ImagesFixture.encodeBmp(id)
      MediaRecord(id, "image", m, m.length.toLong)
    }.toDS()
    val pairs = Multimodal.imageDupPairs(media)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    // all three intra-pattern pairs surface (edits flip ≤2 bits per cell)
    assert(pairs.contains((0L, 40L)) && pairs.contains((0L, 80L)) && pairs.contains((40L, 80L)),
      s"intra-pattern near-dups must all pair: $pairs")
    assert(pairs((0L, 40L)) >= 1L && pairs((0L, 40L)) <= 2L, "one-cell edit: 1-2 bits")
    assert(pairs((0L, 80L)) <= 4L, "two-cell edit: <=4 bits")
    assert(pairs((40L, 80L)) <= 2L, "edits share cell (2,3): <=2 bits apart")
    // the cross-pattern pair appears iff its true hamming is <= 6 — and
    // for patterns 0 vs 1 the bases genuinely differ far apart
    val cross = java.lang.Long.bitCount(
      ImagesFixture.formulaHash(0L) ^ ImagesFixture.formulaHash(1L))
    assert(pairs.contains((0L, 1L)) == (cross <= 6 &&
      (0 until 8).exists(j => ((ImagesFixture.formulaHash(0L) >> (j * 8)) & 255) ==
        ((ImagesFixture.formulaHash(1L) >> (j * 8)) & 255))),
      s"cross-pattern pair must follow the band+hamming rule exactly (hamming $cross)")
  }

  test("ImagesFixture replica bands: band 0 unchanged, per-band families distinct, intra-band structure preserved") {
    import graft.fixtures.ImagesFixture
    // Band 0 must be EXACTLY the pre-mix formula (the gate) — pin one
    // hash value so a silent gating regression fails loudly rather than
    // shifting every oracle row at once.
    (0 until 9).foreach { gx =>
      (0 until 8).foreach { gy =>
        val p = 7L; val id = 7L // pattern 7, arm 0, band 0
        val expect = ((p * gx * 129 + p * gy * 127 + gx * gy * 97 +
          gx * 143 + gy * 112 + p * 7) % 199).toInt
        assert(ImagesFixture.cellValue(id, gx, gy) === expect,
          s"band-0 cell ($gx,$gy) must gate to the original formula")
      }
    }
    // The SAME (pattern, arm) in different bands is a different image
    // family: the whole point of the mix is that replicas do NOT pair
    // with each other, so true pairs grow linearly in the replica count.
    val bands = Seq(0L, 1L, 2L, 5L, 17L, 999L)
    val hs = bands.map(b => ImagesFixture.formulaHash(b * ImagesFixture.ReplicaBand))
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(d > 6,
        s"bands ${bands(i)} vs ${bands(j)}: hamming $d <= 6 — replicas would cross-pair")
    }
    // Within a band > 0, the intra-pattern edit structure carries over
    // unchanged: arm edits move the hash <= 2 / <= 4 bits off the band's
    // base, exactly the band-0 bounds the near-dup ladder counts on.
    // Arm ids follow floorDiv(id, Patterns) % 3, which is NOT 0 at the
    // band boundary (10^6/40 = 25000 ≡ 1 mod 3) — derive each arm's id
    // instead of assuming arm 0 at b (that mislabeling once made both
    // asserted pairs single-cell edits, so the <=4-bit two-cell bound
    // was never exercised off band 0).
    val b = ImagesFixture.ReplicaBand
    def armId(arm: Long): Long =
      Iterator.iterate(b)(_ + ImagesFixture.Patterns) // pattern 0 in band 1
        .find(id => java.lang.Math.floorDiv(id, ImagesFixture.Patterns.toLong) % 3 == arm)
        .get
    val base = ImagesFixture.formulaHash(armId(0))    // unedited
    val oneEdit = ImagesFixture.formulaHash(armId(1)) // (2,3) edited
    val twoEdit = ImagesFixture.formulaHash(armId(2)) // (2,3) + (5,6) edited
    assert(java.lang.Long.bitCount(base ^ oneEdit) <= 2, "one-cell edit: <=2 bits in band 1")
    assert(java.lang.Long.bitCount(base ^ twoEdit) <= 4, "two-cell edit: <=4 bits in band 1")
    // arms 1 and 2 share the (2,3) edit, so they too differ by one cell
    assert(java.lang.Long.bitCount(oneEdit ^ twoEdit) <= 2, "arm1 vs arm2: one differing cell")
  }

  test("declarative binaryFeatures agrees with the mapPartitions path on byte counts") {
    val docs = Tables.documents(spark, dir)
    val sql = Multimodal.binaryFeatures(docs).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val mp = Multimodal.extractFeatures(Multimodal.mediaFromDocuments(docs)).collect()
      .map(f => f.id -> f.nBytes).toMap
    assert(sql == mp)
  }
}
