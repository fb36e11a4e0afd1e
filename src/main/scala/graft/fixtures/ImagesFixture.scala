package graft.fixtures

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

import graft.llm.MediaRecord
import graft.sources.Tables

/** Image corpus for the perceptual-hash dedup leg (q83): one REAL encoded
  * BMP per `documents` row, whose pixels follow a closed-form integer
  * formula of (doc_id, grid cell) — so the engine path exercises the full
  * binary pipeline (BMP encode → `javax.imageio` decode → area-average
  * downscale → dHash → banded Hamming pairs) while the DuckDB oracle
  * recomputes the very same 64-bit hash from the formula with pure
  * integer arithmetic and never touches a pixel.
  *
  * Why the twin is EXACT and not merely close:
  *   - The image is 18×16 gray (every channel = v), i.e. 2×2 blocks over
  *     the dHash 9×8 grid: `x*9/18 = x/2`, `y*8/16 = y/2` land each block
  *     in exactly one grid cell, so each cell's area average is the
  *     average of 4 IDENTICAL luminances — bit-exactly the luminance of v
  *     (sums/divides by powers of two are exact in binary floating point).
  *   - BMP (24-bit, the JDK writer's format for TYPE_INT_RGB) is
  *     lossless, so decode returns the written v verbatim.
  *   - Rec.601 luminance 0.299v+0.587v+0.114v is strictly increasing in
  *     integer v and identical for identical v, so the dHash gradient
  *     sign `lum(v1) < lum(v2)` equals the INTEGER comparison `v1 < v2`
  *     — the only thing the oracle needs to evaluate.
  *
  * Near-dup structure: docs sharing `doc_id % Patterns` (within one
  * replica band — see below) are replicas of one base pattern; a third of
  * each pattern's replicas carry a one-cell edit (+[[EditDelta]] at
  * (2,3)), another third a two-cell edit (adds (5,6)). One edited cell
  * flips at most its 2 adjacent row gradients, so intra-pattern Hamming
  * distances are 0/≤2/≤4/≤6 — all within q83's maxHamming=6 and therefore
  * pigeonhole-guaranteed to share a band at bands=8. Cross-pattern pairs
  * only surface through chance band collisions and are filtered by the
  * exact Hamming check, identically in both engines.
  *
  * REPLICA BANDS (r16, verdict #4): `doc_id // ReplicaBand` — the replica
  * index under `tools/make_scale_replica.py`'s k·10⁶ id offsets — mixes a
  * per-band pseudo-random offset into every grid cell, so each replica
  * carries its own 40 image families instead of repeating band 0's. TRUE
  * image-dup pairs therefore grow LINEARLY in the replica count (the text
  * corpus's per-replica token-suffix discipline, applied to pixels), which
  * is what makes a measured q83 ladder honest. Band 0 is byte-identical
  * to the pre-r16 fixture, so oracle-scale corpora are untouched.
  */
object ImagesFixture {

  /** Distinct base patterns; docs with equal `doc_id % Patterns` are
    * near-dup replicas of one another. */
  val Patterns = 40

  /** dHash grid geometry (fixed by [[graft.llm.Multimodal.dhash]]). */
  val GridW = 9
  val GridH = 8

  /** Pixels per grid cell side: the image is (GridW·2)×(GridH·2). */
  val Block = 2

  /** Luminance bump applied by the edit arms; 199+50 stays within a byte. */
  val EditDelta = 50

  /** The replica id-offset convention of `tools/make_scale_replica.py`:
    * replica k shifts doc_id by k·10⁶, so `doc_id // ReplicaBand` IS the
    * replica index. Docs in band 0 (every oracle-scale corpus: doc_id <
    * 10⁶ everywhere the driver runs DuckDB) are byte-identical to the
    * pre-r16 fixture. */
  val ReplicaBand = 1000000L

  /** Modulus (2³¹−1, prime) and multipliers of the per-band cell mixer.
    * All intermediates are bounded below 2⁶³ BY CONSTRUCTION (each factor
    * reduced mod [[MixM]] before multiplying), because the DuckDB twin
    * ERRORS on BIGINT overflow while the JVM silently wraps — a
    * divergence the arithmetic must make unreachable, not just unlikely. */
  val MixM = 2147483647L
  private[graft] val MixSeedMult = 2654435761L
  private[graft] val MixStepMult = 48271L

  /** Closed-form grid-cell luminance — the single source of truth both
    * the BMP pixels and the DuckDB oracle's hash arithmetic derive from.
    * floorDiv/floorMod match SQL's `//` and `%` on any sign (doc_ids are
    * non-negative in every corpus, but the twin must never be able to
    * diverge on a degenerate input).
    */
  def cellValue(docId: Long, gx: Int, gy: Int): Int = {
    val p = java.lang.Math.floorMod(docId, Patterns.toLong)
    val r = java.lang.Math.floorDiv(docId, Patterns.toLong)
    // The pattern id multiplies the COORDINATES (p·gx, p·gy terms), not
    // just the offset: with an offset-only mix (base = p·c + gx·c' + ...)
    // every pattern is the same gradient sequence phase-shifted mod 199,
    // and several of 40 patterns land within Hamming ≤6 of each other —
    // measured 21k spurious cross-pattern pairs at sf0.01. These constants
    // were searched so the 40 base hashes sit ≥18 bits apart (edits move a
    // hash ≤4 bits, so cross-pattern pairs stay ≥10 > maxHamming=6 apart)
    // while every intra-pattern edit distance stays within the documented
    // 0/≤2/≤4 bounds.
    val grid = ((p * gx * 129 + p * gy * 127 + gx * gy * 97 +
      gx * 143 + gy * 112 + p * 7) % 199).toInt
    // Per-REPLICA-BAND cell mix (r16, verdict #4): without it the hash is
    // a function of doc_id mod (Patterns·3·ReplicaBand-structure) only —
    // 120 distinct hashes TOTAL — so a replicated corpus's true dup pairs
    // grow QUADRATICALLY in the replica count and every image ladder
    // point was scale evidence by composition, not measurement. The mix
    // gives each (band, pattern) family its own pseudo-random 9×8 grid:
    // seed = Lehmer step of the band, squared per cell with the cell
    // index MULTIPLIED in (v² — a linear-in-cell mix keeps the quadratic
    // coefficient family-independent and the 72-cell window never wraps
    // the modulus, which measured 80k+ near-identical families; the
    // multiplicative form measures 40 000/40 000 distinct hashes,
    // min pairwise Hamming 2, 158 family pairs ≤6 over 8·10⁸ — chance
    // level, ≤1% pair inflation at the 1000× decade). Band 0 is gated to
    // EXACTLY the original formula, so every oracle-scale corpus and the
    // searched ≥18-bit cross-pattern separation claim are untouched.
    val rq = java.lang.Math.floorDiv(docId, ReplicaBand)
    val mix =
      if (rq == 0L) 0L
      else {
        val s = java.lang.Math.floorMod(rq, MixM) * MixSeedMult % MixM
        val v = (s + 1L) * (p * 73L + gy * 9L + gx + 1L) % MixM
        (v * v % MixM * MixStepMult + v) % MixM % 199L
      }
    val base = ((grid + mix) % 199L).toInt
    val rm = java.lang.Math.floorMod(r, 3L)
    val edited = (rm == 1L && gx == 2 && gy == 3) ||
      (rm == 2L && ((gx == 2 && gy == 3) || (gx == 5 && gy == 6)))
    base + (if (edited) EditDelta else 0)
  }

  /** The real encoded payload: an 18×16 TYPE_INT_RGB BufferedImage with
    * gray pixel v = [[cellValue]] of the enclosing 2×2 block, written
    * through the JDK's lossless BMP encoder.
    */
  def encodeBmp(docId: Long): Array[Byte] = {
    val w = GridW * Block
    val h = GridH * Block
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = cellValue(docId, x / Block, y / Block)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  /** The Scala-side twin of the oracle's hash CTE: the 64-bit dHash
    * computed straight from [[cellValue]] without any pixels — used by
    * the spec to pin that decode-path hashes equal formula hashes (the
    * exact bridge assumption the q83 oracle rests on).
    */
  def formulaHash(docId: Long): Long = {
    var bits = 0L
    var i = 0
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW - 1) {
        if (cellValue(docId, gx, gy) < cellValue(docId, gx + 1, gy)) bits |= 1L << i
        i += 1
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** One [[MediaRecord]] per `documents` row: the encode runs
    * distributed (map over the id column, CPU-bound, no shuffle), standing
    * in for the scan of a real image corpus. Repartitioned first — the
    * documents split is tiny, and the encode+decode work should use every
    * core (the [[DocumentsFixture.corpusDf]] convention).
    */
  def imageCorpus(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { id =>
        val media = encodeBmp(id)
        MediaRecord(id, "image", media, media.length.toLong)
      }
  }
}
