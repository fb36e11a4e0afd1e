package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** Wide-dimension PQ evidence probe (r13 VERDICT ask #4, solo experiment —
  * NOT a registered query): the PQ tier's motivating claim is that the raw
  * ANN paths carry d·8 bytes per CANDIDATE through the bucket join while
  * the persisted PQ index carries 24 bytes, and that the crossover where
  * the index path wins outright is dimension-dependent — at the fixture's
  * d=64 q16i only TIES raw adaptive IVF (BASELINE.md r13 caveat). This
  * main measures the claim at production width on the
  * `tools/make_wide_embeddings.py` fixture (d=768; per-block Rademacher
  * widening preserves every cosine bit-for-bit, so recall is judged
  * against a brute-force whose answers have the same structure as the
  * 64-dim replica's).
  *
  * Per dir it times, median-of-`SPARK_GRAFT_ITERS` (default 3):
  *   - `brute`  — [[Similarity.bruteForceTopK]] (exact; also the recall
  *     reference, computed once)
  *   - `ivf_raw` — the q16f shape: adaptive √N/0.2-fraction geometry over
  *     RAW wide vectors (candidates carry d doubles through the join)
  *   - `pq_search` — the q16i shape: search-only against a PERSISTED
  *     IVF-PQ index built once outside the timed loop (build time
  *     reported separately as `pq_build`, amortized in deployment)
  * plus recall@5 of both ANN paths vs brute. Output: one JSON line per
  * dir (the ScaleCheck/StreamScale record convention).
  */
object WideDimProbe {

  private def timeIt(iters: Int)(thunk: => Long): (Double, Seq[Double], Long) = {
    var rows = 0L
    val samples = (1 to iters).map { _ =>
      val t0 = System.nanoTime()
      rows = thunk
      (System.nanoTime() - t0) / 1e9
    }
    (samples.sorted.apply(samples.size / 2), samples, rows)
  }

  /** recall@k of `ann` against `brute`, macro-averaged over queries —
    * membership only (score ties can reorder WITHIN the admitted set).
    */
  private def recallAt(brute: DataFrame, ann: DataFrame): Double = {
    val b = brute.select(col("query_id"), col("neighbor_id"))
    val a = ann.select(col("query_id"), col("neighbor_id"))
    val hit = b.join(a, Seq("query_id", "neighbor_id")).count().toDouble
    val tot = b.count().toDouble
    if (tot == 0) 1.0 else hit / tot
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf_wide768_1x")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val skipBrute = sys.env.contains("SPARK_GRAFT_SKIP_BRUTE")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    dirs.foreach { dir =>
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
      val nv = emb.select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("emb"))
      val dims = nv.select(size(col("emb"))).first().getInt(0)
      val cnt = nv.count()
      val kCent = math.ceil(math.sqrt(cnt.toDouble)).toLong
      val stride = math.max(1L, cnt / kCent)
      val nprobe = math.ceil(0.2 * kCent).toInt
      val queryFilter = col("id") % 50 === 0

      // SPARK_GRAFT_PQ_ONLY skips the raw-IVF and binary legs — the
      // kernel-A/B loop over a reused index only needs pq_search
      val pqOnly = sys.env.contains("SPARK_GRAFT_PQ_ONLY")

      // q16f shape on raw wide vectors
      val (ivfMed, ivfSamples, _) =
        if (pqOnly) (-1.0, Seq(-1.0), 0L)
        else timeIt(iters) {
          Similarity.ivfTopK(emb, "vec_id", "embedding", queryFilter,
            col("id") % stride === 0, k = 5, nprobe = nprobe).count()
        }

      // q15c shape: the binary scan's radius is a FRACTION of d (Hamming
      // tracks angle, angle distribution is d-invariant for isotropic
      // vectors), so R = ⌈27/64 · d⌉ transports the d=64 calibration.
      // Binary signatures pack by construction (d/32 longs), so this is
      // the quantized tier whose bandwidth advantage survives wide dims.
      val radius = math.ceil(27.0 / 64.0 * dims).toInt
      def binTopK() = Similarity.binaryTopK(emb, "vec_id", "embedding",
        queryFilter, k = 5, maxHamming = radius)
      val (binMed, binSamples, _) =
        if (pqOnly) (-1.0, Seq(-1.0), 0L)
        else timeIt(iters)(binTopK().count())

      // q16i shape: persisted-index build (once) then search-only.
      // Subspace count M defaults to the registered tier's RULE — constant
      // subvector width (q15d/q16h: subDim = 4) — rather than its constant
      // M = 16: carrying M over to d=768 means 48-dim cells against 16
      // codewords, and the ADC cosine degrades into a recall cliff
      // (measured: recall@5 0.29 vs raw IVF's 0.53 at the same nprobe).
      // SPARK_GRAFT_PQ_M overrides to measure exactly that contrast.
      val subspaces = sys.env.get("SPARK_GRAFT_PQ_M").map(_.toInt)
        .getOrElse(dims / 4)
      // SPARK_GRAFT_WIDE_IDX pins the index root across probe runs so
      // kernel A/B reruns pay only the search, not the ~20-min M=192
      // build (build_sec reports -1 when reused)
      val root = sys.env.get("SPARK_GRAFT_WIDE_IDX").getOrElse(
        java.nio.file.Files.createTempDirectory("graft-wide-pqidx-").toString)
      val buildSec =
        if (new java.io.File(s"$root/index").exists) -1.0
        else {
          val tBuild0 = System.nanoTime()
          val centroids = nv.filter(col("id") % stride === 0)
          val codebook = Similarity.pqCodebook(nv, math.max(1L, cnt / 16L), dims,
            subspaces = subspaces)
          Similarity.ivfPqIndexRows(nv, centroids, codebook, dims,
              subspaces = subspaces)
            .write.mode("overwrite").parquet(s"$root/index")
          codebook.write.mode("overwrite").parquet(s"$root/codebook")
          centroids.write.mode("overwrite").parquet(s"$root/centroids")
          (System.nanoTime() - tBuild0) / 1e9
        }
      val index = spark.read.parquet(s"$root/index")
      val cb = spark.read.parquet(s"$root/codebook")
      val cents = spark.read.parquet(s"$root/centroids")
      def pqSearch() = Similarity.ivfPqSearchFrom(index, cb, cents,
        raw = nv, queries = nv.filter(queryFilter),
        k = 5, nprobe = nprobe, dims = dims, adcThreshold = 0.10,
        subspaces = subspaces)
      val (pqMed, pqSamples, _) = timeIt(iters)(pqSearch().count())

      val (bruteMed, ivfRecall, pqRecall, binRecall) =
        if (skipBrute) (-1.0, -1.0, -1.0, -1.0)
        else {
          val (bm, _, _) = timeIt(iters) {
            Similarity.bruteForceTopK(emb, "vec_id", "embedding",
              queryFilter, k = 5).count()
          }
          val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
            queryFilter, k = 5)
          val r1 = recallAt(brute, Similarity.ivfTopK(emb, "vec_id",
            "embedding", queryFilter, col("id") % stride === 0, k = 5,
            nprobe = nprobe))
          val r2 = recallAt(brute, pqSearch())
          val r3 = recallAt(brute, binTopK())
          (bm, r1, r2, r3)
        }

      def arr(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
      println(s"""{"dir":${Bench.jstr(dir)},"rows":$cnt,"dims":$dims,""" +
        s""""pq_m":$subspaces,"k_cent":$kCent,"nprobe":$nprobe,""" +
        s""""bin_radius":$radius,"iters":$iters,""" +
        f""""brute_sec":$bruteMed%.3f,"ivf_raw_sec":$ivfMed%.3f,""" +
        f""""pq_build_sec":$buildSec%.3f,"pq_search_sec":$pqMed%.3f,""" +
        f""""bin_sec":$binMed%.3f,"ivf_recall5":$ivfRecall%.4f,""" +
        f""""pq_recall5":$pqRecall%.4f,"bin_recall5":$binRecall%.4f,""" +
        s""""ivf_samples":${arr(ivfSamples)},"pq_samples":${arr(pqSamples)},""" +
        s""""bin_samples":${arr(binSamples)}}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
