package graft

/** Scale-evidence probe for the iterative dedup end-game: prints, for each
  * data dir argument, the minhash pair count, connected-components vertex/
  * cluster counts, and — the O(log diameter) claim made measurable — the
  * number of CC rounds to convergence ([[graft.llm.Dedup.connectedComponents]]
  * `roundsCallback`). Run at sf0.1 and a 10× replica set to show the round
  * count is scale-stable while pairs/vertices grow linearly (recorded in
  * BASELINE.md's scaling table). Same minhash parameters as the q12/q32
  * registry queries (shingle 3, 8 hashes, 2 rows/band, τ = 0.5).
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    // This probe MEASURES the distributed loop's round count — force past
    // the driver union-find fast path (which reports rounds = 0 and would
    // absorb every fixture-scale graph).
    spark.conf.set("spark.graft.cc.driverEdgeLimit", "0")
    dirs.foreach { dir =>
      val corpus = graft.fixtures.DocumentsFixture.corpusDf(spark, dir)
      val pairs = graft.llm.Dedup.minhashPairs(corpus, "doc_id", "text", 3, 8, 2, 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPairs = pairs.count()
      var rounds = -1
      val cc = graft.llm.Dedup.connectedComponents(
        pairs, roundsCallback = Some(r => rounds = r))
      val nVerts = cc.count()
      val nClusters = cc.select("cluster").distinct().count()
      println(s"""{"dir":"$dir","pairs":$nPairs,"vertices":$nVerts,"clusters":$nClusters,"cc_rounds":$rounds}""")
      pairs.unpersist(false)
      // q86's convergence claim, made measurable: Lloyd rounds to the
      // centroid fixed point should track cluster GEOMETRY, not corpus
      // size — same pinned seed set and cap as the registered query.
      import org.apache.spark.sql.functions.col
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id").as("id"),
          col("embedding").cast("array<double>").as("emb"))
      val kmCap = LlmQueries.KmeansConvergeMaxRounds
      val (_, kmRounds) = graft.llm.Similarity.kmeansFitConverged(
        emb, LlmQueries.kmeansSeedSet(emb), kmCap)
      println(s"""{"dir":"$dir","kmeans_rounds":$kmRounds,"kmeans_cap":$kmCap}""")
      // q83's honest ladder (r16): with the per-replica-band cell mix in
      // ImagesFixture, TRUE image-dup pairs grow ~R× like the text corpus
      // — this measures the registered query itself at each decade, so
      // the ratio is evidence, not composition-by-analogy with q64.
      val it0 = System.nanoTime()
      val imgPairs = graft.llm.Multimodal.imageDupPairs(
        graft.fixtures.ImagesFixture.imageCorpus(spark, dir)).count()
      val itSec = (System.nanoTime() - it0) / 1e9
      println(f"""{"dir":"$dir%s","image_pairs":$imgPairs%d,"image_sec":$itSec%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
