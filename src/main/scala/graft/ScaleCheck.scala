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
      val (_, kmRounds) = graft.llm.Similarity.kmeansFitConverged(
        emb, emb.filter(col("id") % 100 === 0 && col("id") < 2000L), 6)
      println(s"""{"dir":"$dir","kmeans_rounds":$kmRounds,"kmeans_cap":6}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
