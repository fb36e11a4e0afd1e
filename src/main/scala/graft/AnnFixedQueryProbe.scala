package graft

/** Scale probe for the q16f third-decade reading (round 15): the 1000×
  * registered run died on DISK (candidate-sort spill past the box's
  * free space) because the benchmark CONVENTION makes the query set a
  * corpus fraction (`id % 50`), so candidate volume is |Q|·0.2N — N²/250.
  * This probe runs the identical adaptive-IVF plan with a FIXED query
  * set (the base replica's 40 `id % 50` residents, present unchanged at
  * every decade) to separate the two growth terms:
  *
  *   - candidate volume: |Q|·0.2N — LINEAR once |Q| is fixed;
  *   - in-plan cell assignment: N×⌈√N⌉ packed rows — the N^1.5 term an
  *     in-plan IVF pays every run and the q16i persisted-index path
  *     amortizes into the nightly build.
  *
  * So the fixed-query ladder should complete at the decade that killed
  * the corpus-fraction form, with residual growth ~N^1.5 attributable
  * to assignment — the measured decomposition behind BASELINE.md's
  * "the convention, not the operator, is what squares".
  */
object AnnFixedQueryProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    dirs.foreach { dir =>
      val emb = graft.sources.Tables.embeddings(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"))
      val n = emb.count()
      // q16f's count-derived geometry (AdaptiveProbeFraction = 0.2)
      val kCent = math.ceil(math.sqrt(n.toDouble)).toLong
      val stride = math.max(1L, n / kCent)
      val nprobe = math.ceil(0.2 * kCent).toInt
      val t0 = System.nanoTime()
      val rows = graft.llm.Similarity.ivfTopK(emb, "vec_id", "embedding",
        col("id") < 2000L && col("id") % 50 === 0,
        col("id") % stride === 0, k = 5, nprobe = nprobe).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir%s","n":$n%d,"fixed_queries":40,"k_cent":$kCent%d,"nprobe":$nprobe%d,"rows":$rows%d,"sec":$sec%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
