package graft

/** Scale probe for the adaptive-IVF third decade. Round-15 history: the
  * then-registered q16f made the query set a corpus fraction (`id % 50`),
  * so candidate volume was |Q|·0.2N — N²/250 — and the 1000× run died on
  * DISK (candidate-sort spill past the box's free space); this probe ran
  * the identical plan with a FIXED 40-query set and rode the decade at
  * 5.7×/decade, the measured decomposition proving the CONVENTION (not
  * the plan) was what squared.
  *
  * Round 16 promoted that fixed-|Q| form into the registered query
  * itself ([[LlmQueries.AnnFixedQueryIdBound]]: queries are the
  * fixed `id < 2000 AND id % 50 = 0` window, 40 ids at every scale),
  * so the probe now simply MEASURES the registered q16f — no re-typed
  * geometry constants, by construction (r15 advice: probes must not
  * duplicate literals the registry keeps private). Residual growth is
  * the in-plan N·⌈√N⌉ cell assignment, which the q16i persisted-index
  * path amortizes into the nightly build.
  */
object AnnFixedQueryProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/tmp/sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      // |Q| is MEASURED, not derived from the window constants: the window
      // admits at most 40 ids but a small corpus (the 500-id oracle
      // fixture) populates only part of it, and the log must not
      // overstate the query set it actually timed
      import org.apache.spark.sql.functions.col
      val nQueries = graft.sources.Tables.embeddings(spark, dir)
        .filter(col("vec_id") < LlmQueries.AnnFixedQueryIdBound &&
          col("vec_id") % LlmQueries.AnnFixedQueryStride === 0)
        .count()
      val t0 = System.nanoTime()
      val rows = LlmQueries.annIvfAdaptive(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"dir":"$dir%s","query":"q16f_registered","fixed_queries":$nQueries%d,"rows":$rows%d,"sec":$sec%.2f}""")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
