package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Plan evidence for the r18 CC edge-set change (`plans/r18/`):
  * [[graft.llm.Dedup.connectedComponents]] runs EAGERLY inside each
  * registered query (its loop/collect happen at query-construction time),
  * so `PlanDump` of q32/q48/q52 shows only the final artifact join — the
  * changed subplan never appears. This main explains exactly that
  * subplan, both shapes, over q32's REAL pair plan (minhashPairs on the
  * documents fixture): the pre-r18 4-branch union construction
  * (`sym = pairs ∪ swap; staged = sym ∪ sym.selfloops.distinct`) vs the
  * r18 single-pass explode. Diagnostic only, never on a query path.
  *
  * Usage: `runMain graft.CcPlanEvidence <sfDir> <outDir>`
  */
object CcPlanEvidence {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val corpus = graft.fixtures.DocumentsFixture.corpusDf(spark, sfDir)
    val pairs = graft.llm.Dedup.minhashPairs(corpus, "doc_id", "text")

    // the pre-r18 construction, verbatim shape
    val sym = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
    val before = sym.filter(col("u").isNotNull && col("v").isNotNull)
      .union(sym.select(col("u"), col("u").as("v"))
        .filter(col("u").isNotNull).distinct())

    // the r18 construction (mirrors connectedComponents' staged build)
    val after = pairs
      .select(explode(array(
        struct(col("id_a").as("u"), col("id_b").as("v")),
        struct(col("id_b").as("u"), col("id_a").as("v")),
        struct(col("id_a").as("u"), col("id_a").as("v")),
        struct(col("id_b").as("u"), col("id_b").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)

    for ((df, tag) <- Seq(before -> "before", after -> "after")) {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"cc_staged_edges_$tag.txt"), txt)
      println(s"[ccplan] $tag -> $outDir/cc_staged_edges_$tag.txt")
    }

    // r19 loop-edge evidence: the distributed loop's persisted edge frame
    // (`staged.repartition(grain, u)`) with and without the r19
    // `dropDuplicates(Seq("u","v"))` — the claim under check is that the
    // dedup rides the repartition's HashPartitioning(u) (which satisfies
    // the (u,v) aggregation's ClusteredDistribution) and therefore adds
    // HashAggregate nodes but NO second Exchange.
    val grain = spark.sparkContext.defaultParallelism
    val loopBefore = after.repartition(grain, col("u"))
    val loopAfter = loopBefore.dropDuplicates(Seq("u", "v"))
    for ((df, tag) <- Seq(loopBefore -> "before", loopAfter -> "after")) {
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(outDir, s"cc_loop_edges_$tag.txt"), txt)
      val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(txt).toSeq.distinct.size
      println(s"[ccplan] loop $tag -> $outDir/cc_loop_edges_$tag.txt (Exchange nodes: $exchanges)")
    }
    spark.stop()
  }
}
