package graft

import org.apache.spark.sql.functions._

import graft.llm.{Classifier, Dedup, LanguageModel, Similarity}
import graft.sources.Tables

/** Stage-resolution probe for the q89 curation capstone at replica scale:
  * recomputes each stage's surviving-row count through the SAME components
  * the registered query chains, and prints one JSON line. Exists because a
  * composed pipeline's scale behavior can zero out end-to-end while every
  * stage looks healthy in isolation — the count vector says which gate did
  * it (found when the r18 MemPressure run returned rows=0 at 10×).
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_CPUS=32 \
  *   sbt -batch "runMain graft.CurationScaleProbe"
  * }}}
  */
object CurationScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.expressions.Window

    val par = spark.sparkContext.defaultParallelism
    val docs = Tables.documents(spark, sfDir).repartition(par)
    val nDocs = docs.count()

    val clfScores = Classifier
      .trainScore(docs, LlmQueries.dsirTarget, LlmQueries.clfTrain,
        LlmQueries.ClfBuckets, LlmQueries.ClfEpochs)
      .select("doc_id", "score", "keep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // raw margin>0 count stays reported: it's the measurement that
    // motivated the rank gate (83/5000 at sf0.1, 0/50k at 10×)
    val nClfRaw = clfScores.filter(col("keep")).count()
    val clfMed = clfScores
      .agg(round(percentile(col("score"), lit(LlmQueries.ClfGateQuantile)), 6))
      .first().getDouble(0)
    val clfKeep = clfScores.filter(col("score") >= clfMed).select("doc_id")
    val nClfKeep = clfKeep.count()

    val ppl = LanguageModel
      .perplexity(docs, "doc_id", "text", col("lang") === LlmQueries.LmRefLang)
      .select("doc_id", "nll_per_token", "n_tokens")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPpl = ppl.count()
    val med = ppl.agg(round(percentile(col("nll_per_token"),
      lit(LlmQueries.PplGateQuantile)), 6)).first().getDouble(0)
    val pplKeep = ppl.filter(col("nll_per_token") <= med)
      .select("doc_id", "n_tokens")
    val nPplKeep = pplKeep.count()

    val embRaw = Tables.embeddings(spark, sfDir).repartition(par)
    val nEmb = embRaw.count()
    val kCent = math.ceil(math.sqrt(nEmb.toDouble)).toLong
    val stride = math.max(1L, nEmb / kCent)
    val nprobe = math.ceil(LlmQueries.AdaptiveProbeFraction * kCent).toInt
    val vecs = embRaw.select(col("vec_id").as("id"),
      Similarity.asDouble(col("embedding")).as("emb"))
    val centroids = vecs.filter(col("id") % stride === 0)
    val assigned = Similarity.ivfAssign(vecs, centroids)
      .select("id", "bucket", "emb")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchPred = col("id") < LlmQueries.SemBenchIdBound &&
      col("id") % LlmQueries.SemBenchMod === LlmQueries.SemBenchRem
    val contaminated = assigned.filter(!benchPred)
      .join(broadcast(
        Similarity.probeBuckets(vecs.filter(benchPred), centroids, nprobe)),
        Seq("bucket"))
      .filter(round(Similarity.fusedCosine(col("emb"), col("q_emb")), 6)
        >= LlmQueries.CosineDupThreshold)
      .select(col("id").as("doc_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nContam = contaminated.count()

    val pairs = Similarity.cosinePairs(assigned, "id", "emb", col("bucket"),
      LlmQueries.CosineDupThreshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = pairs.count()
    val clusters = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nClustered = clusters.count()
    val nClusters = clusters.select("cluster").distinct().count()

    val gatedPreAnti = docs.select(col("doc_id"), col("lang"))
      .join(clfKeep, "doc_id")
      .join(pplKeep, "doc_id")
      .filter(!(col("doc_id") < LlmQueries.SemBenchIdBound &&
        col("doc_id") % LlmQueries.SemBenchMod === LlmQueries.SemBenchRem))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGatedPre = gatedPreAnti.count()
    val gated = gatedPreAnti.join(contaminated, Seq("doc_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGated = gated.count()

    val reps = gated
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("cluster").orderBy("doc_id")))
      .filter(col("__rn") === 1)
      .select("doc_id", "lang", "n_tokens")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nReps = reps.count()
    val mixed = graft.operators.Sampling.temperatureSample(
      reps, col("lang"), col("doc_id"))
    val nMixed = mixed.count()
    val w = Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nFinal = mixed.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= LlmQueries.TokenBudget).count()

    println(s"""{"sf":"$sfDir","docs":$nDocs,"clf_keep_raw":$nClfRaw,""" +
      s""""clf_margin_median":$clfMed,"clf_keep":$nClfKeep,""" +
      s""""ppl_rows":$nPpl,"nll_median":$med,"ppl_keep":$nPplKeep,""" +
      s""""emb":$nEmb,"k_cent":$kCent,"nprobe":$nprobe,""" +
      s""""contaminated":$nContam,"pairs":$nPairs,""" +
      s""""clustered_ids":$nClustered,"clusters":$nClusters,""" +
      s""""gated_pre_anti":$nGatedPre,"gated":$nGated,"reps":$nReps,""" +
      s""""mixed":$nMixed,"final":$nFinal}""")
    spark.stop()
  }
}
