package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for a training corpus: flag training documents
  * that share n-gram shingles with a benchmark/eval set, so eval data can
  * be held out of training (the standard decontamination step in public
  * LLM data pipelines).
  *
  * Scale shape: the benchmark side is small by nature (eval suites are
  * MBs against a 100 TB corpus) — its distinct shingle set BROADCASTS, and
  * the corpus side is one explode + broadcast-hash-join + partial-aggregated
  * count per doc. No shuffle touches the corpus until the final per-doc
  * aggregation, which is keyed on doc id (high cardinality, no skew).
  */
object Contamination {

  /** Per-document overlap with the benchmark subset: one row per
    * NON-benchmark doc sharing >= 1 shingle with any benchmark doc,
    * with the count of distinct contaminated shingles. `benchFilter` is a
    * predicate over `doc_id` marking the benchmark rows.
    */
  def overlap(
      docs: DataFrame, idCol: String, textCol: String,
      benchFilter: Column, shingleSize: Int = 3): DataFrame = {
    val long = docs
      .select(col(idCol).as("doc_id"),
        explode(TextStats.shingles(TextStats.tokens(col(textCol)), shingleSize))
          .as("s"))
    val benchShingles = long.filter(benchFilter).select("s").distinct()
    long.filter(!benchFilter)
      .join(broadcast(benchShingles), Seq("s"))
      .groupBy("doc_id")
      .agg(count_distinct(col("s")).as("n_contaminated_shingles"))
  }

  /** Sketch-based variant of [[overlap]] for when even the benchmark's
    * distinct-shingle SET is too large to broadcast as rows (a full
    * eval-suite federation against a 100 TB corpus): the benchmark
    * shingles compress into a Bloom filter
    * (`org.apache.spark.util.sketch.BloomFilter` — Spark's public sketch
    * API, ~1.2 bytes/item at 1% fpp versus tens of bytes per broadcast
    * row), which broadcasts and probes MAP-SIDE: the corpus is touched by
    * one narrow pass, no join, no explode, no shuffle before the final
    * filter.
    *
    * Accuracy contract: NO false negatives — every truly contaminated doc
    * is flagged — while false positives over-flag clean shingles at
    * ≤ ~`fpp` each, the conservative direction for decontamination
    * (over-dropping costs a little clean data; under-dropping leaks eval
    * data into training). `n_flagged_shingles` is therefore an UPPER
    * bound on [[overlap]]'s exact count. Probabilistic ⇒ spec-pinned
    * against the exact form, not SQL-oracled.
    *
    * Probe path (round 12, closing the repo's last `udf(` in main): the
    * sketch is built by the codegen'd `bloom_agg` aggregate
    * (`BloomFilterAggregate`, xxhash64-keyed — one partial-aggregated
    * pass, one binary row to the driver) and probed per shingle with
    * `bloom_probe` inside a higher-order `filter` lambda — the whole
    * per-row count stays in whole-stage codegen, no closure, no
    * serialization boundary. The sketch re-enters the plan as a literal
    * (the same shape as [[graft.operators.BloomPrune.prunedJoin]] and
    * Spark's own injected runtime filters): ~1.2 MB at the 1M-item
    * default. `BloomFilterMightContain` requires a FOLDABLE sketch
    * argument, so a broadcast-variable probe is not expressible without
    * a UDF — past ~10M expected items, where the task-binary literal
    * gets heavy, size the sketch down and accept a higher fpp (still
    * zero false negatives) or fall back to the exact [[overlap]] join.
    * Sizing: `expectedItems` must be >= the benchmark's distinct-shingle
    * count or the realized fpp degrades (monitor with [[overlap]] on a
    * sample).
    */
  def overlapBloom(
      docs: DataFrame, idCol: String, textCol: String,
      benchFilter: Column, shingleSize: Int = 3,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val shingled = docs.select(col(idCol).as("doc_id"),
      TextStats.shingles(TextStats.tokens(col(textCol)), shingleSize).as("shingles"))
    val sketch = shingled.filter(benchFilter)
      .select(explode(col("shingles")).as("s"))
      .agg(call_function("bloom_agg", xxhash64(col("s")),
        lit(expectedItems),
        lit(graft.operators.BloomPrune.optimalNumBits(expectedItems, fpp))))
      .head.getAs[Array[Byte]](0)
    // null-tolerant: a NULL text shingles to a NULL array, and one such
    // row must not kill the whole decontamination pass (the untrusted-
    // corpus stance of Multimodal's guards) — size(NULL) is -1, so the
    // count is guarded to 0. An empty benchmark side yields a null
    // sketch: nothing can be contaminated, the result is empty.
    val nFlagged =
      if (sketch == null) lit(0)
      else when(col("shingles").isNull, 0).otherwise(
        size(filter(col("shingles"),
          s => call_function("bloom_probe", lit(sketch), xxhash64(s)))))
    shingled.filter(!benchFilter)
      .withColumn("n_flagged_shingles", nFlagged)
      .filter(col("n_flagged_shingles") >= 1)
      .select("doc_id", "n_flagged_shingles")
  }

  /** Embedding-space decontamination — the semantic twin of [[overlap]]:
    * flag every training vector whose cosine against ANY benchmark vector
    * reaches `threshold` (a paraphrased eval question shares no shingles
    * with its source, so lexical overlap alone under-flags; scoring in
    * embedding space is the standard complement in public LLM data
    * pipelines). One row per contaminated training vector with the hit
    * count and the max score, so the caller can anti-join (drop) or audit
    * (rank by `max_score`).
    *
    * Scale shape — cell-blocked like [[Similarity.semanticClustersCells]],
    * multi-probed like [[Similarity.ivfTopK]]: the corpus side is assigned
    * to its single nearest-centroid cell (row-local against broadcast
    * centroids, never shuffled), while the BENCHMARK side — small by
    * nature, like [[overlap]]'s shingle set — probes its `nprobe` nearest
    * cells and broadcasts. The bucket join therefore touches only corpus
    * rows whose cell some benchmark vector probes; everything else dies
    * map-side, and the per-doc aggregation runs over candidate hits only.
    * A training vector sits in exactly one cell, so a (train, bench) pair
    * can arise from at most one probed bucket — counts need no dedup.
    *
    * Recall contract: unlike [[overlapBloom]]'s no-false-negative
    * guarantee, cell blocking can miss a pair straddling a cell border
    * (the q48b trade). Multi-probing the benchmark side is the cheap
    * recall lever — |bench| × nprobe broadcast rows recover border pairs
    * at ZERO extra corpus-side cost; raise `nprobe` (or fall back to the
    * exact brute-force join over a corpus SAMPLE to measure the realized
    * miss rate) when eval leakage matters more than compute.
    *
    * Centroid-cardinality caveat (measured, `bench_records/
    * r13_scale_q24b.jsonl`): with the fixture's `%100` centroid
    * convention the broadcast assignment scores N × N/100 pairs —
    * quadratic, exactly the term q16f's √N geometry exists to kill —
    * and the solo ladder shows it arriving: 1.3 s → 5.5 s → 52 s across
    * the sf0.1 → 10× → 100× decades (4.3×, then 9.5×). At 100 TB pin a
    * FIXED centroid set trained offline (the
    * [[graft.streaming.StreamingSemanticDedup]] ingest convention) or
    * derive k = ⌈√N⌉ the q16f way; the operator takes whatever
    * `centroidFilter` selects, so the fix is the caller's one line.
    */
  def semanticOverlap(
      vectorsDf: DataFrame, idCol: String, embCol: String,
      benchFilter: Column, centroidFilter: Column,
      threshold: Double, nprobe: Int = 2): DataFrame = {
    val n = vectorsDf.select(col(idCol).as("id"),
      Similarity.asDouble(col(embCol)).as("emb"))
    val centroids = n.filter(centroidFilter)
    val train = Similarity.ivfAssign(n.filter(!benchFilter), centroids)
    val bench = Similarity.probeBuckets(n.filter(benchFilter), centroids, nprobe)
    train.join(broadcast(bench), Seq("bucket"))
      .withColumn("score",
        round(Similarity.fusedCosine(col("emb"), col("q_emb")), 6))
      .filter(col("score") >= threshold)
      .select(col("id").as("vec_id"), col("score"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_bench_hits"), max("score").as("max_score"))
  }
}
