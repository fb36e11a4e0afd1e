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
    * This is one of the repo's few deliberate UDFs: a sketch probe has no
    * built-in Column form, the UDF is a pure per-row function over an
    * executor-local broadcast (no state, no shuffle), and the alternative
    * — exploding the corpus to join a shingle table — is exactly the cost
    * this variant exists to avoid. Sizing: `expectedItems` must be >= the
    * benchmark's distinct-shingle count or the realized fpp degrades
    * (monitor with [[overlap]] on a sample).
    */
  def overlapBloom(
      docs: DataFrame, idCol: String, textCol: String,
      benchFilter: Column, shingleSize: Int = 3,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val shingled = docs.select(col(idCol).as("doc_id"),
      TextStats.shingles(TextStats.tokens(col(textCol)), shingleSize).as("shingles"))
    val bf = shingled.filter(benchFilter)
      .select(explode(col("shingles")).as("s"))
      .stat.bloomFilter("s", expectedItems, fpp)
    // Broadcast lifecycle: the UDF closure is the only reference, so the
    // ContextCleaner reclaims the blocks once the returned frame becomes
    // unreachable — no caller-side destroy() to get wrong.
    val bfBc = docs.sparkSession.sparkContext.broadcast(bf)
    // null-tolerant: a NULL text shingles to a NULL array, and one such
    // row must not NPE the whole decontamination pass (the untrusted-
    // corpus stance of Multimodal's guards)
    val flagged = udf((ss: Seq[String]) =>
      if (ss == null) 0 else ss.count(bfBc.value.mightContainString))
    shingled.filter(!benchFilter)
      .withColumn("n_flagged_shingles", flagged(col("shingles")))
      .filter(col("n_flagged_shingles") >= 1)
      .select("doc_id", "n_flagged_shingles")
  }
}
