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
}
