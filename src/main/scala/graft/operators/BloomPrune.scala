package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join pruning: filter a fact table map-side, BEFORE its
  * shuffle, down to rows whose key might exist on the (already filtered)
  * dimension side.
  *
  * The 100 TB problem this solves: `fact JOIN dim ON k` where `dim` is
  * selective but too large to broadcast as a hash relation shuffles the
  * ENTIRE fact table — petabytes of exchange for a join that keeps a
  * fraction of it. A Bloom filter over `dim`'s keys costs ~1.2 bytes/key
  * at 1% fpp (vs tens of bytes/row for a broadcast hash table), so the
  * key-set of a dimension far past the broadcast ceiling still fits in a
  * plan-shipped sketch, and the fact side drops non-joining rows at the
  * scan, paying shuffle only for survivors.
  *
  * Correctness: a Bloom filter has NO false negatives — even oversaturated
  * (more distinct keys than `expectedItems`) it only degrades toward more
  * false positives, never fewer true ones — and the exact join re-checks
  * every surviving row, so the result is ALWAYS identical to the plain
  * join; `expectedItems` tunes pruning power, not correctness. That
  * identity is what lets q67 share a plain-join DuckDB oracle.
  *
  * Mechanism: Spark's own runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the machinery
  * behind `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`,
  * SPARK-32268), surfaced as `bloom_agg`/`bloom_probe` by
  * [[graft.GraftExtensions]]. The optimizer's automatic injection is off
  * by default and gated on size/selectivity heuristics that miss
  * hand-known-selective dimensions; this operator places the same
  * codegen'd probe explicitly. The sketch collects to the driver as one
  * binary row (bounded: `numBits/8` bytes, ~150 KB at the defaults — a
  * sketch, never data) and re-enters the plan as a literal, exactly how
  * the optimizer's injected filter executes its scalar subquery. Past
  * ~10M expected keys the literal gets heavy in the task binary —
  * `BloomFilterMightContain` requires a foldable sketch, so the options
  * there are a smaller sketch at higher fpp (correctness unaffected — the
  * join re-checks) or a broadcast-variable probe behind a UDF (the repo
  * keeps none; [[graft.llm.Contamination.overlapBloom]] documents the same
  * trade-off for its count-only probe, which no exact join re-checks).
  */
object BloomPrune {

  /** Optimal Bloom bit count for `n` items at false-positive rate `p`:
    * ceil(-n ln p / (ln 2)^2) — the standard sizing formula.
    */
  def optimalNumBits(n: Long, p: Double): Long = {
    require(n > 0, s"expectedItems must be positive, got $n")
    require(p > 0 && p < 1, s"fpp must be in (0, 1), got $p")
    math.ceil(-n * math.log(p) / (math.log(2) * math.log(2))).toLong
  }

  /** Serialized Bloom filter over `dim`'s `keyCol` (one partial-aggregated
    * pass, one binary row to the driver). Null on an empty `dim`.
    */
  def bloomOf(dim: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] =
    dim.agg(call_function("bloom_agg",
        xxhash64(col(keyCol)),
        lit(expectedItems), lit(optimalNumBits(expectedItems, fpp))))
      .head.getAs[Array[Byte]](0)

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-filtered
    * through a Bloom sketch of `dim`'s keys so non-joining fact rows die
    * map-side instead of shuffling. Column names must be disjoint. Result
    * is row-identical to the plain inner join (see object scaladoc); rows
    * with a null fact key never pass the probe — the same rows an inner
    * join drops.
    */
  def prunedJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val dup = fact.columns.toSet.intersect(dim.columns.toSet)
    require(dup.isEmpty,
      s"fact/dim column names must be disjoint, shared: ${dup.mkString(", ")}")
    val sketch = bloomOf(dim, dimKey, expectedItems, fpp)
    val pruned =
      if (sketch == null) fact.filter(lit(false)) // empty dim: empty join
      else fact.filter(
        col(factKey).isNotNull &&
          call_function("bloom_probe", lit(sketch), xxhash64(col(factKey))))
    pruned.join(dim, col(factKey) === col(dimKey))
  }
}
