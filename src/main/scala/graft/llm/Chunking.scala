package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence shaping: split long documents into overlapping
  * token-window chunks, and pack a corpus into fixed-token-budget training
  * sequences — the two operations between "cleaned corpus" and "batches a
  * trainer can consume".
  *
  * Both are pure narrow/window plans: chunking is a per-row generator (no
  * shuffle at all), packing is one shuffle keyed on the pack group. Nothing
  * here collects to the driver.
  */
object Chunking {

  /** Overlapping token-window chunks: for window size `windowTokens` W and
    * stride `strideTokens` S, a document with n tokens yields one chunk per
    * start offset s ∈ {0, S, 2S, …} with s < n, covering tokens
    * [s+1, min(n, s+W)] (1-based). Tail chunks are shorter than W; an empty
    * document yields no chunks. Output columns:
    * (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    *
    * Plan shape: tokenize once, generate start offsets with `sequence`,
    * `posexplode`, slice — all inside one projection + generator, no
    * shuffle, so it scales linearly and survives any data size that the
    * scan itself survives.
    */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, strideTokens: Int): DataFrame = {
    require(windowTokens > 0 && strideTokens > 0 && strideTokens <= windowTokens,
      s"need 0 < stride <= window, got window=$windowTokens stride=$strideTokens")
    val n = size(col("toks"))
    // sequence(0, n-1, S) enumerates starts < n; empty docs get an empty
    // typed array (sequence would reject start > stop with a positive step)
    val starts = when(n > 0, sequence(lit(0), n - 1, lit(strideTokens)))
      .otherwise(array().cast("array<int>"))
    df.select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"),
        posexplode(starts).as(Seq("chunk_id", "chunk_start")))
      .select(
        col("id"), col("chunk_id"), col("chunk_start"),
        size(slice(col("toks"), col("chunk_start") + 1, lit(windowTokens)))
          .as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(windowTokens)), " ")
          .as("chunk_text"))
  }

  /** Contiguous greedy packing (concat-then-split): within each pack group,
    * documents are laid end-to-end in deterministic `orderCol` order and the
    * resulting token stream is cut every `budgetTokens` B; a document is
    * assigned to the sequence its FIRST token falls in
    * (`bin = floor(offset / B)`, `offset` = tokens before it in the group).
    * Documents longer than B span bins — chunk with [[chunk]] first when
    * that matters. Output: group/order/token-count columns plus
    * (offset, bin).
    *
    * Scale shape: the running offset is a window cumsum PARTITIONED BY the
    * pack group — an un-partitioned global cumsum would serialize onto one
    * task, the classic window scale-killer, so the group key (shard, corpus
    * slice, language…) is required, parallelism = #groups, and one shuffle
    * on the group key is the whole cost. The frame is pinned to ROWS
    * UNBOUNDED PRECEDING..CURRENT so ties in `orderCol` cannot flip to
    * RANGE semantics.
    */
  def pack(
      df: DataFrame, groupCol: String, orderCol: String,
      nTokensCol: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", nTokensCol)
      .withColumn("offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("offset") / budgetTokens))
  }

  /** Materialize [[pack]]'s bin assignment into actual training sequences:
    * one row per (group, bin) with the member texts concatenated in
    * `orderCol` order. `seq_tokens` can exceed the budget when a document
    * straddles a bin boundary (pack assigns by FIRST token; chunk long docs
    * first when strict budgets matter).
    *
    * The in-order concat is collect_list → array_sort on a (order, text)
    * struct → join: sort_array of structs orders by the leading field, so
    * the result is deterministic regardless of arrival order. One shuffle
    * on (group, bin); a bin holds ~budget tokens of text by construction,
    * so collect_list state per group is bounded by the budget, not by data
    * size — the property that makes this safe at 100 TB.
    */
  def packedSequences(
      packed: DataFrame, groupCol: String, orderCol: String,
      textCol: String): DataFrame =
    packed.groupBy(col(groupCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("seq_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            x => x.getField(textCol)),
          " ").as("seq_text"))
}
