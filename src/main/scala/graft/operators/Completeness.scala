package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Value-completeness extraction and metrics — the reference's entry point 3
  * (`event_verify.py:142-206`): per defined property, extract a value from
  * the JSON payloads, then count null/non-null occurrences per
  * (event, property).
  */
object Completeness {

  private def jes(c: String, path: String): Column =
    nullif(get_json_object(col(c), path), lit(""))

  /** The 7-way org-id precedence chain (`event_verify.py:156-160`). Order is
    * load-bearing: context.traits.organisation_id, traits.organisation_id,
    * properties.organisation_id, traits.ord_id, properties.meta_data.org_id,
    * properties.org_id, properties.orgId — each empty-string-normalized to
    * null via `nullif`.
    */
  def orgIdExpr: Column = coalesce(
    jes("context", "$.traits.organisation_id"),
    jes("traits", "$.organisation_id"),
    jes("properties", "$.organisation_id"),
    jes("traits", "$.ord_id"),
    jes("properties", "$.meta_data.org_id"),
    jes("properties", "$.org_id"),
    jes("properties", "$.orgId"))

  /** The 4-way project-id chain (`event_verify.py:161-165`). */
  def projectIdExpr: Column = coalesce(
    jes("context", "$.traits.project_id"),
    jes("properties", "$.project_id"),
    jes("properties", "$.meta_data.project_id"),
    jes("traits", "$.project_id"))

  /** Generic property extraction (`event_verify.py:166-174`): `$.prop` from
    * `context`, falling back to `properties` ONLY when the context value is
    * null — an empty string from context is kept (no `nullif` here, unlike
    * the org/project chains; parity-relevant).
    */
  def genericExpr(prop: String): Column = {
    val fromContext = get_json_object(col("context"), s"$$.$prop")
    when(fromContext.isNull, get_json_object(col("properties"), s"$$.$prop"))
      .otherwise(fromContext)
  }

  /** Per-property value expression (`event_verify.py:153-174`): `org_id` and
    * `project_id` get their special chains, everything else the generic
    * context→properties fallback. `user_id` passes the raw column through
    * (it enters the completeness frame as a selected column,
    * `event_verify.py:145`).
    */
  def valueExpr(prop: String): Column = prop match {
    case "user_id"    => col("user_id")
    case "org_id"     => orgIdExpr
    case "project_id" => projectIdExpr
    case p            => genericExpr(p)
  }

  private def quoteLabel(s: String): String = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
  private def quoteCol(s: String): String = "`" + s.replace("`", "``") + "`"

  /** V1 — dynamic unpivot via `stack` (`event_verify.py:186-198`): the wide
    * (one column per property) frame goes long to (prop_name, value). Every
    * value column is cast to string first because `stack` requires a common
    * type — exactly why the reference casts at `event_verify.py:190`.
    * `stack` keeps null values as rows (null-safe unpivot), which the
    * null-count metrics rely on.
    *
    * `df` must carry one column per entry in `props` (see
    * [[withValueColumns]]) plus `keepCols`.
    */
  def unpivot(df: DataFrame, props: Seq[String], keepCols: Seq[String]): DataFrame = {
    require(props.nonEmpty, "unpivot needs at least one property column")
    val arms = props.map(p => s"${quoteLabel(p)}, CAST(${quoteCol(p)} AS STRING)").mkString(", ")
    val stackExpr = s"stack(${props.size}, $arms) AS (prop_name, value)"
    df.selectExpr(keepCols :+ stackExpr: _*)
  }

  /** Adds one extracted-value column per property (the reference's
    * `withColumn` loop, `event_verify.py:153-174`). Property names are used
    * verbatim as column names, mirroring the reference; callers pass
    * `keepCols` for the passthrough columns (event name, channel, …).
    */
  def withValueColumns(catalog: DataFrame, props: Seq[String], keepCols: Seq[String]): DataFrame = {
    val cols = keepCols.map(col) ++ props.map(p => valueExpr(p).as(p))
    catalog.select(cols: _*)
  }

  /** Single-parse fast path for [[withValueColumns]]: `get_json_object`
    * parses its payload on EVERY call, so the org/project chains plus the
    * generic fallbacks cost ~15 Jackson parses per row; this variant parses
    * each payload (and each carved-out sub-object) exactly ONCE via chained
    * `json_tuple` generators — 5 parses per row — then assembles the same
    * chains from the materialized fields.
    *
    * Output-identical to the parity path (`json_tuple` and
    * `get_json_object` agree on null-on-malformed, unquoted string values,
    * and raw JSON text for object values); asserted by
    * CompletenessFastSpec, and the unchanged DuckDB oracles hold.
    */
  def withValueColumnsFast(catalog: DataFrame, props: Seq[String], keepCols: Seq[String]): DataFrame = {
    val generic = props.filterNot(Set("user_id", "org_id", "project_id"))
    require(
      props.forall(p => p.matches("[A-Za-z_][A-Za-z0-9_]*")),
      s"fast path requires identifier-shaped property names, got $props")

    def jt(src: Column, fields: Seq[String], out: Seq[String]): Column =
      json_tuple(src, fields: _*).as(out)

    val keep = keepCols.map(col)
    // one generator per select: context, properties, traits, then the two
    // nested sub-objects carved out of the first two parses
    val s1 = catalog.select(
      keep ++ Seq(col("user_id"), col("traits"), col("properties")) :+
        jt(col("context"), "traits" +: generic,
          "__ctx_traits" +: generic.map(p => s"__ctx_$p")): _*)
    val s2 = s1.select(
      s1.columns.filterNot(_ == "properties").map(col) :+
        jt(col("properties"),
          generic ++ Seq("organisation_id", "org_id", "orgId", "project_id", "meta_data"),
          generic.map(p => s"__pr_$p") ++
            Seq("__pr_orgn", "__pr_org", "__pr_orgid", "__pr_proj", "__pr_meta")): _*)
    val s3 = s2.select(
      s2.columns.filterNot(_ == "traits").map(col) :+
        jt(col("traits"), Seq("organisation_id", "ord_id", "project_id"),
          Seq("__tr_orgn", "__tr_ord", "__tr_proj")): _*)
    val s4 = s3.select(
      s3.columns.map(col) :+
        jt(col("__ctx_traits"), Seq("organisation_id", "project_id"),
          Seq("__ct_orgn", "__ct_proj")): _*)
    val s5 = s4.select(
      s4.columns.map(col) :+
        jt(col("__pr_meta"), Seq("org_id", "project_id"),
          Seq("__pm_org", "__pm_proj")): _*)

    def nz(c: String): Column = nullif(col(c), lit(""))
    val valueCols = props.map {
      case "user_id" => col("user_id").as("user_id")
      case "org_id" =>
        coalesce(nz("__ct_orgn"), nz("__tr_orgn"), nz("__pr_orgn"),
          nz("__tr_ord"), nz("__pm_org"), nz("__pr_org"), nz("__pr_orgid")).as("org_id")
      case "project_id" =>
        coalesce(nz("__ct_proj"), nz("__pr_proj"), nz("__pm_proj"), nz("__tr_proj")).as("project_id")
      case p =>
        when(col(s"__ctx_$p").isNull, col(s"__pr_$p")).otherwise(col(s"__ctx_$p")).as(p)
    }
    s5.select(keep ++ valueCols: _*)
  }

  /** Single-pass null-count metrics over the long (prop_name, value) frame —
    * the optimized replacement for the reference's
    * `collect_list` → `array_compact` → `size` chain plus its three repeated
    * `count()` actions (`event_verify.py:199-206`, SURVEY §2.11(5)(6)):
    * `count(value)` ≡ `size(array_compact(collect_list(value)))` and
    * `count(*)` ≡ the repeated `completeness_data.count()`, but in ONE
    * partial-aggregatable job with no order-nondeterministic array building.
    */
  def metrics(long: DataFrame, groupCols: Seq[String]): DataFrame =
    derived(partialMetrics(long, groupCols))

  /** The ALGEBRAIC core of [[metrics]]: just the two additive counts, no
    * derived columns — the per-batch partial an incremental maintainer
    * ([[graft.streaming.StreamingReport]]) appends to its partials table.
    * Partials from disjoint row sets merge by summation
    * ([[mergedMetrics]]), exactly like Spark's own partial aggregation;
    * the non-additive columns (null count, percentage) are derived only
    * after the merge.
    */
  def partialMetrics(long: DataFrame, groupCols: Seq[String]): DataFrame =
    long
      .groupBy((groupCols :+ "prop_name").map(col): _*)
      .agg(
        count(lit(1)).as("total_records"),
        count(col("value")).as("value_not_null_count"))

  /** Merge [[partialMetrics]] rows from any number of batches into the
    * same frame [[metrics]] produces over the union of those batches:
    * counts are additive over disjoint row sets, so `sum` + re-derive is
    * exact (no approximation anywhere).
    */
  def mergedMetrics(partials: DataFrame, groupCols: Seq[String]): DataFrame =
    derived(
      partials
        .groupBy((groupCols :+ "prop_name").map(col): _*)
        .agg(
          sum(col("total_records")).as("total_records"),
          sum(col("value_not_null_count")).as("value_not_null_count")))

  private def derived(counts: DataFrame): DataFrame =
    counts
      .withColumn("value_null_count", col("total_records") - col("value_not_null_count"))
      .withColumn(
        "value_null_count_percentage",
        col("value_null_count") * 100 / col("total_records"))
}
