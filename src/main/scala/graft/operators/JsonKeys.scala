package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** JSON key enumeration over string-typed JSON payload columns.
  *
  * Re-expresses the reference's key-extraction branches
  * (`event_verify.py:51-61`): top-level `json_object_keys`, plus the two
  * nested variants that first carve out a sub-object with
  * `get_json_object` (`$.traits` from `context`, `$.meta_data` from
  * `properties`) and enumerate its keys.
  *
  * All of this is built-in Catalyst expressions (`JsonObjectKeys`,
  * `GetJsonObject`, `Explode`) — fully codegen/pushdown friendly, no UDFs.
  */
object JsonKeys {

  /** Keys of a top-level JSON object column (null-safe: null/malformed → null array). */
  def keysOf(col: Column): Column = json_object_keys(col)

  /** Keys of a nested object at `path` inside JSON string `col`
    * (`event_verify.py:54-61`). */
  def nestedKeysOf(col: Column, path: String): Column =
    json_object_keys(get_json_object(col, path))

  /** One row per distinct key observed across the given extractors, i.e. the
    * reference's 5-way union + distinct (`event_verify.py:51-62`).
    *
    * Implementation note (scale): rather than N separate scans unioned (the
    * reference re-scans the cached catalog 5×), this produces ONE scan that
    * concatenates the per-payload key arrays and explodes once; `distinct`
    * is then a single hash-aggregate shuffle on the key column.
    */
  def allKeys(df: DataFrame, extractors: Seq[Column]): DataFrame = {
    val arrays = extractors.map(e => coalesce(e, array().cast(ArrayType(StringType))))
    df.select(explode(array_distinct(concat(arrays: _*))).as("key")).distinct()
  }

  /** The reference's exact 5 extractors for the event-catalog schema. */
  def catalogKeyExtractors(): Seq[Column] = Seq(
    keysOf(col("context")),
    keysOf(col("traits")),
    keysOf(col("properties")),
    nestedKeysOf(col("context"), "$.traits"),
    nestedKeysOf(col("properties"), "$.meta_data")
  )

  /** Per-row merged key array (`event_verify.py:77-93`): org/project flag
    * arrays ++ per-payload key arrays, deduplicated.
    *
    * `array()` in Scala is `ArrayType(NullType)`; the cast to
    * `array<string>` is required for `concat` to typecheck (SURVEY §2.8 F4).
    */
  def mergedKeys(
      orgFlag: Column,
      projectFlag: Column,
      propertiesKeys: Column,
      contextKeys: Column): Column = {
    val empty = array().cast(ArrayType(StringType))
    array_distinct(concat(
      when(orgFlag, array(lit("org_id"))).otherwise(empty),
      when(projectFlag, array(lit("project_id"))).otherwise(empty),
      coalesce(propertiesKeys, empty),
      coalesce(contextKeys, empty)
    ))
  }
}
