package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ShredSpec

/** The event catalog's three JSON payloads (`context`, `traits`,
  * `properties`) parsed ONCE each per row into struct columns, with every
  * downstream extraction — the 5-way key sweep (`event_verify.py:51-61`),
  * the org/project coalesce chains (`event_verify.py:156-165`), the generic
  * context→properties fallback (`:166-174`), and the `$.app.version` filter
  * key (`:42-43`) — re-derived as cheap struct-field reads.
  *
  * Compare: the reference's expression set costs ~7 payload parses per row
  * for the key sweep plus ~15 for the completeness chains, all through
  * interpreter-bound built-ins. Here [[graft.functions.JsonShred]] runs 3
  * parses per row inside whole-stage codegen, and a pipeline that persists
  * the shredded frame parses each payload once for ALL downstream passes.
  *
  * `CollapseProject` does not inline non-cheap expressions referenced more
  * than once, and subexpression elimination dedups equal shred calls within
  * a projection, so each shred is evaluated once per row.
  */
object PayloadShred {

  val CtxCol = "__ctx"
  val TrCol = "__tr"
  val PrCol = "__pr"

  /** Column-level `json_shred` call (requires [[graft.GraftExtensions]] on
    * the session, like `cosine_sim`).
    */
  def shred(payload: Column, topKeys: Boolean, fields: Seq[String], nested: Seq[String]): Column =
    call_function("json_shred", payload,
      lit(topKeys), lit(fields.mkString(",")), lit(nested.mkString(",")))

  private def f(struct: String, path: String): Column =
    col(struct).getField(ShredSpec.fieldSlotName(path))
  private def nk(struct: String, field: String): Column =
    col(struct).getField(ShredSpec.nestedSlotName(field))
  private def keysOf(struct: String): Column = col(struct).getField("keys")

  /** Adds [[CtxCol]]: context keys, `$.traits` nested keys, the
    * traits.organisation_id / traits.project_id chain slots, the generic
    * property fields, and (optionally) `$.app.version`.
    *
    * Split from [[withPayloadShreds]] so a version-filtering pipeline can
    * shred only `context` before the filter join and the other two payloads
    * after it — filtered-out rows never pay the traits/properties parse.
    */
  def withContextShred(
      df: DataFrame, genericProps: Seq[String], withVersion: Boolean): DataFrame = {
    val ctxFields =
      (if (withVersion) Seq("app.version") else Nil) ++
        Seq("traits.organisation_id", "traits.project_id") ++ genericProps
    df.withColumn(CtxCol, shred(col("context"), topKeys = true, ctxFields, Seq("traits")))
  }

  /** Adds [[TrCol]] and [[PrCol]] (traits and properties shreds). */
  def withPayloadShreds(df: DataFrame, genericProps: Seq[String]): DataFrame = {
    val trFields = Seq("organisation_id", "ord_id", "project_id")
    val prFields = genericProps ++
      Seq("organisation_id", "org_id", "orgId", "project_id",
        "meta_data.org_id", "meta_data.project_id")
    df.withColumn(TrCol, shred(col("traits"), topKeys = true, trFields, Nil))
      .withColumn(PrCol, shred(col("properties"), topKeys = true, prFields, Seq("meta_data")))
  }

  /** All three shreds in one go (non-version-filtering queries). */
  def withShreds(
      df: DataFrame,
      genericProps: Seq[String] = Nil,
      withVersion: Boolean = false): DataFrame =
    withPayloadShreds(withContextShred(df, genericProps, withVersion), genericProps)

  /** `$.app.version` (the reference's spec-version filter key). */
  def versionExpr: Column = f(CtxCol, "app.version")

  /** The reference's exact 5 key extractors (`event_verify.py:51-61`), as
    * struct reads — same output as [[JsonKeys.catalogKeyExtractors]].
    */
  def keyExtractors: Seq[Column] = Seq(
    keysOf(CtxCol),
    keysOf(TrCol),
    keysOf(PrCol),
    nk(CtxCol, "traits"),
    nk(PrCol, "meta_data"))

  /** Top-level key arrays for [[JsonKeys.mergedKeys]] (properties, context). */
  def propertiesKeys: Column = keysOf(PrCol)
  def contextKeys: Column = keysOf(CtxCol)

  private def nz(c: Column): Column = nullif(c, lit(""))

  /** Twin of [[Completeness.orgIdExpr]] over the shred structs: the 7-way
    * precedence chain (`event_verify.py:156-160`), empty-string-normalized.
    */
  def orgIdExpr: Column = coalesce(
    nz(f(CtxCol, "traits.organisation_id")),
    nz(f(TrCol, "organisation_id")),
    nz(f(PrCol, "organisation_id")),
    nz(f(TrCol, "ord_id")),
    nz(f(PrCol, "meta_data.org_id")),
    nz(f(PrCol, "org_id")),
    nz(f(PrCol, "orgId")))

  /** Twin of [[Completeness.projectIdExpr]] (`event_verify.py:161-165`). */
  def projectIdExpr: Column = coalesce(
    nz(f(CtxCol, "traits.project_id")),
    nz(f(PrCol, "project_id")),
    nz(f(PrCol, "meta_data.project_id")),
    nz(f(TrCol, "project_id")))

  /** Twin of [[Completeness.genericExpr]]: context wins unless NULL (an
    * empty string from context is kept — no nullif, parity-relevant).
    */
  def genericExpr(prop: String): Column =
    when(f(CtxCol, prop).isNull, f(PrCol, prop)).otherwise(f(CtxCol, prop))

  def valueExpr(prop: String): Column = prop match {
    case "user_id"    => col("user_id")
    case "org_id"     => orgIdExpr
    case "project_id" => projectIdExpr
    case p            => genericExpr(p)
  }

  /** Shred-struct twin of [[Completeness.withValueColumns]]: one extracted
    * column per property, reading the already-parsed structs. `df` must
    * carry the shred columns (see [[withShreds]]).
    */
  def withValueColumns(df: DataFrame, props: Seq[String], keepCols: Seq[String]): DataFrame =
    df.select(keepCols.map(col) ++ props.map(p => valueExpr(p).as(p)): _*)

  /** The generic (non-special) property names of `props` — the ones that
    * must be declared as shred fields.
    */
  def genericProps(props: Seq[String]): Seq[String] =
    props.filterNot(Set("user_id", "org_id", "project_id"))
}
