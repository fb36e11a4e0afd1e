package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CompletenessSpec extends SparkTestBase {
  import spark.implicits._

  test("orgIdExpr: precedence order and empty-string nullif (event_verify.py:156-160)") {
    val cases = Seq(
      // context.traits.organisation_id wins when present and non-empty
      ("""{"traits": {"organisation_id": "c1"}}""", """{"organisation_id": "t1"}""", """{"org_id": "p1"}""", "c1"),
      // empty string from the first slot falls through (nullif)
      ("""{"traits": {"organisation_id": ""}}""", """{"organisation_id": "t1"}""", "{}", "t1"),
      // traits.ord_id ranks above properties.meta_data.org_id
      ("{}", """{"ord_id": "t4"}""", """{"meta_data": {"org_id": "m5"}}""", "t4"),
      // last slot: properties.orgId
      ("{}", "{}", """{"orgId": "p7"}""", "p7")
    ).toDF("context", "traits", "properties", "expected")
    val out = cases.select(Completeness.orgIdExpr.as("v"), col("expected")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("genericExpr: context wins unless NULL — an empty string from context is KEPT") {
    val cases = Seq(
      ("""{"p": "cv"}""", """{"p": "pv"}"""),
      ("""{"p": ""}""", """{"p": "pv"}"""), // context empty string kept (no nullif, parity)
      ("{}", """{"p": "pv"}""") // context null -> properties fallback
    ).toDF("context", "properties")
    val out = cases.select(Completeness.genericExpr("p").as("v")).as[String].collect()
    assert(out.toSeq == Seq("cv", "", "pv"))
  }

  test("unpivot: stack keeps null values as rows; labels are the property names") {
    val wide = Seq(("e1", "a", null.asInstanceOf[String])).toDF("event_name", "p1", "p2")
    val long = Completeness.unpivot(wide, Seq("p1", "p2"), Seq("event_name"))
    val rows = long.collect().map(r => (r.getString(1), Option(r.getString(2)))).toSet
    assert(rows == Set(("p1", Some("a")), ("p2", None)))
  }

  test("metrics: single-pass counts equal the collect_list/array_compact/size chain") {
    val long = Seq(
      ("e1", "p1", "v"), ("e1", "p1", null), ("e1", "p1", ""),
      ("e1", "p2", null), ("e1", "p2", null)
    ).toDF("event_name", "prop_name", "value")
    val m = Completeness.metrics(long, Seq("event_name"))
      .select("prop_name", "total_records", "value_not_null_count", "value_null_count", "value_null_count_percentage")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    // empty string counts as NOT null (array_compact only strips nulls)
    assert(m == Set(("p1", 3L, 2L, 1L, 100.0 / 3), ("p2", 2L, 0L, 2L, 100.0)))
  }
}
