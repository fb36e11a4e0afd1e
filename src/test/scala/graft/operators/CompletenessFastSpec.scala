package graft.operators

import graft.SparkTestBase
import graft.fixtures.EventCatalogFixture

/** The json_tuple single-parse fast path must be output-identical to the
  * reference-shaped get_json_object chains over the full fixture catalog
  * (nulls, malformed JSON, empty strings, every chain slot).
  */
class CompletenessFastSpec extends SparkTestBase {

  private val props = Seq("user_id", "k", "org_id", "project_id", "extra_key", "missing_prop")

  test("fast path == parity path over the corpus-backed catalog") {
    val cat = EventCatalogFixture.catalogDf(spark, "/root/testdata/sf0.001")
    val keep = Seq("event_name")
    val slow = Completeness.withValueColumns(cat, props, keep)
    val fast = Completeness.withValueColumnsFast(cat, props, keep)
    assert(fast.columns.toSeq == slow.columns.toSeq)
    assert(fast.exceptAll(slow).count() == 0)
    assert(slow.exceptAll(fast).count() == 0)
  }

  test("fast path rejects non-identifier property names") {
    val cat = EventCatalogFixture.catalogDf(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      Completeness.withValueColumnsFast(cat, Seq("bad-name"), Seq("event_name"))
    }
  }
}
