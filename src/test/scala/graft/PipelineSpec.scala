package graft

import org.apache.spark.sql.functions._

import graft.fixtures.EventCatalogFixture
import graft.operators.Report

/** End-to-end pipeline tests on the sf0.001 corpus-backed fixture: golden
  * invariants plus single-plan vs reference-shaped mode equivalence.
  */
class PipelineSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val catalog = EventCatalogFixture.catalogDf(spark, dir)
  private lazy val specDf = EventCatalogFixture.specDf(spark)
  private lazy val params = PipelineQueries.params
  private lazy val report =
    EventsVerificationPipeline.run(catalog, specDf, params).cache()

  test("report has the exact 13-column contract in order") {
    assert(report.columns.toSeq == Report.outputColumns)
  }

  test("scalable single-plan mode == reference-shaped loop mode") {
    val parity = EventsVerificationPipeline.runParity(catalog, specDf, params)
    assert(report.exceptAll(parity).count() == 0)
    assert(parity.exceptAll(report).count() == 0)
  }

  test("invariant: value_null_count + value_not_null_count == total_records") {
    val bad = report.filter(
      col("value_null_count") + col("value_not_null_count") =!= col("total_records"))
    assert(bad.count() == 0)
  }

  test("invariant: percentages within [0, 100]") {
    val bad = report.filter(
      col("value_null_count_percentage") < 0 || col("value_null_count_percentage") > 100 ||
        col("key_null_count_percentage") < 0 || col("key_null_count_percentage") > 100)
    assert(bad.count() == 0)
  }

  test("invariant: key presence counts never exceed totals") {
    assert(report.filter(col("keys_not_null_count") > col("total_records")).count() == 0)
  }

  test("user_id rows carry the fill-after-derive quirk: all key metrics zero") {
    val u = report.filter(col("prop_name") === "user_id")
    assert(u.count() > 0)
    val bad = u.filter(
      col("keys_not_null_count") =!= 0 || col("key_null_count") =!= 0 ||
        col("key_null_count_percentage") =!= 0.0)
    assert(bad.count() == 0,
      "na.fill(0) after the derive must zero unobserved key metrics, not total-0")
  }

  test("spark.graft.cache.level=DISK_ONLY keeps data-scale caches off the unified region") {
    // the memory-pressure mitigation knob (EventsVerificationPipeline
    // .dataCacheLevel): under a tight heap the flagship's MEMORY_AND_DISK
    // cache unroll starves execution memory; DISK_ONLY is the verified fix,
    // and it must change ONLY the storage level, never a row of output
    spark.catalog.clearCache()
    spark.conf.set("spark.graft.cache.level", "DISK_ONLY")
    try {
      // Assert only on the persists the pipeline run ADDS: the session is
      // shared across suites, so asserting over ALL persistent RDDs would
      // fail spuriously if any other test leaves an RDD-level persist
      // behind (ADVICE r11).
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val out = EventsVerificationPipeline.run(catalog, specDf, params)
      val rows = out.collect().toSet
      assert(rows.nonEmpty)
      val levels = spark.sparkContext.getPersistentRDDs
        .collect { case (id, rdd) if !before.contains(id) => rdd.getStorageLevel }
        .toSeq
      assert(levels.nonEmpty, "the pipeline must persist its shredded catalog")
      assert(levels.forall(l => l.useDisk && !l.useMemory),
        s"every pipeline cache must honor DISK_ONLY, got $levels")
      spark.conf.unset("spark.graft.cache.level")
      spark.catalog.clearCache()
      val defaultRows =
        EventsVerificationPipeline.run(catalog, specDf, params).collect().toSet
      assert(rows == defaultRows, "storage level must not change the report")
    } finally {
      spark.conf.unset("spark.graft.cache.level")
      spark.catalog.clearCache()
    }
  }

  test("cache-level conf matrix: every StorageLevel name takes effect on the pipeline persist") {
    // keeps the knob from rotting (VERDICT r11 #7): for each supported
    // level name the pipeline's own persist must carry exactly that level
    // (asserted on the RDDs the run adds, not the shared session's total)
    val levels = Seq(
      "DISK_ONLY" -> ((l: org.apache.spark.storage.StorageLevel) => l.useDisk && !l.useMemory),
      "MEMORY_ONLY" -> ((l: org.apache.spark.storage.StorageLevel) => l.useMemory && !l.useDisk),
      "MEMORY_AND_DISK" -> ((l: org.apache.spark.storage.StorageLevel) => l.useMemory && l.useDisk),
      "MEMORY_AND_DISK_SER" -> ((l: org.apache.spark.storage.StorageLevel) => l.useMemory && l.useDisk))
    try levels.foreach { case (name, pred) =>
      spark.catalog.clearCache()
      spark.conf.set("spark.graft.cache.level", name)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      EventsVerificationPipeline.run(catalog, specDf, params).count()
      val added = spark.sparkContext.getPersistentRDDs
        .collect { case (id, rdd) if !before.contains(id) => rdd.getStorageLevel }
      assert(added.nonEmpty, s"$name: pipeline must persist its shredded catalog")
      assert(added.forall(pred), s"$name not honored, got $added")
    } finally {
      spark.conf.unset("spark.graft.cache.level")
      spark.catalog.clearCache()
    }
  }

  test("stale spec versions are dropped by the W1 latest-version pick") {
    assert(report.filter(col("prop_name") === "old_k").count() == 0)
    assert(report.filter(col("version") =!= "2.1").count() == 0)
  }

  test("exclusion quirk: the signup row's channel-valued cell is not a property") {
    assert(report.filter(col("prop_name") === "web").count() == 0)
    // signup still reports its real prop + implicit user_id
    val signupProps = report.filter(col("event_name") === "signup")
      .select("prop_name").collect().map(_.getString(0)).toSet
    assert(signupProps == Set("k", "user_id"))
  }

  test("metadata stamps: release_date=process_date, event_date=param") {
    val distinct = report.select("release_date", "event_date").distinct().collect()
    assert(distinct.length == 1)
    assert(distinct(0).getString(0) == EventCatalogFixture.processDate)
    assert(distinct(0).getString(1) == EventCatalogFixture.eventDate)
  }
}
