package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{EventsVerificationPipeline, PipelineQueries, SparkTestBase}
import graft.fixtures.EventCatalogFixture

case class CatRow(
    client_name: String, event_name: String, user_id: String,
    context: String, traits: String, properties: String)

class StreamingReportSpec extends SparkTestBase {
  import spark.implicits._

  private val dataDir = "/root/testdata/sf0.001"

  test("two-trigger incremental report equals batch q06 row-for-row") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-streport").toFile.getAbsolutePath
    val spec = EventCatalogFixture.specDf(spark)
    val params = PipelineQueries.params
    val catalog = EventCatalogFixture.catalogDf(spark, dataDir)
    // interleaved halves: every payload shape (the mod-cycle arms of the
    // fixture) appears in BOTH batches, like time-sliced arrivals would
    val rows = catalog.as[CatRow].collect()
    val (b1, b2) = rows.zipWithIndex.partition(_._2 % 2 == 0)

    assert(!StreamingReport.hasPartials(spark, dir))
    val ms = MemoryStream[CatRow]
    val query = ms.toDS().toDF().writeStream
      .foreachBatch(StreamingReport.sink(spec, params, dir))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      ms.addData(b1.map(_._1).toSeq: _*)
      query.processAllAvailable()
      assert(StreamingReport.hasPartials(spark, dir))
      // mid-stream the report is already well-formed (half the counts)
      val mid = StreamingReport.reportToDate(spark, spec, params, dir).collect()
      assert(mid.nonEmpty)
      ms.addData(b2.map(_._1).toSeq: _*)
      query.processAllAvailable()
    } finally query.stop()

    val incremental = StreamingReport.reportToDate(spark, spec, params, dir)
    val batch = EventsVerificationPipeline.run(catalog, spec, params)
    assert(incremental.columns.toSeq == batch.columns.toSeq)
    val incSet = incremental.collect().toSet
    val batchSet = batch.collect().toSet
    assert(incSet == batchSet,
      s"incremental != batch:\nonly-inc=${incSet -- batchSet}\nonly-batch=${batchSet -- incSet}")
  }

  test("redelivered batch id is a no-op: summed partials never double-count") {
    val dir = Files.createTempDirectory("graft-streport-replay").toFile.getAbsolutePath
    val spec = EventCatalogFixture.specDf(spark)
    val params = PipelineQueries.params
    val catalog = EventCatalogFixture.catalogDf(spark, dataDir).limit(500)

    assert(StreamingReport.ingestBatch(catalog, 0L, spec, params, dir))
    val once = StreamingReport.reportToDate(spark, spec, params, dir).collect().toSet
    // at-least-once delivery replays the SAME batch id: must be skipped
    assert(!StreamingReport.ingestBatch(catalog, 0L, spec, params, dir))
    val twice = StreamingReport.reportToDate(spark, spec, params, dir).collect().toSet
    assert(twice == once, "replayed batch must not change any count")
  }
}
