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

  test("compactPartials is a report no-op and ingest keeps working; mid-swap crash heals") {
    val dir = Files.createTempDirectory("graft-streport-compact").toFile.getAbsolutePath
    val spec = EventCatalogFixture.specDf(spark)
    val params = PipelineQueries.params
    val catalog = EventCatalogFixture.catalogDf(spark, dataDir)
    val rows = catalog.as[CatRow].collect()
    val (b0, rest) = rows.splitAt(rows.length / 3)
    val (b1, b2) = rest.splitAt(rest.length / 2)

    assert(StreamingReport.ingestBatch(b0.toSeq.toDF(), 0L, spec, params, dir))
    assert(StreamingReport.ingestBatch(b1.toSeq.toDF(), 1L, spec, params, dir))
    val before = StreamingReport.reportToDate(spark, spec, params, dir).collect().toSet

    // maintenance: merge the per-trigger part-file mess; report unchanged
    val written = StreamingReport.compactPartials(spark, dir)
    assert(written("keys") >= 1 && written("values") >= 1 && written("_committed") >= 1,
      s"compaction must rewrite all three partial dirs, got $written")
    assert(StreamingReport.reportToDate(spark, spec, params, dir).collect().toSet
      == before, "compaction must not change the report")
    // the replay guard survives compaction of _committed
    assert(!StreamingReport.ingestBatch(b0.toSeq.toDF(), 0L, spec, params, dir),
      "compacted commit log must still skip replayed batch ids")

    // simulate a compactPartials crash between rename-away and rename-in
    // on the keys dir: live dir missing, committed rewrite parked at .new
    val keys = java.nio.file.Paths.get(s"$dir/keys")
    Files.move(keys, java.nio.file.Paths.get(s"$dir/keys.new"))
    // ingest must heal first — appending into a fresh keys dir would doom
    // the parked generation
    assert(StreamingReport.ingestBatch(b2.toSeq.toDF(), 2L, spec, params, dir))
    val incremental = StreamingReport.reportToDate(spark, spec, params, dir)
    val batch = EventsVerificationPipeline.run(catalog, spec, params)
    val incSet = incremental.collect().toSet
    val batchSet = batch.collect().toSet
    assert(incSet == batchSet,
      s"post-compaction+crash incremental != batch:\nonly-inc=${incSet -- batchSet}\nonly-batch=${batchSet -- incSet}")
  }

  test("compactSwap on a committed EMPTY generation is a safe no-op") {
    // a zero-partition write leaves a committed dir with no part files
    // (the state heal preserves per ADVICE r12); compacting it must not
    // die in schema inference, must not touch the dir
    val dir = Files.createTempDirectory("graft-compact-empty").toFile.getAbsolutePath
    val path = s"$dir/state"
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .write.parquet(path)
    // this Spark version emits zero-row part files even for an empty RDD;
    // strip them to produce the documented worst case — committed dir,
    // _SUCCESS only, not one data byte
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(path)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .foreach(Files.delete)
    assert(AtomicState.compactSwap(spark, path, Seq("id")) == 0)
    assert(Files.exists(java.nio.file.Paths.get(path)),
      "the committed empty generation must survive the no-op")
    assert(AtomicState.compactSwap(spark, s"$dir/never-written", Seq("id")) == 0,
      "a missing dir is also a no-op")
  }

  test("a crash mid-swap of the observed-key set never loses it") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def copyTree(src: Path, dst: Path): Unit =
      Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    def deleteTree(p: Path): Unit =
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    val dir = Files.createTempDirectory("graft-streport-crash").toFile.getAbsolutePath
    val spec = EventCatalogFixture.specDf(spark)
    val params = PipelineQueries.params
    val catalog = EventCatalogFixture.catalogDf(spark, dataDir)
    val rows = catalog.as[CatRow].collect()
    val (b0, rest) = rows.splitAt(rows.length / 3)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    def ingest(b: Seq[CatRow], id: Long): Boolean =
      StreamingReport.ingestBatch(b.toDF(), id, spec, params, dir)
    def observedSet(): Set[(String, String)] =
      spark.read.parquet(s"$dir/observed").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet

    assert(ingest(b0.toSeq, 0L))
    val observed = Paths.get(s"$dir/observed")
    assert(Files.exists(observed), "fixture sanity: observed set persisted")
    val obs0 = observedSet()
    assert(obs0.nonEmpty, "fixture sanity: some identifier keys observed")

    // State A — crash after the observed.new write but before the live
    // dir was renamed away: live stays authoritative, stale .new dropped
    // by the next ingest's heal.
    copyTree(observed, Paths.get(s"$dir/observed.new"))
    assert(ingest(b1.toSeq, 1L), "ingest after an interrupted swap must proceed")
    assert(!Files.exists(Paths.get(s"$dir/observed.new")),
      "stale .new must be dropped once the live dir is authoritative")
    val obs1 = observedSet()
    assert(obs0.subsetOf(obs1), "healing must keep every prior spelling")

    // State B — crash between rename-away and rename-in: live dir gone,
    // committed generation sits in observed.new. The next ingest's read
    // must roll it forward — under the old plain mode("overwrite") this
    // state read as "no observed keys ever" and silently dropped every
    // prior spelling from all later batches' rlike flags.
    copyTree(observed, Paths.get(s"$dir/observed.new"))
    deleteTree(observed)
    assert(ingest(b2.toSeq, 2L), "ingest after a torn swap must roll forward")
    assert(Files.exists(observed), "roll-forward must restore observed/")
    assert(!Files.exists(Paths.get(s"$dir/observed.new")))
    assert(obs1.subsetOf(observedSet()),
      "no spelling may be lost across the torn swap")

    // end-to-end: with the swaps healed, incremental still ≡ batch
    val incremental = StreamingReport.reportToDate(spark, spec, params, dir)
      .collect().toSet
    val batch = EventsVerificationPipeline.run(catalog, spec, params)
      .collect().toSet
    assert(incremental == batch,
      "crash-healed incremental report must equal the batch run")
  }

  test("heal rolls forward a committed .new even without _SUCCESS (marksuccessfuljobs=false)") {
    // ADVICE r11: with mapreduce.fileoutputcommitter.marksuccessfuljobs=false
    // no _SUCCESS marker is written; the torn-swap State B (live dir gone,
    // committed generation in .new) must still roll FORWARD via the
    // part-file fallback, not roll back and discard the new generation.
    import scala.jdk.CollectionConverters._
    val base = Files.createTempDirectory("graft-atomicstate").toFile.getAbsolutePath
    val path = s"$base/state"
    AtomicState.overwrite(Seq(1, 2, 3).toDF("v"), path)
    AtomicState.overwrite(Seq(4, 5, 6).toDF("v"), path)
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
    // simulate State B with the marker suppressed: committed dir renamed to
    // .new, live gone, _SUCCESS removed
    val p = java.nio.file.Paths.get(path)
    val pNew = java.nio.file.Paths.get(path + ".new")
    java.nio.file.Files.move(p, pNew)
    java.nio.file.Files.deleteIfExists(pNew.resolve("_SUCCESS"))
    assert(Files.list(pNew).iterator().asScala.exists(_.getFileName.toString.startsWith("part-")),
      "fixture sanity: committed part files present")
    AtomicState.heal(spark, path)
    assert(Files.exists(p), "heal must roll the committed generation forward")
    assert(!Files.exists(pNew))
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq == Seq(4, 5, 6),
      "the committed new generation must survive, not the rolled-back old one")
    // an UNcommitted .new (no _SUCCESS, no part files, _temporary present)
    // must still roll BACK to .old
    java.nio.file.Files.move(p, java.nio.file.Paths.get(path + ".old"))
    java.nio.file.Files.createDirectories(pNew.resolve("_temporary"))
    AtomicState.heal(spark, path)
    assert(Files.exists(p), "heal must restore .old when .new is uncommitted")
    assert(spark.read.parquet(path).as[Int].collect().sorted.toSeq == Seq(4, 5, 6))
  }

  test("heal rolls forward a committed EMPTY generation (no part files, no _SUCCESS)") {
    // ADVICE r12: a committed write of a zero-partition DataFrame leaves a
    // directory with NO part-* files; under marksuccessfuljobs=false there
    // is no _SUCCESS either. The old part-file-requiring fallback read that
    // as uncommitted and rolled BACK — discarding a committed (empty)
    // generation. "Directory exists, no _temporary" alone must count as
    // committed: inside the swap protocol .new is only consulted when the
    // primary is gone, which implies the .new write already returned.
    val base = Files.createTempDirectory("graft-atomicstate-empty").toFile.getAbsolutePath
    val path = s"$base/state"
    import scala.jdk.CollectionConverters._
    def partFiles(dir: java.nio.file.Path): Seq[String] =
      Files.list(dir).iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith("part-")).toSeq
    // Simulate State B with the marker suppressed: committed EMPTY dir in
    // .new (a finished write that produced no part files — e.g. an
    // object-store committer on a zero-row job — with _SUCCESS suppressed
    // and _temporary long gone), live dir absent, the superseded prior
    // generation lingering in .old. Built by hand: local Spark pads a
    // zero-partition write with one empty part task, but the committer
    // contract only guarantees "_temporary removed at commit", not
    // ">=1 part file".
    val p = java.nio.file.Paths.get(path)
    val pNew = java.nio.file.Paths.get(path + ".new")
    java.nio.file.Files.createDirectories(pNew)
    AtomicState.overwrite(Seq(9).toDF("v"), path + ".old-src")
    java.nio.file.Files.move(java.nio.file.Paths.get(path + ".old-src"),
      java.nio.file.Paths.get(path + ".old"))
    AtomicState.heal(spark, path)
    assert(Files.exists(p), "heal must roll the committed empty generation forward")
    assert(!Files.exists(pNew))
    assert(!Files.exists(java.nio.file.Paths.get(path + ".old")))
    assert(partFiles(p).isEmpty,
      "the committed EMPTY generation must survive; rolling back to .old here " +
        "would resurrect superseded state")
  }
}
