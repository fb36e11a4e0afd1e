package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.EventCatalogFixture
import graft.sources.{Sinks, Tables}

/** S2 (CSV scan with header+inferSchema) and S4 (CSV sink) end-to-end:
  * the spec round-trips through a real CSV file — exactly how the
  * reference consumes it (`event_verify.py:27-30`) — and the final report
  * survives the reference-shaped single-file CSV write
  * (`event_verify.py:230-231`).
  */
class SourcesSinksSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("S2: spec read from CSV produces the same report as the in-memory spec") {
    val tmp = Files.createTempDirectory("graft-spec").toFile
    val specPath = s"${tmp.getAbsolutePath}/spec"
    Sinks.csvReport(EventCatalogFixture.specDf(spark), specPath, files = 1)

    val specFromCsv = Tables.csv(spark, specPath)
      // inferSchema turns the numeric-looking version column into double;
      // the engine keeps versions stringly (SURVEY §2.11(8))
      .selectExpr("channel", "CAST(version AS STRING) AS version", "event_name",
        "release_date", "prop_1", "prop_2", "prop_3")
    val catalog = EventCatalogFixture.catalogDf(spark, dir)
    val fromCsv = EventsVerificationPipeline.run(catalog, specFromCsv, PipelineQueries.params)
    val fromMem = EventsVerificationPipeline.run(
      catalog, EventCatalogFixture.specDf(spark), PipelineQueries.params)
    assert(fromCsv.exceptAll(fromMem).count() == 0)
    assert(fromMem.exceptAll(fromCsv).count() == 0)
  }

  test("S4: report CSV bytes match the checked-in golden file") {
    val golden = new java.io.File("src/test/resources/golden/events_report_sf0.001.csv")
    val report = PipelineQueries.eventsReport(spark, dir)
    val sorted = report.orderBy(graft.operators.Report.outputColumns.map(
      org.apache.spark.sql.functions.col): _*)
    val tmp = Files.createTempDirectory("graft-golden").toFile
    val outPath = s"${tmp.getAbsolutePath}/report"
    Sinks.csvReport(sorted, outPath, files = 1)
    val part = new java.io.File(outPath).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val produced = Files.readAllBytes(part.toPath)
    if (sys.env.contains("GRAFT_REGOLD")) {
      golden.getParentFile.mkdirs()
      Files.write(golden.toPath, produced)
      fail("golden regenerated — rerun without GRAFT_REGOLD and check the file in")
    }
    assert(golden.exists(), "golden file missing: rerun with GRAFT_REGOLD=1 and check it in")
    assert(java.util.Arrays.equals(produced, Files.readAllBytes(golden.toPath)),
      "report CSV bytes drifted from the golden file")
  }

  test("partitioned parquet sink: hive layout on disk, plan-time pruning on read-back") {
    import org.apache.spark.sql.functions.col
    val tmp = Files.createTempDirectory("graft-part").toFile
    val outPath = s"${tmp.getAbsolutePath}/events_out"
    val events = Tables.events(spark, dir)
    Sinks.partitionedParquet(events, outPath, Seq("event_type"))

    val subdirs = new java.io.File(outPath).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.nonEmpty && subdirs.forall(_.startsWith("event_type=")),
      s"expected hive-style partition dirs, got $subdirs")

    val back = Tables.partitionedRoot(spark, outPath)
    val oneType = subdirs.head.stripPrefix("event_type=")
    val pruned = back.filter(col("event_type") === oneType)
    val scan = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters"))
    assert(scan.isDefined && scan.get.contains("event_type"),
      s"partition filter must reach the scan:\n${pruned.queryExecution.executedPlan}")
    assert(pruned.count() ==
      events.filter(col("event_type") === oneType).count())
    assert(back.count() == events.count(), "no rows lost across the partitioned write")
  }

  test("dynamic partition overwrite: replaces only the partitions present in the write") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-dynpart").toFile
    val outPath = s"${tmp.getAbsolutePath}/t"
    val day1 = Seq((1L, "d1"), (2L, "d1"), (3L, "d2")).toDF("id", "day")
    Sinks.partitionedParquet(day1, outPath, Seq("day"))
    // reprocess ONLY day=d1 with corrected rows
    val fix = Seq((10L, "d1")).toDF("id", "day")
    Sinks.overwritePartitions(fix, outPath, Seq("day"))
    val back = Tables.partitionedRoot(spark, outPath)
      .select("id", "day").as[(Long, String)].collect().toSet
    assert(back == Set((10L, "d1"), (3L, "d2")),
      s"d1 must be replaced, d2 untouched; got $back")
    // the static default would have dropped d2 entirely — pin the contrast
    // so a Spark default change can't silently weaken the sink
    Sinks.partitionedParquet(fix, outPath, Seq("day"))
    val after = Tables.partitionedRoot(spark, outPath)
      .select("id", "day").as[(Long, String)].collect().toSet
    assert(after == Set((10L, "d1")), "static overwrite clears the whole root")
    // session conf was never flipped by the option-scoped write
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }

  test("S4: single-file CSV report round-trips the 13-column output") {
    val tmp = Files.createTempDirectory("graft-report").toFile
    val outPath = s"${tmp.getAbsolutePath}/report"
    val report = PipelineQueries.eventsReport(spark, dir)
    Sinks.csvReport(report, outPath, files = 1)

    val files = new java.io.File(outPath).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1, "coalesce(1) must produce exactly one csv part")
    val back = Tables.csv(spark, outPath)
    assert(back.columns.toSeq == graft.operators.Report.outputColumns)
    assert(back.count() == report.count())
  }

  test("S4: hostile values (commas, quotes, newlines) round-trip as RFC 4180 doubled quotes") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-quoting").toFile
    val outPath = s"${tmp.getAbsolutePath}/hostile"
    val rows = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "says \"hi\" twice \"\""),
      (4L, "line one\nline two"),
      (5L, "all: \"a\",\nb"))
    val df = rows.toDF("id", "v").repartition(1)
    Sinks.csvReport(df, outPath, files = 1)

    // bytes are RFC 4180: quotes double, no backslash escaping anywhere
    val file = new java.io.File(outPath).listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val bytes = new String(Files.readAllBytes(file.toPath), "UTF-8")
    assert(bytes.contains("\"says \"\"hi\"\" twice \"\"\"\"\""),
      s"embedded quotes must double, got:\n$bytes")
    assert(!bytes.contains("\\\""), s"no backslash-escaped quotes allowed:\n$bytes")

    // and the RFC reader restores every value exactly
    val back = Tables.csvRfc(spark, outPath)
      .as[(Long, String)].collect().toMap
    assert(back == rows.toMap, s"round-trip drift: $back")
  }

  test("JSONL: documents round-trip through the json-lines sink/source with explicit schema") {
    val tmp = Files.createTempDirectory("graft-jsonl").toFile
    val path = s"${tmp.getAbsolutePath}/docs"
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "lang")
    Sinks.jsonl(docs, path)
    val back = Tables.jsonl(spark, path, docs.schema)
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("JSONL: corrupt lines surface in _corrupt_record instead of failing the read") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-jsonl-bad").toFile
    val f = new java.io.File(tmp, "bad.jsonl")
    Files.writeString(f.toPath,
      """{"doc_id": 1, "text": "fine"}
        |not json at all
        |{"doc_id": 2, "text": "also fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    // Spark disallows querying ONLY _corrupt_record straight off raw files
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parse first
    val back = Tables.jsonl(spark, f.getAbsolutePath, schema).cache()
    // one corrupt row captured verbatim, parse failures don't kill the scan
    assert(back.count() == 3)
    assert(back.filter(back("_corrupt_record").isNotNull).count() == 1)
    assert(back.filter(back("doc_id").isNotNull).count() == 2)
  }

  test("JSONL streaming: files landing in the directory flow through as micro-batches") {
    import org.apache.spark.sql.types._
    val tmp = Files.createTempDirectory("graft-jsonl-stream").toFile
    val in = new java.io.File(tmp, "in"); in.mkdirs()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val query = Tables.jsonlStream(spark, in.getAbsolutePath, schema)
      .writeStream.format("memory").queryName("jsonl_stream_sink")
      .outputMode("append").start()
    try {
      Files.writeString(new java.io.File(in, "a.jsonl").toPath,
        "{\"doc_id\": 1, \"text\": \"one\"}\n")
      query.processAllAvailable()
      Files.writeString(new java.io.File(in, "b.jsonl").toPath,
        "{\"doc_id\": 2, \"text\": \"two\"}\n{\"doc_id\": 3, \"text\": \"three\"}\n")
      query.processAllAvailable()
      val got = spark.table("jsonl_stream_sink").count()
      assert(got == 3, s"expected all landed rows to stream through, got $got")
    } finally query.stop()
  }

  test("compaction: many small files rewrite into the byte-sized target count, rows intact") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact").toFile
    val in = s"${tmp.getAbsolutePath}/in"
    val out = s"${tmp.getAbsolutePath}/out"
    spark.range(10000).select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(40).write.parquet(in)
    val smallFiles = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 40)
    val bytes = graft.sources.Compaction.dataBytes(spark, in)
    // target half the input: expect exactly 2 files
    val written = graft.sources.Compaction.compactParquet(
      spark, in, out, targetFileBytes = (bytes + 1) / 2)
    assert(written == 2)
    assert(new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    val a = spark.read.parquet(in).as[(Long, String)].collect().toSet
    val b = spark.read.parquet(out).as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("compaction with sortCols: range layout makes files disjoint on the sort key") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-sort").toFile
    val in = s"${tmp.getAbsolutePath}/in"
    val out = s"${tmp.getAbsolutePath}/out"
    spark.range(10000).select(col("id")).repartition(20).write.parquet(in)
    val bytes = graft.sources.Compaction.dataBytes(spark, in)
    graft.sources.Compaction.compactParquet(
      spark, in, out, targetFileBytes = (bytes + 3) / 4, sortCols = Seq("id"))
    // per-file (min, max) id ranges must not overlap: that's what lets
    // parquet row-group stats prune scans on the sort key
    val ranges = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min("id"), max("id")).as[(Long, Long)].first()
        r
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA < loB,
        s"file ranges overlap: $hiA >= $loB")
      case _ => ()
    }
  }

  test("partition-aware compaction: hive structure survives, per-partition sizing, pruning intact") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-compact-part").toFile
    val in = s"${tmp.getAbsolutePath}/in"
    val out = s"${tmp.getAbsolutePath}/out"
    // skewed 2-partition layout, each written as many small files
    val df = spark.range(12000)
      .select(col("id"), when(col("id") % 4 === 0, "fr").otherwise("en").as("lang"))
      .repartition(10)
    df.write.partitionBy("lang").parquet(in)
    assert(new java.io.File(s"$in/lang=en").listFiles()
      .count(_.getName.endsWith(".parquet")) == 10)

    val enBytes = graft.sources.Compaction.dataBytes(spark, s"$in/lang=en")
    // target sized so the big partition (en, 3/4 of rows) needs 2 files and
    // the small one (fr) collapses to 1
    val written = graft.sources.Compaction.compactPartitionedParquet(
      spark, in, out, targetFileBytes = (enBytes + 1) / 2)
    assert(written == Map("lang=en" -> 2, "lang=fr" -> 1), s"got $written")
    for ((rel, n) <- written)
      assert(new java.io.File(s"$out/$rel").listFiles()
        .count(_.getName.endsWith(".parquet")) == n, s"$rel file count")

    // rows and partition values intact through the rewrite
    val back = Tables.partitionedRoot(spark, out)
    assert(back.count() == 12000)
    assert(back.filter(col("lang") === "fr").count() == 3000)
    // and the compacted layout still prunes at plan time
    val pruned = back.filter(col("lang") === "fr")
    val scan = pruned.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("PartitionFilters"))
    assert(scan.isDefined && scan.get.contains("lang"),
      s"partition filter must reach the scan:\n${pruned.queryExecution.executedPlan}")
  }

  test("partition-aware compaction: non-partitioned layout degrades to the flat rewrite") {
    val tmp = Files.createTempDirectory("graft-compact-flat").toFile
    val in = s"${tmp.getAbsolutePath}/in"
    val out = s"${tmp.getAbsolutePath}/out"
    spark.range(1000).repartition(5).write.parquet(in)
    val written = graft.sources.Compaction.compactPartitionedParquet(spark, in, out)
    assert(written == Map("" -> 1))
    assert(spark.read.parquet(out).count() == 1000)
  }

  test("parquet schema evolution: mergeSchema unions fields across file generations") {
    val tmp = Files.createTempDirectory("graft-evolve").toFile
    val root = tmp.getAbsolutePath
    import spark.implicits._
    // generation 1 has (id, a); generation 2 adds column b
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$root/gen=1")
    Seq((2L, "y", 3.5)).toDF("id", "a", "b").write.parquet(s"$root/gen=2")
    val merged = spark.read.option("mergeSchema", "true")
      .option("basePath", root).parquet(root)
    assert(merged.columns.toSet == Set("id", "a", "b", "gen"))
    // old-generation rows read the new column as null
    assert(merged.filter(merged("gen") === 1 && merged("b").isNull).count() == 1)
    assert(merged.filter(merged("gen") === 2).select("b").first().getDouble(0) == 3.5)
  }
}
