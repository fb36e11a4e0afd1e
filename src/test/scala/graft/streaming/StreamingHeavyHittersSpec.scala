package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

case class Hit(key: String)

/** Pins [[StreamingHeavyHitters]]' contract: the monitor never loses a
  * true heavy hitter (candidate superset + CMS never-under-count), its
  * estimates are exact at this scale (eps × N ≪ 1), and a replayed
  * trigger cannot move the answer (batch_id fold).
  */
class StreamingHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("two triggers: heavy hitters to date match the exact union; replay is idempotent") {
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    val denom = 20
    val ms = MemoryStream[Hit]
    val query = ms.toDS().toDF().writeStream
      .foreachBatch(StreamingHeavyHitters.sink("key", dir, denom))
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 1: "hot" at 30%, "warm" at 4% (below 1/20), long tail
      val b1 = Seq.fill(150)("hot") ++ Seq.fill(20)("warm") ++
        (1 to 330).map(i => s"t$i")
      ms.addData(b1.map(Hit): _*)
      query.processAllAvailable()
      // batch 2 pushes "warm" over the global threshold
      val b2 = Seq.fill(80)("warm") ++ (1 to 100).map(i => s"u$i")
      ms.addData(b2.map(Hit): _*)
      query.processAllAvailable()

      val got = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val all = b1 ++ b2
      val exact = all.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, n) => n * denom > all.size }.toMap
      assert(exact.keySet == Set("hot", "warm"), "fixture sanity")
      // superset of the truth, and at eps=1e-4 × N=680 the estimates are exact
      assert(got == exact,
        s"streamed heavy hitters $got diverged from exact $exact")
    } finally query.stop()
  }

  test("pre-first-trigger state: monitor returns empty, compact is a no-op") {
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    assert(!StreamingHeavyHitters.hasState(spark, dir))
    assert(StreamingHeavyHitters.heavyHittersToDate(spark, dir, 10).count() == 0)
    StreamingHeavyHitters.compact(spark, dir) // must not throw
    assert(!StreamingHeavyHitters.hasState(spark, dir))
  }

  test("replaying the same batch id does not move counts (at-least-once safety)") {
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    val denom = 10
    val batch = (Seq.fill(50)("hot") ++ (1 to 50).map(i => s"t$i")).toDF("key")
    StreamingHeavyHitters.ingestBatch(batch, 0L, "key", dir, denom)
    val once = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    StreamingHeavyHitters.ingestBatch(batch, 0L, "key", dir, denom) // replay
    val twice = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(once == Map("hot" -> 50L))
    assert(twice == once, "a replayed batch_id must fold away")
  }

  test("compact folds the tables to one sketch row without moving the answer") {
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    val denom = 10
    val b1 = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"t$i")).toDF("key")
    val b2 = (Seq.fill(30)("hot") ++ Seq.fill(25)("warm") ++ (1 to 45).map(i => s"u$i")).toDF("key")
    StreamingHeavyHitters.ingestBatch(b1, 0L, "key", dir, denom)
    StreamingHeavyHitters.ingestBatch(b2, 1L, "key", dir, denom)
    val before = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    StreamingHeavyHitters.compact(spark, dir)
    val after = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, s"compaction moved the answer: $after vs $before")
    assert(spark.read.parquet(s"$dir/cms").count() == 1)
    // the retained batch_id is the max, so a replay of the LAST batch
    // (the only one the checkpoint can re-deliver) still folds away
    StreamingHeavyHitters.ingestBatch(b2, 1L, "key", dir, denom)
    val replayed = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(replayed == before, "post-compaction replay of the max batch_id must fold away")
  }

  test("a crash at any point of the compaction swap never loses the state") {
    import java.nio.file.{Path, Paths, StandardCopyOption}
    import scala.jdk.CollectionConverters._
    def copyTree(src: Path, dst: Path): Unit =
      Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
      }
    val denom = 10
    val dir = Files.createTempDirectory("graft-hh").toFile.getAbsolutePath
    val b1 = (Seq.fill(60)("hot") ++ (1 to 40).map(i => s"t$i")).toDF("key")
    StreamingHeavyHitters.ingestBatch(b1, 0L, "key", dir, denom)
    val expect = StreamingHeavyHitters.heavyHittersToDate(spark, dir, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expect == Map("hot" -> 60L), "fixture sanity")

    // State A — crash between the .new write and the rename-away of the
    // live dir: cms intact, committed cms.new beside it. The live dir
    // must stay authoritative (reading .new too would double-count).
    val stateA = Files.createTempDirectory("graft-hh-a").toFile.getAbsolutePath
    copyTree(Paths.get(dir), Paths.get(stateA))
    copyTree(Paths.get(s"$stateA/cms"), Paths.get(s"$stateA/cms.new"))
    assert(StreamingHeavyHitters.heavyHittersToDate(spark, stateA, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
    assert(!Files.exists(Paths.get(s"$stateA/cms.new")), "stale .new must be dropped")

    // State B — crash between the two renames: live dir gone, committed
    // .new + .old present. This is the window the plain mode(overwrite)
    // lost state in; recovery must roll the committed .new forward.
    val stateB = Files.createTempDirectory("graft-hh-b").toFile.getAbsolutePath
    copyTree(Paths.get(dir), Paths.get(stateB))
    Files.move(Paths.get(s"$stateB/cms"), Paths.get(s"$stateB/cms.old"))
    copyTree(Paths.get(s"$stateB/cms.old"), Paths.get(s"$stateB/cms.new"))
    assert(StreamingHeavyHitters.hasState(spark, stateB),
      "mid-swap crash must not read as 'no state'")
    assert(StreamingHeavyHitters.heavyHittersToDate(spark, stateB, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)

    // State C — crash with only an UNcommitted .new (write still in
    // flight: `_temporary` scratch present, no _SUCCESS) and the old dir
    // renamed aside: recovery must restore .old, not trust .new. A bare
    // empty dir with NO `_temporary` would instead read as a committed
    // zero-row generation (ADVICE r12 — the committer contract only
    // guarantees "_temporary removed at commit", not ">=1 part file").
    val stateC = Files.createTempDirectory("graft-hh-c").toFile.getAbsolutePath
    copyTree(Paths.get(dir), Paths.get(stateC))
    Files.move(Paths.get(s"$stateC/cms"), Paths.get(s"$stateC/cms.old"))
    Files.createDirectories(Paths.get(s"$stateC/cms.new/_temporary")) // in-flight write
    assert(StreamingHeavyHitters.heavyHittersToDate(spark, stateC, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)

    // and the candidates dir recovers through the same protocol
    val stateD = Files.createTempDirectory("graft-hh-d").toFile.getAbsolutePath
    copyTree(Paths.get(dir), Paths.get(stateD))
    Files.move(Paths.get(s"$stateD/candidates"), Paths.get(s"$stateD/candidates.old"))
    assert(StreamingHeavyHitters.heavyHittersToDate(spark, stateD, denom)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
  }
}
