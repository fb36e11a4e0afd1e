package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins [[ZOrder]]'s two claims: the bit ladder computes the Morton code
  * (checked against a bit-by-bit model), and the z-ordered layout tiles
  * BOTH dimensions — per-file spans stay narrow in x AND y, where a
  * lexicographic sort leaves the second dimension's span at full width.
  */
class ZOrderSpec extends SparkTestBase {

  /** Bit-by-bit Morton model: the definition, not the ladder. */
  private def mortonModel(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  test("zValue equals the bit-by-bit Morton definition across the domain") {
    import spark.implicits._
    val probes = Seq(0L, 1L, 2L, 3L, 255L, 256L, 65535L, 4095L, 21845L, 43690L)
    val pairs = for (x <- probes; y <- probes) yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == mortonModel(x, y),
        s"z($x, $y) = ${got((x, y))}, model says ${mortonModel(x, y)}")
    }
  }

  test("zValueSql twin: DuckDB-dialect ladder matches the Column ladder (run through Spark SQL)") {
    // the ladder only uses &, |, << and % — dialect-shared operators — so
    // Spark itself can execute the DuckDB spelling (minus `//`, not used here)
    import spark.implicits._
    val sql = ZOrder.zValueSql("x", "y")
    val df = (0L until 300L).map(i => (i * 219, (i * 37) % 65536)).toDF("x", "y")
    val mismatches = df
      .select(ZOrder.zValue(col("x"), col("y")).as("a"), expr(sql).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(mismatches == 0)
  }

  test("z-ordered files tile both dims; lexicographic sort leaves dim 2 at full width") {
    import spark.implicits._
    // a dense 256x256 grid: every (x, y) cell once
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val zDir = Files.createTempDirectory("graft_z").toString + "/z"
    val lexDir = Files.createTempDirectory("graft_z").toString + "/lex"
    ZOrder.writeZOrdered(grid, zDir, col("x"), col("y"), numFiles = 16)
    grid.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions("x", "y")
      .write.mode("overwrite").parquet(lexDir)

    def spans(path: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

    val zSpans = spans(zDir)
    val lexSpans = spans(lexDir)
    assert(zSpans.size > 1 && lexSpans.size > 1)
    def avg(s: Seq[Long]): Double = s.sum.toDouble / s.size
    // z-order: every file covers a fraction of BOTH ranges (a 16-file
    // tiling of a 256x256 grid gives ~64-to-128-wide tiles; 0.6*255 is a
    // generous ceiling); lexicographic: x is narrow but y spans ~everything
    assert(avg(zSpans.map(_._1)) < 0.6 * 255, s"z x-spans too wide: $zSpans")
    assert(avg(zSpans.map(_._2)) < 0.6 * 255, s"z y-spans too wide: $zSpans")
    assert(avg(lexSpans.map(_._2)) > 0.8 * 255,
      s"lexicographic y-span unexpectedly narrow: $lexSpans")
  }
}
