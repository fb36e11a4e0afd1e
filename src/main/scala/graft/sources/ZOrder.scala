package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: a write-time layout that makes parquet
  * min/max pruning work for TWO filter dimensions at once. A plain sort
  * clusters only its leading column — files carry a narrow range of dim A
  * and the FULL range of dim B, so predicates on B prune nothing. Sorting
  * by the interleaved-bit z-value gives every file a narrow range of BOTH
  * dims (each file is a rectangle-ish tile of the (x, y) plane), so a
  * selective predicate on either dimension skips most files at scan time.
  *
  * At 100 TB this is a maintenance-pass decision, not a query decision:
  * the [[Compaction]] pass rewrites cold partitions z-ordered on the two
  * hottest filter columns, and every later scan pays fewer row groups.
  * The z-value is pure bit arithmetic on two 16-bit bins (65536 tiles per
  * side is finer than any realistic file count), codegen-friendly, and
  * never stored — it exists only in the write plan's range partitioner
  * and sort.
  */
object ZOrder {

  private val Masks = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` so consecutive bits land 2 apart
    * (0b1111 → 0b01010101), via the standard mask-and-shift ladder.
    */
  private def spread(c: Column): Column =
    Masks.foldLeft(c.bitwiseAND(lit(65535L))) { case (v, (s, m)) =>
      v.bitwiseOR(shiftleft(v, s)).bitwiseAND(lit(m))
    }

  /** The 32-bit Morton code of two 16-bit non-negative bins: x's bits on
    * even positions, y's on odd.
    */
  def zValue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** The identical ladder as DuckDB-dialect SQL, for oracle twins. The
    * ladder duplicates the input expression textually (16 copies at the
    * bottom), so keep `e` a simple column/arith expression.
    */
  def zValueSql(xExpr: String, yExpr: String): String = {
    def spreadSql(e: String): String =
      Masks.foldLeft(s"(($e) & 65535)") { case (v, (s, m)) =>
        s"((($v) | (($v) << $s)) & $m)"
      }
    s"(${spreadSql(xExpr)} | (${spreadSql(yExpr)} << 1))"
  }

  /** Rewrite `df` as `numFiles` parquet files tiled by the z-value of the
    * two bin columns: range-partition on z (so files own disjoint z
    * ranges) and sort on z within each (so row groups inside a file tile
    * too). The helper column never reaches the files.
    */
  def writeZOrdered(df: DataFrame, outPath: String,
      xBin: Column, yBin: Column, numFiles: Int): Unit =
    df.withColumn("_graft_z", zValue(xBin, yBin))
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
      .write.mode("overwrite").parquet(outPath)
}
