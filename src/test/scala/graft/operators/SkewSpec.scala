package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin result equals the plain join, inner and left") {
    // heavy-tailed: 90% of rows share one key
    val large = (1 to 1000).map(i =>
      (i.toLong, if (i % 10 == 0) s"k${i % 7}" else "hot")).toDF("row_id", "key")
    val small = Seq(("hot", 1), ("k1", 2), ("k3", 3), ("unmatched", 9)).toDF("key", "v")

    for (jt <- Seq("inner", "left")) {
      val plain = large.join(small, Seq("key"), jt)
      val salted = Skew.saltedJoin(large, small, Seq("key"), col("row_id"), salts = 8, jt)
      assert(salted.columns.sorted.toSeq == plain.columns.sorted.toSeq)
      assert(salted.exceptAll(plain).count() == 0, s"$jt: extra rows")
      assert(plain.exceptAll(salted).count() == 0, s"$jt: missing rows")
    }
  }

  test("salt actually spreads the hot key across buckets") {
    val large = (1 to 1000).map(i => (i.toLong, "hot")).toDF("row_id", "key")
    val buckets = large
      .select(Skew.saltCol(col("row_id"), 8).as("s"))
      .distinct().count()
    assert(buckets == 8, "every salt bucket should be hit for 1000 hot rows")
  }
}
