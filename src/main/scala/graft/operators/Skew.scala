package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * brief's "salting for skew" scale tool; complements AQE's runtime skew
  * split for the cases AQE can't touch, e.g. repeated joins on a known-hot
  * key or aggregations feeding a window).
  *
  * Classic salted equi-join: the SKEWED (large) side gets a random-ish but
  * DETERMINISTIC salt in [0, salts); the small side is replicated once per
  * salt value. The join key becomes (key, salt), spreading each hot key
  * over `salts` shuffle partitions. Deterministic salting (hash of a row
  * id, not `rand()`) keeps runs reproducible and retry-safe.
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from `saltSource` (use a
    * unique-ish column of the skewed side, e.g. its row id).
    */
  def saltCol(saltSource: Column, salts: Int): Column =
    pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int")

  /** Inner/left equi-join `large ⋈ small` on `keys`, with the large side
    * salted by `saltSource` and the small side replicated `salts` times.
    * Output columns: all of `large`'s, then `small`'s non-key columns —
    * the same shape a plain `large.join(small, keys, joinType)` yields.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = large.withColumn("__salt", saltCol(saltSource, salts))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
