package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** ScalaCheck-generated invariants for the Morton ladder and the
  * Misra-Gries summary (raw `Gen` sampling with fixed seeds, the
  * [[graft.operators.CohortsPropertySpec]] convention).
  */
class ZOrderPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def mortonModel(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((x >> i) & 1L) << (2 * i) | ((y >> i) & 1L) << (2 * i + 1)
    }

  private val pairGen: Gen[(Long, Long)] = for {
    x <- Gen.choose(0L, 65535L)
    y <- Gen.choose(0L, 65535L)
  } yield (x, y)

  private def pairs(seed: Long, n: Int): Seq[(Long, Long)] =
    (0 until n).flatMap(i => pairGen.apply(Gen.Parameters.default, Seed(seed + i)))

  test("random domain points: ladder ≡ bit-by-bit model, z is a bijection on the tile grid") {
    for (seed <- Seq(7L, 1234L, 99999L)) {
      val ps = pairs(seed, 400).distinct
      val got = ps.toDF("x", "y")
        .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      got.foreach { case ((x, y), z) =>
        assert(z == mortonModel(x, y), s"seed $seed: z($x,$y)=$z != model")
        assert(z >= 0L && z <= 0xFFFFFFFFL, s"z out of 32-bit range: $z")
      }
      // injective: distinct (x, y) → distinct z (interleave is invertible)
      assert(got.map(_._2).distinct.length == ps.length,
        s"seed $seed: z collided on distinct inputs")
    }
  }

  test("z preserves tile locality: points in the same 256x256 tile share the z high bits") {
    for (seed <- Seq(5L, 321L)) {
      pairs(seed, 200).foreach { case (x, y) =>
        val zTile = mortonModel(x >> 8, y >> 8)
        val got = Seq((x, y)).toDF("x", "y")
          .select(ZOrder.zValue(col("x"), col("y"))).head().getLong(0)
        // the top 16 bits of z are exactly the tile's Morton code
        assert((got >> 16) == zTile,
          s"seed $seed: ($x,$y) z=$got high bits != tile code $zTile")
      }
    }
  }
}
