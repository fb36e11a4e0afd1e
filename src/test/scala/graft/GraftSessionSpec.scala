package graft

class GraftSessionSpec extends SparkTestBase {

  test("required config is exactly what the shared test session runs with") {
    // the contract: library sessions (GraftSession), the driver mains
    // (Bench/Verify via GraftSession.local), and the test session all agree
    GraftSession.required.foreach { case (k, v) =>
      assert(spark.conf.get(k) == v, s"test session disagrees on $k")
    }
  }

  test("scale defaults are the AQE runtime re-plan knobs, all enabled") {
    assert(GraftSession.scaleDefaults.keySet == Set(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled"))
    assert(GraftSession.scaleDefaults.values.forall(_ == "true"))
  }

  test("native functions resolve through a GraftSession-configured session") {
    val row = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "word_hits(array('a', 'b', 'a'), 'a') AS w").collect().head
    assert(row.getDouble(0) == 1.0 && row.getInt(1) == 2)
  }
}
