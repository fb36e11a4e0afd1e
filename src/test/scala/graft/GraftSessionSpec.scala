package graft

class GraftSessionSpec extends SparkTestBase {

  test("required config is exactly what the shared test session runs with") {
    // the contract: library sessions (GraftSession), the driver mains
    // (Bench/Verify via GraftSession.local), and the test session all agree
    GraftSession.required.foreach { case (k, v) =>
      assert(spark.conf.get(k) == v, s"test session disagrees on $k")
    }
  }

  test("scale defaults: AQE re-plan knobs all enabled + codegen cache sized") {
    assert(GraftSession.scaleDefaults.keySet == Set(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.codegen.cache.maxEntries"))
    assert(GraftSession.scaleDefaults.filter(_._1.startsWith("spark.sql.adaptive"))
      .values.forall(_ == "true"))
    // the 100-entry default silently recompiles every codegen unit once a
    // workload mix exceeds it — measured +40% on the 83-query interleaved
    // bench (BASELINE.md r13 protocol note); must stay well above the
    // registry's unit count
    assert(GraftSession.scaleDefaults("spark.sql.codegen.cache.maxEntries").toInt >= 1000)
  }

  test("native functions resolve through a GraftSession-configured session") {
    val row = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c, " +
        "word_hits(array('a', 'b', 'a'), 'a') AS w").collect().head
    assert(row.getDouble(0) == 1.0 && row.getInt(1) == 2)
  }
}
