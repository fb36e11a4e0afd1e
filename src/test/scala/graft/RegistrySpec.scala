package graft

/** Driver-contract invariants: the registry is where a silent mistake
  * costs the most (a query without an oracle downgrades to a rows-only
  * check; a duplicate name across sub-registries silently shadows).
  */
class RegistrySpec extends SparkTestBase {

  test("every registered query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles without query: ${o -- q}")
  }

  test("no query name is shadowed across the three sub-registries") {
    val sizes = CoreQueries.queries.size + PipelineQueries.queries.size +
      LlmQueries.queries.size
    assert(SparkEntry.queries.size == sizes,
      "a duplicate key collapsed in the registry merge")
  }

  test("driver smoke: entry() yields rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle references only relations the driver registers as views") {
    // the driver materializes each parquet table as a DuckDB view by name;
    // an oracle naming anything else fails only at driver time — catch the
    // obvious typos here
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val fromRe = "(?i)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)\\b".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // CTE names, with or without an explicit column list: `x AS (` and
      // `x(a, b) AS (`
      val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*\\(".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val read = "read_csv" // q08 reads its spec CSV via function call
      fromRe.findAllMatchIn(sql).map(_.group(1).toLowerCase)
        .filterNot(ctes).filterNot(_ == read).foreach { rel =>
          assert(tables.contains(rel),
            s"$name references unknown relation '$rel' (not a table or CTE)")
        }
    }
  }
}
