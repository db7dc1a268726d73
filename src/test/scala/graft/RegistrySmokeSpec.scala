package graft

/** Smoke tier (SURVEY.md §5 tier 1): every registered query runs on
  * sf0.001 and returns rows; every oracle key has a matching query. */
class RegistrySmokeSpec extends SparkSpecBase {

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("registry size matches SURVEY §2 — a duplicate key across the merged maps would silently drop a query") {
    // `queries` is a ++ of ~27 per-module maps; Map.++ keeps the LAST
    // binding for a colliding key, so a copy-pasted name in a new
    // round file would shadow an old operator with zero compile
    // signal. Pin the declared inventory count (update alongside
    // SURVEY §2's totals block when adding rows).
    assert(SparkEntry.queries.size == 281,
      s"expected 281 declared queries, found ${SparkEntry.queries.size} — duplicate or missing key")
    assert(SparkEntry.oracleSql.size == 264,
      s"expected 264 oracle entries, found ${SparkEntry.oracleSql.size}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries whose empty result is legitimate at sf0.001 (e.g. every
    * customer has an order, so anti-join/except come back empty). */
  private val mayBeEmpty = Set("q_join_anti", "q_set_except")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      if (!mayBeEmpty(name))
        assert(df.count() > 0, s"$name returned no rows")
      else df.count() // still must execute cleanly
    }
  }
}
