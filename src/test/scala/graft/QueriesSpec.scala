package graft

/** Smoke: every registered query runs on sf0.001 and returns rows (except
  * queries whose correct result is legitimately empty). Value-level
  * correctness is enforced by the DuckDB oracle gate (Verify +
  * scripts/check_oracle.py); this spec guards compile-to-run health.
  */
class QueriesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val mayBeEmpty = Set("q16_anti_join")

  Queries.registry.foreach { case (name, (fn, _)) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).head(1).nonEmpty)
  }

  test("every oracle key exists in queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
