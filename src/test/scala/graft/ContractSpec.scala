package graft

/** Pins the driver contract itself: entry() returns rows, every
  * oracle key has a matching query, and query names stay unique.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query is oracle-gated (static or dynamic) — no silent rows-only entries") {
    val rowsOnly = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.dynamicOracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without any oracle: $rowsOnly")
    val dynMissing = SparkEntry.dynamicOracleSql.keySet -- SparkEntry.queries.keySet
    assert(dynMissing.isEmpty, s"dynamic oracles without queries: $dynMissing")
    val overlap = SparkEntry.oracleSql.keySet.intersect(SparkEntry.dynamicOracleSql.keySet)
    assert(overlap.isEmpty, s"oracle defined both statically and dynamically: $overlap")
  }

  test("entry() runs the flagship pipeline at sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all queries build a plan at sf0.001 (no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, "/root/testdata/sf0.001").schema // analysis only, no execution
      catch { case e: Throwable => fail(s"$name failed analysis: ${e.getMessage}") }
    }
  }
}
