package graft

/** Pins the driver contract itself: entry() returns rows, every
  * oracle key has a matching query, and query names stay unique.
  */
class ContractSpec extends SparkSpec {

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("rows-only queries (no oracle) are the known non-SQL-expressible set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set(
      "dedup_simhash_pairs", "sim_ann_topk", "sim_embedding_neardup", "sim_ivf_topk",
      "mm_decode_stub", "mm_feature_stub"), rowsOnly.toString)
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
