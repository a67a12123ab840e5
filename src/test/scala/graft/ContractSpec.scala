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

  test("registry literals reject intra-file duplicate names (reg constructor)") {
    // the disjointness gate below only sees ACROSS-registry dups; a
    // key duplicated WITHIN one Map literal last-wins before any test
    // can look. Registries therefore build via QueryHelpers.reg, which
    // sees the raw varargs pairs and refuses duplicates at object init
    // — pin that behavior here so a revert to bare Map(...) can't
    // silently reopen the hole (every registry is already initialized
    // by other tests in this suite, so a dup would have thrown there).
    val e = intercept[IllegalArgumentException] {
      QueryHelpers.reg("dup" -> 1, "ok" -> 2, "dup" -> 3)
    }
    assert(e.getMessage.contains("dup"))
    assert(QueryHelpers.reg("a" -> 1, "b" -> 2) == Map("a" -> 1, "b" -> 2))
  }

  test("registry maps are disjoint: ++ concatenation cannot silently drop a query") {
    // since the round-13 split, queries/oracleSql are built by ++ over
    // per-family registries — a duplicated name ACROSS registries
    // would silently overwrite where the old single Map literal would
    // have at least been reviewable (intra-registry dups are caught by
    // QueryHelpers.reg at init). Pin sum-of-parts == whole.
    val regsQ = Seq(
      ConfigOpQueries.queries, EngineStoreQueries.queries, EventQueries.queries,
      DedupQueries.queries, SimilarityQueries.queries, TextQueries.queries,
      CorpusQueries.queries, DqSketchQueries.queries, MultimodalQueries.queries)
    assert(regsQ.map(_.size).sum == SparkEntry.queries.size,
      "duplicate query name across registries")
    val regsO = Seq(
      ConfigOpQueries.oracleSql, EngineStoreQueries.oracleSql, EventQueries.oracleSql,
      DedupQueries.oracleSql, SimilarityQueries.oracleSql, TextQueries.oracleSql,
      CorpusQueries.oracleSql, DqSketchQueries.oracleSql, MultimodalQueries.oracleSql)
    assert(regsO.map(_.size).sum == SparkEntry.oracleSql.size,
      "duplicate oracle name across registries")
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

  /** The driver hashes results after a pandas-style conversion of
    * both sides (Spark parquet dump, DuckDB oracle result), so a
    * gated query's top-level schema must stay inside the types that
    * conversion round-trips: scalars only (the driver's sort crashes
    * on arrays/maps/structs), and no DecimalType (pandas keeps Spark
    * decimals as objects while DuckDB decimals land as float64 — the
    * hash can never match; emit double instead). The oracle-side twin
    * of this contract — no DuckDB HUGEINT column may escape an oracle,
    * since parquet has no int128 for Spark to agree with — needs a
    * DuckDB engine and lives in tools/check.py, which DESCRIBEs every
    * oracle and hard-fails int128 outputs (this is how the pack_*
    * family red of rounds 9-10 is kept from recurring).
    */
  test("every gated query emits a driver-hashable schema (scalars, no decimals)") {
    import org.apache.spark.sql.types._
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, "/root/testdata/sf0.001").schema
      schema.fields.foreach { f =>
        f.dataType match {
          case _: ArrayType | _: MapType | _: StructType =>
            fail(s"$name column ${f.name} is nested (${f.dataType.simpleString}); " +
              "the driver's pandas sort cannot hash it — posexplode to scalar rows")
          case _: DecimalType =>
            fail(s"$name column ${f.name} is decimal; pandas keeps it as object " +
              "while the DuckDB oracle lands float64 — cast to double")
          case _ => ()
        }
      }
    }
  }

  /** The scale contract, enforced over the WHOLE query surface: no
    * plan may contain a CartesianProduct at any size, and a
    * BroadcastNestedLoopJoin may appear only where the build side is
    * bounded by construction — 1-row aggregates (SUMEQ, the
    * cosine-probe frame) or the guarded probe set of the brute-force
    * kNN baseline. A refactor that degrades any query to an
    * unbounded cross join fails HERE with the query's name, not in
    * production at 100 TB.
    */
  test("no query plans a cartesian; nested-loop joins only with bounded build sides") {
    // the allowlist lives in graft.Contracts so the cluster-shape
    // audit tool (tools/ClusterShape, 512-partition sweep) enforces
    // the SAME contract — one source of truth, two partition regimes
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan =
        try fn(spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed planning: ${e.getMessage}") }
      assert(!plan.contains("CartesianProduct"), s"$name plans a CartesianProduct:\n$plan")
      if (!Contracts.boundedBuildSide(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the bounded allowlist:\n$plan")
    }
  }
}
