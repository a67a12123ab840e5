package graft

import org.apache.spark.sql.functions._

import graft.llm.Selection

/** Token-budget selection: the bin-wholesale + exact-boundary plan
  * must equal the per-document prefix rule exactly (the equivalence
  * the DuckDB oracle pins at the gate), including when the budget
  * lands mid-bin among distinct scores sharing a bin.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // scores engineered so bins=100 collapses several distinct scores
  // into one bin (0.50x → bin 50) and the budget boundary lands there
  private val corpus = Seq(
    // (id, group, score, tokens)
    (1L, "a", 0.901, 40), (2L, "a", 0.850, 40), (3L, "a", 0.509, 40),
    (4L, "a", 0.505, 40), (5L, "a", 0.502, 40), (6L, "a", 0.101, 40),
    (7L, "b", 0.700, 60), (8L, "b", 0.700, 60), (9L, "b", 0.300, 60)
  ).toDF("id", "grp", "score", "n_tokens")

  private def naivePrefix(budget: Long): Set[Long] = {
    // the oracle rule: per group, order (score DESC, id), keep while
    // inclusive cumsum <= budget
    corpus.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("grp"),
        r.getAs[Double]("score"), r.getAs[Int]("n_tokens")))
      .groupBy(_._2).values.flatMap { rows =>
        var cum = 0L
        rows.sortBy(r => (-r._3, r._1)).takeWhile { r =>
          cum += r._4; cum <= budget
        }
      }.map(_._1).toSet
  }

  private def selected(budget: Long, bins: Int): Set[Long] =
    Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", budget, bins)(corpus)
      .select("id").collect().map(_.getLong(0)).toSet

  test("bin-wholesale selection equals the per-document prefix rule at every budget") {
    // sweep budgets across whole-bin keeps, mid-bin boundaries (the
    // 0.50x trio shares bin 50 at bins=100), and exhaustion
    for (budget <- Seq(39L, 40L, 80L, 120L, 160L, 200L, 240L, 60L, 100L, 1000L))
      assert(selected(budget, bins = 100) == naivePrefix(budget),
        s"budget=$budget")
  }

  test("selection is invariant to bin granularity") {
    for (bins <- Seq(10, 100, 1000, 100000); budget <- Seq(120L, 160L))
      assert(selected(budget, bins) == naivePrefix(budget), s"bins=$bins budget=$budget")
  }

  test("budget below the best document empties the group; budget >= total keeps all") {
    assert(selected(10L, 100) == Set.empty)
    assert(selected(100000L, 100) == (1L to 9L).toSet)
  }

  test("NULL scores compete last and are never silently dropped (null-safe bin join)") {
    // a NULL score bins to a NULL __bin; with a null-unsafe join those
    // rows used to vanish from the output entirely — they must instead
    // behave as (score DESC NULLS LAST, id), i.e. compete after every
    // scored document
    val withNulls = corpus.unionByName(Seq(
      (10L, "a", Option.empty[Double], 40),
      (11L, "c", Option.empty[Double], 40)
    ).toDF("id", "grp", "score", "n_tokens"))
    def sel(budget: Long): Set[Long] =
      Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", budget)(withNulls)
        .select("id").collect().map(_.getLong(0)).toSet
    // big budget: every doc kept, including both NULL-scored ones
    assert(sel(100000L) == (1L to 11L).toSet)
    // budget covering exactly group a's six scored docs: the NULL
    // -scored doc 10 is the one left out; group c's lone NULL doc fits
    assert(sel(240L) == (1L to 9L).toSet + 11L)
  }

  test("calibrateScore keeps NULL-scored rows, ranked nulls-first like the one-window form") {
    import org.apache.spark.sql.expressions.Window
    val scored = Seq(
      (1L, "a", Option(0.9)), (2L, "a", Option(0.5)), (3L, "a", Option.empty[Double]),
      (4L, "b", Option.empty[Double])
    ).toDF("id", "grp", "score")
    val twoPhase = Selection.calibrateScore("id", "score", "grp")(scored)
      .select("id", "score_pct").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val oneWindow = scored.withColumn("score_pct",
        percent_rank().over(Window.partitionBy("grp").orderBy("score")))
      .select("id", "score_pct").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(twoPhase == oneWindow, s"two-phase $twoPhase vs one-window $oneWindow")
    assert(twoPhase.keySet == Set(1L, 2L, 3L, 4L)) // nothing dropped
  }

  test("temp/output column clashes fail loudly instead of clobbering caller data") {
    val hasBin = corpus.withColumn("__bin", lit(1))
    intercept[IllegalArgumentException] {
      Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", 10L)(hasBin)
    }
    val hasPct = corpus.withColumn("score_pct", lit(0.5))
    intercept[IllegalArgumentException] {
      Selection.calibrateScore("id", "score", "grp")(hasPct)
    }
  }

  test("the per-document window runs on the boundary slice behind a broadcast of bin decisions") {
    val plan = Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", 120L)(corpus)
      .queryExecution.executedPlan.toString
    // bin decisions join back via broadcast (groups x bins rows), and
    // nothing in the plan is a cartesian
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("calibrateScore equals the single-window percent_rank, ties included") {
    // scores with in-bin ties and cross-bin spread at bins=100
    val scored = Seq(
      (1L, "a", 0.505), (2L, "a", 0.505), (3L, "a", 0.509), (4L, "a", 0.901),
      (5L, "a", 0.101), (6L, "b", 0.700), (7L, "b", 0.700), (8L, "b", 0.300),
      (9L, "c", 0.5) // singleton group → 0.0
    ).toDF("id", "grp", "score")
    val twoPhase = Selection.calibrateScore("id", "score", "grp", bins = 100)(scored)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score_pct")).toMap
    val oneWindow = scored.withColumn("score_pct",
      org.apache.spark.sql.functions.percent_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy("grp").orderBy("score")))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("score_pct")).toMap
    assert(twoPhase == oneWindow)
    assert(twoPhase(1L) == twoPhase(2L))        // ties share a percentile
    assert(twoPhase(9L) == 0.0)                 // singleton
    assert(twoPhase(4L) == 1.0)                 // group max
  }

  test("calibrateScore windows within (group, bin) behind broadcast offsets") {
    val scored = corpus.withColumnRenamed("n_tokens", "nt")
    val plan = Selection.calibrateScore("id", "score", "grp")(scored)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert("windowspecdefinition\\(grp#\\d+, __bin#\\d+".r.findFirstIn(plan).isDefined, plan)
  }

  test("curriculumPriority: mix=0 is a strict quality sort, mix=1 a pure reshuffle") {
    val scored = Seq(
      (1L, "a", 0.9), (2L, "a", 0.7), (3L, "a", 0.5), (4L, "a", 0.3), (5L, "a", 0.1)
    ).toDF("id", "grp", "score")
    def order(mix: Double): Seq[Long] =
      Selection.curriculumPriority("id", "score", "grp", mix)(scored)
        .orderBy("priority", "id").collect().map(_.getAs[Long]("id")).toSeq
    assert(order(0.0) == Seq(1L, 2L, 3L, 4L, 5L))       // best quality first
    val shuffled = order(1.0)
    assert(shuffled.sorted == Seq(1L, 2L, 3L, 4L, 5L))
    assert(shuffled != Seq(1L, 2L, 3L, 4L, 5L))         // hash order, not quality
    // 0 < mix < 1 blends: deterministic, and distinct from both poles
    val mid = order(0.5)
    assert(mid == order(0.5))                            // reproducible
    intercept[IllegalArgumentException](
      Selection.curriculumPriority("id", "score", "grp", 1.5)(scored))
  }

  test("rejects non-positive budget and bins") {
    intercept[IllegalArgumentException] {
      Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", 0L)(corpus)
    }
    intercept[IllegalArgumentException] {
      Selection.tokenBudgetSelect("id", "score", "n_tokens", "grp", 10L, bins = 0)(corpus)
    }
  }
}
