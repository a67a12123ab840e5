package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quality-ranked token-budget corpus selection — "keep the best
  * `budget` tokens of every source", the step that turns scored and
  * deduplicated documents into the corpus a training run actually
  * reads. The reference pipeline ends at flat standardized tables
  * (`/root/reference/Athena_DynamoDB_Normalized.py:30-81`); this is
  * the data-selection extension on top, the greedy quality-prefix rule
  * used by quality-filtered corpus builds: order each group's
  * documents by score descending and keep the prefix whose cumulative
  * token count fits the budget.
  *
  * Semantics (what the DuckDB oracle replays literally): within each
  * group, order by (score DESC, id ASC) and keep every document whose
  * INCLUSIVE running token sum is <= budget. Greedy prefix, not
  * knapsack — a later shorter document is not pulled forward past the
  * first overflow, matching how production selectors behave
  * (deterministic, stable under appends of lower-scored docs).
  *
  * Scale shape (what the Spark plan actually does): the naive form is
  * one window per group ordered by score — a PER-GROUP GLOBAL SORT,
  * which at 100 TB puts each source's whole corpus through a single
  * partition. Instead the selection is resolved at SCORE-BIN
  * granularity first: quantize the score into `bins` buckets,
  * aggregate token sums per (group, bin) — a partial-aggregated
  * exchange carrying `groups x bins` rows — and decide each bin
  * wholesale with a prefix sum over that tiny table. Only the single
  * boundary bin per group (the bin the budget lands inside) needs
  * per-document ordering, and that window runs on just the boundary
  * bin's slice. Because the bin is a monotone function of the score,
  * bin-wholesale + exact-boundary equals the per-document prefix rule
  * exactly — the oracle pins that equivalence every round.
  */
object Selection {

  /** Keep each group's highest-scored prefix under a token budget.
    * `scoreCol` must be in [0, 1] (a quality score); `bins` sets the
    * boundary-resolution granularity (the boundary bin's slice is the
    * only per-document-sorted work, so more bins = thinner slice).
    * Output: the kept rows of `df`, original columns only.
    */
  def tokenBudgetSelect(
      idCol: String,
      scoreCol: String,
      tokensCol: String,
      groupCol: String,
      budget: Long,
      bins: Int = 1000)(df: DataFrame): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(bins > 0, s"bins must be positive, got $bins")
    val temps = Seq("__bin", "__above", "__keep_all", "__boundary", "__cum")
    val clash = df.columns.toSet.intersect(temps.toSet)
    require(clash.isEmpty,
      s"tokenBudgetSelect uses internal columns ${clash.mkString(", ")} already " +
        "present in the input — rename them first (silent clobber)")
    // floor(score * bins) is monotone in score, so ordering by
    // (bin DESC, score DESC, id) == (score DESC, id): deciding whole
    // bins against the budget is exactly the per-document prefix rule
    val binned = df.withColumn("__bin",
      floor(col(scoreCol).cast("double") * bins).cast("long"))
    val perBin = binned.groupBy(col(groupCol), col("__bin"))
      .agg(sum(col(tokensCol).cast("long")).as("__bin_tokens"))
    // tokens in strictly higher-scored bins (exclusive prefix over the
    // groups x bins table — single tiny exchange)
    val wBins = Window.partitionBy(groupCol).orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val decided = perBin
      .withColumn("__above", coalesce(sum("__bin_tokens").over(wBins), lit(0L)))
      .withColumn("__keep_all", col("__above") + col("__bin_tokens") <= budget)
      .withColumn("__boundary",
        !col("__keep_all") && col("__above") < budget)
      .select(col(groupCol), col("__bin"), col("__above"),
        col("__keep_all"), col("__boundary"))
    // NULL-SAFE join keys: a NULL score bins to NULL and a NULL group
    // value is a real group — a null-unsafe equi-join would silently
    // DROP those rows. NULL bins sort last under the desc windows
    // (Spark desc = nulls last), so a NULL-scored doc competes after
    // every scored one — exactly the one-window (score DESC NULLS
    // LAST, id) rule this decomposition claims to equal.
    val joined = binned.join(broadcast(decided),
        binned(groupCol) <=> decided(groupCol) &&
          binned("__bin") <=> decided("__bin"))
      .drop(decided(groupCol)).drop(decided("__bin"))
    val keepWhole = joined.where(col("__keep_all"))
    // boundary bin: per-document prefix, offset by the higher bins'
    // total — the window's input is one bin's rows per group, not the
    // group's corpus
    val wDocs = Window.partitionBy(groupCol, "__bin")
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keepBoundary = joined.where(col("__boundary"))
      .withColumn("__cum", col("__above") + sum(col(tokensCol).cast("long")).over(wDocs))
      .where(col("__cum") <= budget)
      .drop("__cum")
    keepWhole.unionByName(keepBoundary)
      .drop("__bin", "__above", "__keep_all", "__boundary")
  }

  /** Cross-domain score calibration: each document's score becomes
    * its exact percentile rank WITHIN its group —
    * `percent_rank() OVER (PARTITION BY group ORDER BY score)`, the
    * standard fix for mixing quality scores across heterogeneous
    * sources (a 0.6 from a clean source and a 0.6 from a noisy one
    * mean different things; their percentiles are comparable).
    *
    * Same no-per-group-global-sort discipline as
    * [[tokenBudgetSelect]]: the rank decomposes over score bins —
    * `rank = (# docs in lower bins) + rank-within-bin` — because the
    * bin is monotone in the score. The groups×bins count table
    * carries the lower-bin prefix sums and group totals (broadcast
    * back); the per-document `rank()` window runs within
    * (group, bin) slices, ties (same score ⇒ same bin) resolve
    * identically to the global window. Equality with the one-window
    * form is spec-pinned and oracle-replayed.
    */
  def calibrateScore(
      idCol: String,
      scoreCol: String,
      groupCol: String,
      outCol: String = "score_pct",
      bins: Int = 1000)(df: DataFrame): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val clash = df.columns.toSet
      .intersect(Set(outCol, "__bin", "__below", "__n", "__rank"))
    require(clash.isEmpty,
      s"calibrateScore writes columns ${clash.mkString(", ")} already present " +
        "in the input — rename them first (silent clobber)")
    val binned = df.withColumn("__bin",
      floor(col(scoreCol).cast("double") * bins).cast("long"))
    val counts = binned.groupBy(col(groupCol), col("__bin"))
      .agg(count(lit(1)).as("__bin_n"))
    val wBelow = Window.partitionBy(groupCol).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTotal = Window.partitionBy(groupCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__below", coalesce(sum("__bin_n").over(wBelow), lit(0L)))
      .withColumn("__n", sum("__bin_n").over(wTotal))
      .drop("__bin_n")
    val wBin = Window.partitionBy(groupCol, "__bin")
      .orderBy(col(scoreCol))
    // null-safe keys for the same reason as tokenBudgetSelect: NULL
    // scores/groups must rank (nulls FIRST under the asc windows,
    // matching the one-window percent_rank form), never silently drop
    binned.join(broadcast(offsets),
        binned(groupCol) <=> offsets(groupCol) &&
          binned("__bin") <=> offsets("__bin"))
      .drop(offsets(groupCol)).drop(offsets("__bin"))
      .withColumn("__rank", col("__below") + rank().over(wBin).cast("long"))
      .withColumn(outCol,
        when(col("__n") > 1L,
          (col("__rank") - 1L).cast("double") / (col("__n") - 1L).cast("double"))
          .otherwise(lit(0.0)))
      .drop("__bin", "__below", "__n", "__rank")
  }

  /** Curriculum priority: a deterministic blend of calibrated quality
    * and a stable per-document hash —
    * `priority = (1−mix)·score_pct + mix·hash_frac`. Reading the
    * corpus in ascending priority gives a quality-annealed order
    * (high-quality docs early) with `mix` controlling how much
    * hash-shuffle randomness dilutes the ranking: mix=1 is a pure
    * [[Packing.epochShuffle]]-style reshuffle, mix=0 a strict
    * quality sort — curriculum-learning schedules live in between,
    * reproducible batch-for-batch because both ingredients are pure
    * functions of the data ([[calibrateScore]]'s percentile and the
    * md5 fraction). NOTE: ascending priority = LOW percentile first;
    * callers wanting best-first order by `1 − score_pct` via
    * `descending = true`.
    *
    * Exactness: the blend is two exact-scaled doubles and one IEEE
    * add — engine-portable bit-for-bit when `mix` is binary-exact
    * (0.5, 0.25, ...), the same contract as [[Packing
    * .mixtureSchedule]]'s power-of-two rates. Adds nothing to
    * [[calibrateScore]]'s shuffle budget: the blend is a per-row map.
    */
  def curriculumPriority(
      idCol: String,
      scoreCol: String,
      groupCol: String,
      mix: Double,
      descending: Boolean = true,
      outCol: String = "priority",
      bins: Int = 1000)(df: DataFrame): DataFrame = {
    require(mix >= 0.0 && mix <= 1.0, s"mix must be in [0,1], got $mix")
    val calibrated = calibrateScore(idCol, scoreCol, groupCol, bins = bins)(df)
    val quality =
      if (descending) lit(1.0) - col("score_pct") else col("score_pct")
    calibrated.withColumn(outCol,
      quality * (1.0 - mix) + Sampling.hashFraction(col(idCol)) * mix)
  }

  /** Per-source curation FUNNEL — the release dashboard row every
    * corpus build reports: how many documents each source contributed,
    * how many survive the quality-rule gate, and how many remain after
    * exact dedup (keep-lowest-id per content digest among the
    * survivors), with the stage-over-stage retention fractions. One
    * row per source; the cross-stage story `pipeline_preprocess`
    * executes, re-expressed as counts.
    *
    * Shuffle budget: the quality verdict is computed inline
    * ([[TextAnalysis.withGopherSignals]] is row-local — no join back
    * on the id); exact dedup is the md5-digest keep-first aggregation
    * ([[Dedup.exactDedup]]'s shape); the final rollup is a
    * groups-sized aggregate. Bodies never shuffle — digests and
    * booleans do.
    */
  def curationFunnel(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      stopwords: Seq[String] = TextAnalysis.gopherStopwords): DataFrame = {
    val flagged = TextAnalysis.withGopherSignals(textCol, stopwords)(docs)
      .select(col(idCol), col(sourceCol), col(textCol), col("passes_gopher"))
    val passing = flagged.where(col("passes_gopher"))
    val keepIds = passing
      .groupBy(md5(col(textCol)).as("__digest"))
      .agg(min(col(idCol)).as("__keep_id"))
      .select(col("__keep_id").as(idCol))
    val kept = passing.join(keepIds, Seq(idCol), "left_semi")
      .groupBy(col(sourceCol)).agg(count(lit(1)).as("n_kept_unique"))
    flagged.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("passes_gopher").cast("long")).as("n_pass_rules"))
      .join(kept, Seq(sourceCol), "left")
      .select(
        col(sourceCol),
        col("n_docs"),
        col("n_pass_rules"),
        coalesce(col("n_kept_unique"), lit(0L)).as("n_kept_unique"),
        (col("n_pass_rules").cast("double") / col("n_docs")).as("pass_frac"),
        (coalesce(col("n_kept_unique"), lit(0L)).cast("double") / col("n_docs"))
          .as("keep_frac"))
  }
}
