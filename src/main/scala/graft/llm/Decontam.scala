package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set — the standard published
  * leakage control for pretraining corpora (GPT-3-style 13-gram
  * overlap scans; n is a parameter here because the gated corpus is
  * synthetic word streams). The reference engine (a pandas config
  * ETL) has no such surface; this belongs to the mandated
  * training-data-pipeline family (SURVEY.md §6) alongside dedup.
  *
  * Scale shape: the benchmark side is tiny by construction (eval
  * suites are thousands of documents against a 100 TB corpus), so its
  * distinct-gram set is broadcast and the overlap test is a
  * broadcast LEFT SEMI join — the corpus side streams through in one
  * pass with NO shuffle of grams; the only exchange is the per-doc
  * hit-count aggregation on the id. Grams are built with
  * [[Dedup.shingles]]'s zip_with-over-shifted-slices form (evaluated
  * once per row, never per element). If a benchmark set ever outgrows
  * broadcast, drop the hint and the same plan becomes a shuffled
  * semi-join on the gram — semantics unchanged.
  */
object Decontam {

  /** The distinct word-n-gram set of the benchmark frame. */
  def benchGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(Dedup.shingles(textCol, n)).as("gram")).distinct()

  /** Per-training-document contamination report: `n_grams` = the
    * doc's distinct n-gram count, `n_hits` = how many of those appear
    * anywhere in the benchmark set, `contaminated` = n_hits > 0.
    * Documents shorter than n words contribute their whole text as a
    * single gram (the [[Dedup.shingles]] short-doc rule, which also
    * guarantees every doc at least one gram — so one aggregation
    * covers the whole train side). ONE corpus scan: the exploded
    * grams meet the broadcast bench set in a marker left join, and a
    * single per-doc aggregation produces both counts — no second
    * pass, no corpus-side outer join.
    */
  def contaminationReport(
      train: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    val bg = benchGrams(bench, textCol, n).withColumn("__hit", lit(1))
    train
      .select(col(idCol), explode(array_distinct(Dedup.shingles(textCol, n))).as("gram"))
      .join(broadcast(bg), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** The benchmark gram set collected to the driver — bounded by the
    * benchmark's size (eval suites are thousands of documents, never
    * corpus-scale), the same driver-local-bounded-state class as the
    * IVF training sample. Feed to [[contaminated]] /
    * [[streamingDecontamFilter]].
    */
  def collectBenchGrams(bench: DataFrame, textCol: String, n: Int = 5): Seq[String] =
    benchGrams(bench, textCol, n).collect().map(_.getString(0)).toSeq

  /** Pure row predicate: does this text share any word n-gram with
    * the (driver-collected) benchmark set? `arrays_overlap` against
    * the embedded literal — no join, no shuffle, no state, so it
    * composes into any plan, including append-mode streams.
    */
  def contaminated(benchGramSet: Seq[String], textCol: String, n: Int = 5): Column =
    arrays_overlap(Dedup.shingles(textCol, n), typedLit(benchGramSet))

  /** Streaming face of decontamination: drop stream rows that leak
    * benchmark n-grams. Stateless (a row predicate over the embedded
    * gram set), so it needs no watermark and cannot accumulate state —
    * the right shape for an ingest feed that must never admit eval
    * data. Spec-pinned streaming == batch on identical input
    * (LlmSpec/StreamingSpec pattern).
    */
  def streamingDecontamFilter(
      docs: DataFrame,
      benchGramSet: Seq[String],
      textCol: String,
      n: Int = 5): DataFrame =
    docs.where(!contaminated(benchGramSet, textCol, n))
}
