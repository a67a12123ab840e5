package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus drift report: population stability index (PSI) between two
  * corpus snapshots, per categorical dimension value.
  *
  * A continuously-ingested training corpus changes shape silently —
  * a crawler config change flips the language mix, a new source
  * floods one domain — and the damage shows up epochs later in the
  * model. The standard monitor is PSI over each control dimension
  * (language, source, length band):
  * `PSI = Σ_v (p_new(v) − p_old(v)) · ln(p_new(v) / p_old(v))`,
  * with the usual reading: < 0.1 stable, 0.1–0.25 drifting, > 0.25
  * shifted. Both terms are add-1 smoothed so values present in only
  * one snapshot contribute a finite penalty instead of ∞.
  *
  * Scale shape: one partial-aggregated count per snapshot (shuffle
  * key = the dimension value, never rows), a full-outer join of two
  * DIMENSION-sized tables, totals via a bounded single-partition
  * window over that tiny table (the [[Sampling.domainMixture]]
  * shape), and per-value arithmetic. Corpus size only affects the
  * two counting scans.
  *
  * Engine-portable determinism: per-value PSI contributions are
  * quantized to FIXED-POINT longs (`floor(x·fpScale + 0.5)`, the
  * [[Quantize]] half mode), so the headline total is an exact
  * integer sum — order-independent, replayable bit-for-bit by the
  * DuckDB oracle. Banded numeric drift reuses this by passing a
  * CASE band expression as the dimension (see the `drift_doc_lang`
  * and length-band gate queries in SparkEntry).
  *
  * Reference scope note: the reference engine (994-line pandas ETL)
  * has no monitoring surface; this extends the mandated
  * training-data-pipeline family (SURVEY.md §6) — the temporal twin
  * of [[Sampling.domainMixture]]'s static balancing.
  */
object Drift {

  /** Per-value drift between `oldDf` and `newDf` on `dim` (a column
    * or band expression evaluated against BOTH frames). Output: one
    * row per value seen in either snapshot — counts, fixed-point
    * smoothed PSI contribution, and the fixed-point total replicated
    * on every row (integer window sum) so a single-row reading does
    * not need a second aggregation.
    */
  def categoryDrift(
      dim: Column,
      fpScale: Double = 1e6)(oldDf: DataFrame, newDf: DataFrame): DataFrame = {
    val o = oldDf.groupBy(dim.as("value")).agg(count(lit(1)).as("n_old"))
    val n = newDf.groupBy(dim.as("value")).agg(count(lit(1)).as("n_new"))
    // null-safe join key: each side's groupBy keeps ONE null group
    // (docs with a NULL dimension), and a null-unsafe join would emit
    // TWO rows for it — (null, n, 0) and (null, 0, n) — each paying a
    // presence-only smoothed penalty, so a stable corpus with NULLs
    // would read as drifting (and k would overcount by one)
    val joined = o.join(n, o("value") <=> n("value"), "full")
      .select(
        coalesce(o("value"), n("value")).as("value"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    // totals + distinct-value count over the dimension-sized table:
    // single-partition window, bounded by the dimension's cardinality
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val k = count(lit(1)).over(w)
    val pOld = (col("n_old") + lit(1L)).cast("double") / (sum("n_old").over(w) + k)
    val pNew = (col("n_new") + lit(1L)).cast("double") / (sum("n_new").over(w) + k)
    joined
      .withColumn("psi_fp",
        floor((pNew - pOld) * (log(pNew) - log(pOld)) * lit(fpScale) + lit(0.5d))
          .cast("long"))
      .withColumn("psi_total_fp", sum("psi_fp").over(w))
  }

  /** Per-document diff between two corpus snapshots: every id seen in
    * either snapshot labelled `added` / `removed` / `modified` /
    * `unchanged`. "Modified" compares an md5 DIGEST of the payload
    * columns (concat with a \u0001 separator that cannot occur in
    * text), so the full-outer join shuffles 32-char digests keyed by
    * id — never document bodies — and the whole diff is one
    * co-partitioned hash join at any corpus size. The content-level
    * complement of [[categoryDrift]]'s distribution-level view:
    * PSI says the language mix moved, this says WHICH documents did.
    *
    * NULLs are encoded, not skipped: `concat_ws` silently drops NULL
    * arguments (separator and all), which would let (NULL, "en")
    * collide with ("en", NULL); each column therefore contributes a
    * presence tag — "N" for NULL, "V" + value otherwise — so a NULL
    * can never digest equal to any real value.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "snapshotDiff needs at least one payload column")
    def tagged(c: String) =
      when(col(c).isNull, lit("N")).otherwise(concat(lit("V"), col(c).cast("string")))
    def digest(df: DataFrame, as: String) = df.select(col(idCol),
      md5(concat_ws("\u0001", payloadCols.map(tagged): _*)).as(as))
    digest(oldDf, "__od").join(digest(newDf, "__nd"), Seq(idCol), "full")
      .select(col(idCol),
        when(col("__od").isNull, "added")
          .when(col("__nd").isNull, "removed")
          .when(col("__od") =!= col("__nd"), "modified")
          .otherwise("unchanged").as("status"))
  }

  /** Cross-source VOCABULARY overlap matrix — the lexical
    * domain-similarity diagnostic behind mixture planning: for every
    * unordered source pair, the two vocabulary sizes, the shared
    * vocabulary, and its Jaccard. Complements
    * [[graft.llm.Dedup.crossSourceOverlap]] (which finds duplicated
    * CONTENT across sources via k-gram doc pairs): two domains can
    * share zero documents yet use near-identical vocabulary — that is
    * a mixing/weighting signal, not a dedup signal.
    *
    * All counts are exact integers; `jaccard` is one IEEE division —
    * engine-exact. Shuffle budget: one (source, token) distinct (the
    * vocabulary reduction — partial-agg map-side), then a token-keyed
    * self-join of VOCABULARY-sized tables (never corpus-sized), a
    * pair-keyed count, and a broadcast of the per-source totals
    * (groups-row table). Token strings shuffle once; documents never.
    */
  def vocabOverlapMatrix(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // the vocabulary reduction (corpus explode + distinct — the only
    // corpus-sized work here) feeds FOUR consumers (two total tables,
    // both self-join sides). NOT persisted: a lazily-returned frame
    // could never unpersist its cache (the allPairsJaccard rule — the
    // leak outlives the call), and it doesn't need to be: all four
    // consumers sit in ONE returned plan over the IDENTICAL distinct
    // subtree, so ReuseExchange computes the corpus explode + distinct
    // shuffle once and the other consumers read its output
    // (ReusedExchange in the physical plan — asserted by MiningSpec).
    val vocab = df
      .select(col(groupCol).as("__g"),
        explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .distinct()
    val sizes = vocab.groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val shared = vocab.toDF("__ga", "__t")
      .join(vocab.toDF("__gb", "__t2"),
        col("__t") === col("__t2") && col("__ga") < col("__gb"))
      .groupBy(col("__ga").as("source_a"), col("__gb").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    // pair frame from the groups-sized totals table, so pairs with
    // ZERO shared vocabulary still get a row (the inner self-join
    // alone would silently drop them from the matrix)
    sizes.toDF("source_a", "__na")
      .crossJoin(sizes.toDF("source_b", "__nb"))
      .where(col("source_a") < col("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(
        col("source_a"), col("source_b"),
        col("__na").as("n_vocab_a"), col("__nb").as("n_vocab_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)).cast("double") /
          (col("__na") + col("__nb") - coalesce(col("n_shared"), lit(0L)))).as("jaccard"))
  }
}
