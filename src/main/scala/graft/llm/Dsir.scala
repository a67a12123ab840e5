package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: hashed n-gram importance weights.
  *
  * Data Selection via Importance Resampling (Xie et al. 2023, public)
  * scores every raw document by how target-like its hashed n-gram
  * distribution is: `score(doc) = Σ_grams log(p_target(bucket) /
  * p_raw(bucket))` — the log-likelihood ratio of the doc under two
  * smoothed bag-of-hashed-grams models. Pipelines rank or resample
  * the raw corpus by this score to pull a target-domain-shaped subset
  * out of a web-scale crawl. At 100 TB the shape matters more than
  * the formula:
  *
  *  - feature extraction is one explode pass; only (doc_id, bucket)
  *    ints ever shuffle, never text;
  *  - both gram models come from ONE aggregation over that pass
  *    (conditional count for the target side), producing a
  *    `buckets`-row table — constant-size regardless of corpus;
  *  - the totals the smoothing needs are an unbounded window over
  *    that constant-size table (same bounded single-partition shape
  *    as [[Sampling.domainMixture]]);
  *  - the per-doc score is a broadcast equi-join of the tiny bucket
  *    table back onto the gram stream + one integer sum per doc.
  *
  * Engine-portable determinism: bucket log-ratios are FIXED-POINT
  * (`floor(x·fpScale + 0.5)` as long, micro-nats at the default
  * scale), so the per-doc score is an INTEGER sum — order-independent
  * and exact — rather than a float accumulation whose value depends
  * on partitioning. The only cross-engine float ops are the B
  * per-bucket `ln` calls, quantized once each.
  *
  * Grams are [[Dedup.shingles]] word bigrams (same short-doc rule:
  * documents under 2 tokens contribute their whole text as one gram)
  * hashed with [[Sampling.hashBucket]]'s md5 construction, so the
  * DuckDB oracle replays the bucketing bit-for-bit. The corpus is
  * scanned twice (counts, then scoring) — both scans column-pruned,
  * cheaper than caching the exploded gram stream at scale (the
  * [[Packing.mixtureSchedule]] trade, documented there).
  *
  * Reference scope note: the reference engine (994-line pandas ETL)
  * has no selection surface; this is part of the mandated
  * training-data-pipeline family (SURVEY.md §6), the scoring
  * complement of [[Sampling]]'s mechanical splits.
  */
object Dsir {

  /** Per-doc importance score against a target subset defined by a
    * row predicate on the SAME frame (e.g. `col("lang") === "en"`).
    * Output: one row per input doc — `n_grams` and the fixed-point
    * `score_fp` (micro-nats at the default scale; higher = more
    * target-like). A NULL text coalesces to the empty string, which
    * the short-doc rule turns into ONE empty gram — so such docs
    * still appear in the output (with the empty-gram bucket's ratio)
    * instead of silently vanishing from `explode(NULL)`. Docs whose
    * grams all hash to never-seen buckets cannot occur (raw counts
    * include every doc, so c_raw ≥ 1 for every bucket a doc touches).
    */
  def importanceWeights(
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      fpScale: Double = 1e6)(df: DataFrame): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val grams = df
      .select(col(idCol), isTarget.as("__is_target"),
        coalesce(col(textCol).cast("string"), lit("")).as("__text"))
      .select(col(idCol), col("__is_target"),
        explode(Dedup.shingles("__text", 2)).as("__gram"))
      .select(col(idCol), col("__is_target"),
        Sampling.hashBucket(col("__gram"), buckets).as("bucket"))

    // one pass for BOTH models: raw = every gram, target = the
    // predicate's grams (conditional count)
    val counts = grams.groupBy("bucket").agg(
      count(lit(1)).as("c_raw"),
      count(when(col("__is_target"), 1)).as("c_tgt"))

    // totals via an unbounded window over the buckets-row table —
    // single-partition but bounded by construction (≤ `buckets` rows)
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val b = lit(buckets.toLong)
    val model = counts
      .withColumn("__t_total", sum("c_tgt").over(w))
      .withColumn("__r_total", sum("c_raw").over(w))
      // add-1 smoothed log-ratio, quantized to fixed point ONCE per
      // bucket; floor(x+0.5) for the portable half mode (see Quantize)
      .select(col("bucket"),
        floor(
          (log((col("c_tgt") + lit(1L)).cast("double") / (col("__t_total") + b)) -
            log((col("c_raw") + lit(1L)).cast("double") / (col("__r_total") + b))) *
            lit(fpScale) + lit(0.5d))
          .cast("long").as("ratio_fp"))

    grams.join(broadcast(model), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum("ratio_fp").as("score_fp"))
  }
}
