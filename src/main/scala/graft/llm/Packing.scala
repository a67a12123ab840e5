package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — laying a corpus of variable-length documents
  * into the fixed-token-budget training sequences a pretraining run
  * consumes. The reference pipeline stops at flat tables
  * (`Athena_DynamoDB_Normalized.py:30-81` is its final layout step);
  * packing is the extension a training-data user needs on top: every
  * LLM data loader concatenates documents into one token stream and
  * chunks it every `budget` tokens ("concat-and-chunk", the GPT/T5
  * pretraining layout), because padding variable-length docs wastes
  * FLOPs proportional to the length variance.
  *
  * Distributed layout: a single global token stream would serialize
  * the cumulative sum behind one total sort, so the stream is sharded
  * by a stable key hash ([[Sampling.hashBucket]]) and each shard is an
  * independent contiguous stream — exactly how multi-worker loaders
  * shard a corpus. The plan is then one hash exchange on `shard` plus
  * a per-shard local sort (the window), no global sort, no driver
  * state; at 100 TB you raise `shards` so each shard's sort fits an
  * executor (shards ≈ corpus_tokens / ~1e9 keeps a shard's window
  * state around a few GB), and shard count — not corpus size — sets
  * the parallelism.
  *
  * Determinism: shard assignment is md5-based and the in-shard order
  * is the document key, so the layout is a pure function of the data —
  * re-running, repartitioning, or growing the corpus never moves a
  * document to a different `(shard, pack_id, pack_offset)` unless its
  * shard's prefix changed. That is what makes packed layouts
  * resumable and auditable (the same property [[Sampling]] gives
  * splits).
  */
object Packing {

  /** Assign each document its position in the packed layout:
    * `shard` (stable hash bucket), `pack_id` (which budget-sized
    * chunk of the shard's token stream the document STARTS in),
    * `pack_offset` (token offset inside that chunk), and
    * `spans_boundary` (true iff the document crosses into the next
    * chunk — the loader will split it, the classic concat-and-chunk
    * behavior). Documents are laid out in ascending `idCol` order
    * within a shard; `nTokensCol` is the document's token count.
    *
    * Integer arithmetic only (`div` on longs), so any engine replays
    * the layout bit-for-bit — the DuckDB oracle for `pack_sequences`
    * is the same window cumsum with `//`.
    */
  def packSequences(
      idCol: String,
      nTokensCol: String,
      budget: Int,
      shards: Int = 64)(df: DataFrame): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", Sampling.hashBucket(col(idCol), shards))
      .withColumn("tokens_before",
        sum(col(nTokensCol).cast("long")).over(w) - col(nTokensCol).cast("long"))
      .withColumn("pack_id", expr(s"tokens_before div ${budget.toLong}L"))
      .withColumn("pack_offset", col("tokens_before") - col("pack_id") * budget.toLong)
      .withColumn("spans_boundary", col("pack_offset") + col(nTokensCol) > budget.toLong)
      .drop("tokens_before")
  }

  /** Per-pack roll-up of [[packSequences]]: documents and tokens
    * STARTING in each chunk — the shape a loader manifest or a
    * packing-efficiency audit reads. Same single exchange (the
    * groupBy keys subsume the window's partitioning).
    */
  def packManifest(
      idCol: String,
      nTokensCol: String,
      budget: Int,
      shards: Int = 64)(df: DataFrame): DataFrame =
    packSequences(idCol, nTokensCol, budget, shards)(df)
      .groupBy("shard", "pack_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(nTokensCol).cast("long")).as("n_tokens"),
        sum(when(col("spans_boundary"), 1L).otherwise(0L)).as("n_spanning"))

  /** Deterministic source-mixture training schedule — stride
    * scheduling: document number `i` of source `s` gets virtual time
    * `vt = i / rate_s`, and reading the corpus in `vt` order
    * interleaves sources at their target rates (a source with rate
    * 0.5 appears every 2nd step a rate-1.0 source would fill) — the
    * deterministic counterpart of sampling-with-ratios data loaders,
    * reproducible batch-for-batch across runs.
    *
    * The per-source sequence number is computed by TWO-PHASE ranking,
    * not a per-source global sort (which would put each source's
    * whole corpus through one partition — the classic skew
    * scale-killer): phase 1 ranks within `(source, shard)` after one
    * hash exchange; phase 2 turns the tiny `(source, shard)` count
    * table into per-shard start offsets and broadcast-joins them
    * back, so `rank = shard_offset + local_rank` equals
    * `row_number() OVER (PARTITION BY source ORDER BY shard, id)`
    * with per-shard parallelism. The offsets table is
    * `n_sources × shards` rows regardless of corpus size.
    *
    * `rates` maps source → rate in (0, 1]; unlisted sources get
    * `defaultRate`. Power-of-two rates make `vt` an exact binary
    * scaling of the integer rank (engine-bit-exact); other rates are
    * one IEEE division, still deterministic. Produces `rank_in_source`
    * and `vt`; the caller materializes the order with a range sort on
    * `vt` only when a totally-ordered manifest is actually needed.
    */
  def mixtureSchedule(
      idCol: String,
      sourceCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double = 1.0,
      shards: Int = 64)(df: DataFrame): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    (rates.map(_._2) :+ defaultRate).foreach(r =>
      require(r > 0 && r <= 1.0, s"rates must be in (0, 1], got $r"))
    // NON-NULL join/partition keys, built BEFORE the ranked/offsets
    // branch: a NULL source (scheduled at defaultRate — the rate fold
    // below expects it) or a NULL id (NULL hash bucket) would never
    // match the null-unsafe offsets join and silently vanish from the
    // schedule. "N"/"V"+value presence tagging (the snapshotDiff
    // rule) is collision-free, unlike a sentinel string.
    val sharded = df
      .withColumn("shard",
        coalesce(Sampling.hashBucket(col(idCol), shards), lit(-1L)))
      .withColumn("__sk",
        when(col(sourceCol).isNull, lit("N"))
          .otherwise(concat(lit("V"), col(sourceCol).cast("string"))))
    val localW = Window.partitionBy("__sk", "shard").orderBy(col(idCol))
    val ranked = sharded.withColumn("local_rank", row_number().over(localW).cast("long"))
    // tiny side: per-(source, shard) counts → exclusive prefix sums
    val offW = Window.partitionBy("__sk").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("__sk", "shard").count()
      .withColumn("shard_offset", coalesce(sum("count").over(offW), lit(0L)))
      .drop("count")
    val rate = rates.foldLeft(lit(null).cast("double")) { case (acc, (s, r)) =>
      coalesce(acc, when(col(sourceCol) === s, lit(r)))
    }
    ranked.join(broadcast(offsets), Seq("__sk", "shard"))
      .withColumn("rank_in_source", col("shard_offset") + col("local_rank"))
      .withColumn("vt",
        col("rank_in_source").cast("double") / coalesce(rate, lit(defaultRate)))
      .drop("local_rank", "shard_offset", "__sk")
  }

  /** Deterministic per-epoch reshuffle schedule — the data-ORDER
    * counterpart of [[Sampling.withHashSplit]]'s membership
    * determinism. Multi-epoch training re-reads the corpus in a
    * different order each epoch; doing it with an RNG makes run
    * resumption and batch-level reproduction impossible, so loaders
    * derive the order from a hash of (document, epoch): same corpus +
    * same epoch → bit-identical order, different epochs → independent
    * orders.
    *
    * `order_key` is the 60-bit md5 prefix of `"id:epoch"`
    * ([[Sampling.hashKey]]) and `rank` is the document's position in
    * ascending `order_key` within its epoch — i.e.
    * `row_number() OVER (PARTITION BY epoch ORDER BY order_key, id)`,
    * which is exactly what the DuckDB oracle replays.
    *
    * Scale shape: that row_number is a PER-EPOCH GLOBAL SORT if
    * computed naively. Instead the key space is RANGE-sharded on the
    * order key itself (`shards` must be a power of two so the shard
    * boundary is an exact binary split of 2^60): ascending
    * (shard, order_key) equals ascending order_key globally, so
    * phase-1 ranks within (epoch, shard) after one hash exchange and
    * phase-2 adds per-shard start offsets from a broadcast
    * `epochs x shards` count table — the [[mixtureSchedule]] two-phase
    * trick, here made EXACTLY order-preserving by deriving the shard
    * from the sort key. md5 is uniform, so range shards are balanced
    * (no skew caveat).
    */
  def epochShuffle(
      idCol: String,
      epochs: Int,
      shards: Int = 16)(df: DataFrame): DataFrame = {
    require(epochs > 0, s"epochs must be positive, got $epochs")
    require(shards > 0 && (shards & (shards - 1)) == 0 && shards <= (1 << 30),
      s"shards must be a power of two, got $shards")
    val shardWidth = (1L << 60) / shards
    val keyed = df
      .withColumn("epoch", explode(sequence(lit(0), lit(epochs - 1))))
      // NULL id coalesces to '' so order_key (and thus the shard join
      // key) is total — a NULL would drop the doc from EVERY epoch at
      // the offsets join while packSequences happily packs it; ties
      // among multiple NULL-id docs order arbitrarily, but none is
      // lost
      .withColumn("order_key",
        Sampling.hashKey(concat(coalesce(col(idCol).cast("string"), lit("")),
          lit(":"), col("epoch").cast("string"))))
      .withColumn("shard", expr(s"order_key div ${shardWidth}L"))
    val localW = Window.partitionBy("epoch", "shard")
      .orderBy(col("order_key"), col(idCol))
    val ranked = keyed.withColumn("local_rank", row_number().over(localW).cast("long"))
    val offW = Window.partitionBy("epoch").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy("epoch", "shard").count()
      .withColumn("shard_offset", coalesce(sum("count").over(offW), lit(0L)))
      .drop("count")
    ranked.join(broadcast(offsets), Seq("epoch", "shard"))
      .withColumn("rank", col("shard_offset") + col("local_rank"))
      .drop("local_rank", "shard_offset", "shard")
  }

  /** Length-bucket histogram for batch-shape planning: how many
    * documents and tokens fall in each power-of-two-ish length band.
    * Deciding sequence-length buckets (a padding-efficiency
    * alternative to packing) needs exactly this distribution.
    * Boundaries are explicit and the bucket is a when-chain — exact
    * integer comparisons, no floating log2, so the histogram is
    * engine-portable (a `CASE` in the oracle).
    */
  def lengthHistogram(
      nTokensCol: String,
      boundaries: Seq[Int] = Seq(64, 128, 256, 512, 1024, 2048, 4096))(
      df: DataFrame): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      s"boundaries must be non-empty ascending, got $boundaries")
    val n = col(nTokensCol)
    val bucket = boundaries.foldLeft(lit(null).cast("int")) { (acc, b) =>
      coalesce(acc, when(n <= b, lit(b)))
    }
    df.withColumn("bucket_hi", coalesce(bucket, lit(-1)))
      .groupBy("bucket_hi")
      .agg(count(lit(1)).as("n_docs"), sum(n.cast("long")).as("sum_tokens"))
  }

  /** Temperature-based mixture weights — the multilingual/multi-domain
    * sampling recipe (p_s ∝ n_s^(1/τ), the mBERT/XLM-R exponentiated
    * upsampling that keeps small sources from vanishing at τ > 1 while
    * τ = 1 reproduces natural proportions): per source, its token
    * count, raw weight, normalized sampling probability, and the
    * upsampling factor vs natural frequency (p_s / (n_s / N) — how
    * many effective epochs of the source a proportional consumer
    * makes).
    *
    * Engine-exactness engineering: `invTau` must be a binary-exact
    * dyadic rational (0.5, 0.25, 1.0 — the [[mixtureSchedule]]
    * power-of-two contract) so `pow(n, invTau)` hits the IEEE-exact
    * sqrt chain (pow(x, 0.5) == sqrt on both engines), and the weight
    * TOTAL is summed through an explicitly ORDERED full-frame window
    * (by source name) — a plain aggregate's combine order is
    * partition-dependent, but both engines iterate a sorted window
    * frame in the same sequence, so the running IEEE adds are
    * bit-identical. The whole computation runs on the groups-sized
    * count table; the corpus pays one partial-agg scan.
    */
  def temperatureMixtureWeights(
      sourceCol: String,
      nTokensCol: String,
      invTau: Double = 0.5)(df: DataFrame): DataFrame = {
    require(invTau > 0 && invTau <= 1,
      s"invTau must be in (0, 1], got $invTau — 1.0, 0.5 and 0.25 are engine-exact " +
        "(sqrt chains); any other exponent takes the pow path, portable only to ~1 ulp")
    val counts = df.groupBy(col(sourceCol))
      .agg(sum(col(nTokensCol).cast("long")).as("n_tokens"))
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col(sourceCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // sqrt is IEEE-correctly-rounded on every engine; pow(x, 0.5) is
    // not bit-guaranteed by libm — spell the dyadic exponents as
    // sqrt chains so the oracle replays them exactly
    val base = col("n_tokens").cast("double")
    val weightExpr = invTau match {
      case 1.0 => base
      case 0.5 => sqrt(base)
      case 0.25 => sqrt(sqrt(base))
      case t => pow(base, t) // non-dyadic: engine-portable only to ~ulp
    }
    counts
      .withColumn("weight", weightExpr)
      .withColumn("__wsum", sum(col("weight")).over(wAll))
      .withColumn("__nsum", sum(col("n_tokens")).over(wAll))
      .withColumn("prob", col("weight") / col("__wsum"))
      .withColumn("upsample_factor",
        (col("weight") / col("__wsum")) /
          (col("n_tokens").cast("double") / col("__nsum").cast("double")))
      .drop("__wsum", "__nsum")
  }
}
