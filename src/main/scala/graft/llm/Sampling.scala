package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling and split assignment for
  * corpus management. Production pipelines carve eval sets with a
  * KEY HASH, not an RNG: the assignment is then stable across runs,
  * cluster layouts, engine versions, and re-ingests of the same ids —
  * a document never migrates from val into train and contaminates
  * evaluation. md5-based arithmetic so any engine reproduces the
  * bucketing bit-for-bit (same construction as [[Dedup.md5Hash60]]).
  * Pure row expressions: zero shuffles, scales linearly at 100 TB.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the key's md5. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** THE bucket-to-split rule — one definition so [[withHashSplit]],
    * [[clusterAwareSplit]] and [[splitLeakageAudit]] cannot diverge
    * (each used to re-spell the when-chain; the audit must apply
    * exactly the rule the splitters apply or leakage checks lie).
    */
  private def splitOf(key: Column, valPct: Int, testPct: Int): Column = {
    val b = hashBucket(key)
    when(b < valPct, "val")
      .when(b < valPct + testPct, "test")
      .otherwise("train")
  }

  private def requireSplitPcts(valPct: Int, testPct: Int): Unit =
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"split percentages must fit in 100, got val=$valPct test=$testPct")

  /** Deterministic train/val/test assignment: the first `valPct`
    * buckets are validation, the next `testPct` test, the rest train.
    */
  def withHashSplit(
      keyCol: String,
      valPct: Int = 5,
      testPct: Int = 5,
      outCol: String = "split")(df: DataFrame): DataFrame = {
    requireSplitPcts(valPct, testPct)
    df.withColumn(outCol, splitOf(col(keyCol), valPct, testPct))
  }

  /** Deterministic `pct`% sample: keep rows whose key bucket falls
    * below the cut. Re-running (or re-reading the grown corpus) keeps
    * exactly the previously-sampled ids plus the new ones that hash
    * in — unlike RNG sampling, which reshuffles membership.
    */
  def hashSample(keyCol: String, pct: Int)(df: DataFrame): DataFrame = {
    require(pct >= 0 && pct <= 100, s"pct must be 0..100, got $pct")
    df.where(hashBucket(col(keyCol)) < pct)
  }

  /** The raw 60-bit md5-prefix integer behind [[hashBucket]] /
    * [[hashFraction]] — use THIS for ordering (exact; the double form
    * collapses prefixes closer than one ulp at 2^60, which an
    * integer-ordered oracle would still distinguish).
    */
  def hashKey(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** Continuous stable fraction in [0, 1]: the md5-bucket construction
    * at full 60-bit resolution (2^60 = 16^15 is exactly representable,
    * so the division is engine-portable bit-for-bit) — for keep rates
    * finer than [[hashBucket]]'s 1% granularity. Boundary caveat: the
    * 64 integer prefixes in [2^60−64, 2^60) round UP to 2^60 under the
    * double cast, so the fraction can be exactly 1.0 (probability
    * ~6e-17 per key); `fraction < rate` comparisons that must keep
    * every row at rate = 1.0 need an explicit `rate >= 1` escape (see
    * [[temperatureBalancedSample]]) — replayed identically in oracles.
    */
  def hashFraction(key: Column): Column =
    hashKey(key).cast("double") / lit(1152921504606846976.0)

  /** Temperature-based domain mixture (the multilingual/domain
    * balancing rule of mT5/XLM-R-style pipelines): sampling weight per
    * domain ∝ n_docs^alpha, expressed as a per-doc acceptance rate
    * normalized to keep ALL of the smallest domain —
    * rate_d = (n_min / n_d)^(1-alpha). alpha = 1 keeps the natural
    * distribution; alpha → 0 flattens toward uniform. One tiny
    * aggregation (domains are few); the 1-row min joins back via
    * broadcast. The gate pins alpha = 0.5, where the exponent is a
    * square root — correctly rounded by IEEE 754 in every engine,
    * unlike libm pow whose last ulp may differ — so the DuckDB replay
    * is bit-exact; other alphas use pow and carry the documented
    * ulp caveat.
    */
  def domainMixture(domainCol: String, alpha: Double = 0.5)(df: DataFrame): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_docs"))
    // global min over the DOMAINS-sized count table via an unbounded
    // window: the single-partition exchange carries one row per
    // domain (few by definition), and the corpus is scanned exactly
    // once — a 1-row-agg cross join would re-scan it for the min
    val nMin = min("n_docs").over(org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue))
    val ratio = nMin.cast("double") / col("n_docs").cast("double")
    val exponent = 1.0 - alpha
    val rate = if (exponent == 0.5) sqrt(ratio) else pow(ratio, lit(exponent))
    counts.withColumn("sample_rate", rate)
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 — the
    * successor to [[domainMixture]]'s temperature rule for
    * multilingual pretraining): distribute a total training budget
    * across languages as UNIFORMLY as possible, subject to a per-
    * language repetition cap of `maxEpochs` passes over its data.
    * Languages too small to sustain the uniform share contribute
    * everything up to their cap; the remaining budget re-levels
    * uniformly over the rest (water-filling).
    *
    * Computed in closed form rather than by the paper's iterative
    * loop: with languages ascending by cap, the water level after
    * refusing the first i caps is `level_i = (budget - Σ_{j<i}
    * cap_j) / (n - i + 1)`; levels rise while languages still fall
    * below them and fall after the break, so the allocation level is
    * the MAX over rows where `level_i <= cap_i`, and `alloc_i =
    * min(cap_i, level)`. Σ alloc == budget exactly whenever the
    * budget fits under Σ caps; otherwise every language caps out and
    * the budget is reported unfillable by `allocation < budget`
    * totals (no silent stretch past the epoch cap).
    *
    * Scale shape: one partial-aggregated group-by over the corpus
    * (the only corpus-sized work), then windows over the
    * LANGUAGES-sized table — the [[domainMixture]] bounded-state
    * pattern; the single-partition exchange carries one row per
    * language. Float discipline: caps and prefix sums are
    * integer-valued doubles accumulated in the sorted frame order
    * (the ordered-window rule), and the level is a single division —
    * every value replays bit-exactly in the DuckDB oracle.
    *
    * Degenerate-weight contract: a language whose weight sum is NULL
    * (all-NULL weights) or non-positive gets `n_weight` coalesced to
    * the observed sum or 0.0, `cap = 0.0`, `allocation = 0.0`, and
    * `epochs = 0.0` — explicitly, so it sorts deterministically at
    * the head of the cap order and never yields NaN (0/0) or a NULL
    * cap with engine-dependent sort position. It consumes none of
    * the budget; the water level re-levels over the rest.
    */
  def unimaxAllocation(
      langCol: String,
      weightCol: String,
      budget: Double,
      maxEpochs: Double)(df: DataFrame): DataFrame = {
    require(budget > 0 && maxEpochs > 0, s"bad budget=$budget / maxEpochs=$maxEpochs")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("cap"), col(langCol))
    val all = w.rowsBetween(Long.MinValue, Long.MaxValue)
    val sizes = df.groupBy(col(langCol))
      .agg(coalesce(sum(col(weightCol)).cast("double"), lit(0.0)).as("n_weight"))
      // degenerate-weight contract (scaladoc): non-positive weight
      // sums cap at exactly 0.0 — never a NULL cap in the sort key
      .withColumn("cap",
        when(col("n_weight") > 0.0, col("n_weight") * lit(maxEpochs))
          .otherwise(lit(0.0)))
    val leveled = sizes
      .withColumn("__prefix",
        coalesce(sum("cap").over(w.rowsBetween(Long.MinValue, -1)), lit(0.0)))
      .withColumn("__rem",
        count(lit(1)).over(all) - row_number().over(w) + 1)
      .withColumn("__level", (lit(budget) - col("__prefix")) / col("__rem"))
    leveled
      // the first feasible level is the max: levels rise strictly
      // until the break (each refused cap sits below the running
      // average) and never rise after it
      .withColumn("__L",
        max(when(col("__level") <= col("cap"), col("__level"))).over(all))
      .withColumn("allocation",
        when(col("__L").isNull, col("cap")) // budget exceeds every cap
          .otherwise(least(col("cap"), col("__L"))))
      .withColumn("epochs",
        when(col("n_weight") > 0.0, col("allocation") / col("n_weight"))
          .otherwise(lit(0.0)))
      .select(col(langCol), col("n_weight"), col("cap"),
        col("allocation"), col("epochs"))
  }

  /** [[unimaxAllocation]] made ACTIONABLE — the allocation table
    * applied back to the corpus as a deterministic sampling/repetition
    * schedule (the budget's consumer, closing the loop into the
    * [[Packing]] family): each document materializes
    * `n_copies = floor(epochs) + (hashFraction(id) < frac(epochs))`
    * training copies — so a language allocated 1.4 epochs trains on
    * ALL of its data once plus a stable 40% hash-selected resample,
    * and one allocated 0.4 epochs on a stable 40% subset — and every
    * copy gets a deterministic `order_key` (the 60-bit md5 of
    * `"id:copy"`, the [[Packing.epochShuffle]] construction): ascending
    * order_key IS the training order, reproducible bit-for-bit across
    * runs, engines, and cluster layouts. Per-language realized volume
    * converges to `allocation` with pure hash-sampling variance; the
    * selection is membership-monotone under corpus growth like every
    * md5 sampler here.
    *
    * Scale shape: the allocation is the languages-sized closed form
    * (one corpus group-by + tiny windows); applying it is a broadcast
    * join on language plus pure row expressions and an explode bounded
    * by ceil(maxEpochs) — no corpus-sized shuffle at all. NULL-language
    * rows never schedule (the equi-join contract, as in
    * [[temperatureBalancedSample]]); give them a real bucket upstream
    * if they must train.
    */
  def unimaxSchedule(
      idCol: String,
      langCol: String,
      weightCol: String,
      budget: Double,
      maxEpochs: Double)(df: DataFrame): DataFrame = {
    val rates = unimaxAllocation(langCol, weightCol, budget, maxEpochs)(df)
      .select(col(langCol), col("epochs"))
    df.join(broadcast(rates), Seq(langCol))
      .withColumn("n_copies",
        floor(col("epochs")).cast("long") +
          when(hashFraction(col(idCol)) <
            col("epochs") - floor(col("epochs")), 1L).otherwise(0L))
      .where(col("n_copies") > 0)
      .select(col(idCol), col(langCol),
        explode(sequence(lit(1L), col("n_copies"))).as("copy"))
      .withColumn("order_key",
        hashKey(concat(col(idCol).cast("string"), lit(":"), col("copy").cast("string"))))
  }

  /** Apply [[domainMixture]]'s rates as a deterministic hash filter:
    * keep a row iff its key's [[hashFraction]] falls under its
    * domain's acceptance rate. Membership per key is stable under
    * corpus growth; the rate table is domains-sized and broadcast, so
    * the pass adds no shuffle beyond the mixture's own tiny agg.
    */
  def temperatureBalancedSample(
      keyCol: String,
      domainCol: String,
      alpha: Double = 0.5)(df: DataFrame): DataFrame = {
    val rates = domainMixture(domainCol, alpha)(df)
      .select(col(domainCol), col("sample_rate"))
    // rate >= 1 escape: the smallest domain's rate is exactly 1.0 and
    // must keep EVERY row, including the ~6e-17-probability keys whose
    // hashFraction rounds to exactly 1.0 (see [[hashFraction]])
    df.join(broadcast(rates), Seq(domainCol))
      .where(hashFraction(col(keyCol)) < col("sample_rate") ||
        col("sample_rate") >= lit(1.0))
      .drop("sample_rate")
  }

  /** Stratified deterministic sampling: a per-stratum keep rate over
    * the same md5 bucketing — the corpus-balancing primitive (keep
    * 10% of an overrepresented language, 100% of a rare one). Still a
    * pure row predicate: zero shuffles, membership per key is stable
    * under corpus growth AND under rate changes in other strata
    * (bucket is a function of the key alone).
    */
  def stratifiedHashSample(
      keyCol: String,
      strataCol: String,
      rates: Seq[(String, Int)],
      defaultPct: Int)(df: DataFrame): DataFrame = {
    require(rates.nonEmpty, "stratifiedHashSample needs at least one stratum rate")
    (rates.map(_._2) :+ defaultPct).foreach(p =>
      require(p >= 0 && p <= 100, s"pct must be 0..100, got $p"))
    val cut = rates.tail
      .foldLeft(when(col(strataCol) === rates.head._1, lit(rates.head._2))) {
        case (acc, (k, p)) => acc.when(col(strataCol) === k, lit(p))
      }
      .otherwise(lit(defaultPct))
    df.where(hashBucket(col(keyCol)) < cut)
  }

  /** Deterministic weighted top-k sampling — priority sampling
    * (Duffield–Lund–Thorup, JACM 2007): each row gets priority
    * `q = w / u` with `u` the row's stable hash fraction, and the
    * sample is the k highest priorities. Inclusion probability is
    * ∝ min(1, w/τ) for the threshold τ = (k+1)-th priority, i.e.
    * weight-proportional without replacement — the standard way to
    * bias a corpus sample toward long/high-quality documents while
    * keeping membership a pure function of the data.
    *
    * Engine-portable by construction: `u` is a 60-bit md5 integer
    * scaled by an exact power of two and `q` is ONE IEEE division —
    * bit-identical in any engine, unlike the usual `u^(1/w)` /
    * `ln(u)/w` exponential-keys formulation whose libm calls differ
    * in the last ulp across engines. `u` is floored to 2^-60 so a
    * (2^-60-probability) zero hash cannot divide by zero, and ties —
    * impossible short of an md5 prefix collision — break on the key.
    *
    * Scale: priorities are a pure row expression; top-k compiles to
    * TakeOrderedAndProject (per-partition heaps + one k-row merge),
    * so no global sort and no full shuffle at any corpus size.
    */
  def prioritySample(keyCol: String, weightCol: String, k: Int)(df: DataFrame): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("priority"),
      "prioritySample writes a 'priority' column; the input already has one " +
        "— rename it first (silent clobber would destroy caller data)")
    val u = greatest(hashFraction(col(keyCol)), lit(1.0 / 1152921504606846976.0))
    df.withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(keyCol))
      .limit(k)
  }

  /** Cluster-balanced subsample: up to `perCell` rows from every
    * [[Ivf]] k-means cell, chosen by the stable md5 order (so
    * membership is a pure function of the data, like every sampler
    * here). The diversity-preserving counterpart of
    * [[stratifiedHashSample]]: strata come from embedding-space
    * density instead of a label column, so a corpus dominated by one
    * topic still yields a spread sample — the standard recipe for
    * eval-set construction and SemDeDup-style pruning previews.
    *
    * Scale: assignment is the broadcast-centroid expression (no
    * shuffle); the per-cell pick is one window over (centroid_id) —
    * k partitions, each heap-bounded by the cell's rows — i.e.
    * WindowGroupLimit prunes to perCell rows per partition before the
    * exchange, the [[graft.ops.Ops]] GROUPBY SLICE shape.
    */
  def clusterBalancedSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      model: graft.llm.Ivf.IvfModel,
      perCell: Int): DataFrame = {
    require(perCell > 0, s"perCell must be positive, got $perCell")
    // order by the exact integer key, not hashFraction's double: the
    // oracle replays the order on the exact BIGINT, and a double
    // collapses prefixes within one ulp of 2^60
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id"))
      .orderBy(hashKey(col(idCol)), col(idCol))
    graft.llm.Ivf.assign(df, idCol, vecCol, model)
      .select(col(idCol), col("centroid_id"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= perCell)
      .select(col(idCol), col("centroid_id"))
  }

  /** Cluster-aware split assignment — the REMEDY for what
    * [[splitLeakageAudit]] detects: the hash-split key is the
    * document's near-dup CLUSTER representative (its component's
    * minimum id, from [[Dedup.nearDupClusters]]) instead of its own
    * id, so an entire near-dup group lands in ONE split and can
    * never leak across the eval carve-out. Documents in no confirmed
    * pair keep their own id as the key — their assignment is
    * identical to [[withHashSplit]]'s, so adopting cluster-aware
    * splitting reshuffles only the near-dup slice of the corpus.
    *
    * `maxDocFreq` passes through to [[Dedup.allPairsJaccard]]'s
    * boilerplate cap (no-op when no shingle exceeds it, measured flat
    * through 8× amplification in SCALE.md) — set it on boilerplate-
    * heavy corpora so the audit-grade pair enumeration stays bounded.
    */
  def clusterAwareSplit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.3,
      valPct: Int = 5,
      testPct: Int = 5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    requireSplitPcts(valPct, testPct)
    val clusters = Dedup.nearDupClusters(
      Dedup.allPairsJaccard(df, idCol, textCol, minJaccard, maxDocFreq = maxDocFreq))
      .withColumnRenamed("doc_id", idCol)
    df.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("cluster_id"), col(idCol)))
      .select(
        col(idCol),
        col("split_key"),
        splitOf(col("split_key"), valPct, testPct).as("split"))
  }

  /** Split-leakage audit: near-duplicate document pairs whose members
    * land in DIFFERENT hash splits — the contamination path
    * decontamination scans miss (those gate the corpus against an
    * external benchmark; this gates the corpus against its own eval
    * carve-out: a train document that is a near-copy of a val/test
    * document leaks the answer into training). Candidate pairs come
    * from [[Dedup.allPairsJaccard]]'s inverted-index enumeration
    * (never a doc-level cartesian); each side's split is then a PURE
    * FUNCTION of its id — recomputed per row via [[withHashSplit]]'s
    * bucket rule, so no join back to the corpus is needed and the
    * audit adds zero shuffles beyond the pair generation.
    *
    * Empty result = clean carve-out. Non-empty = either re-split by
    * near-dup CLUSTER id instead of doc id, or drop the train-side
    * member of each leaking pair.
    */
  def splitLeakageAudit(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.3,
      valPct: Int = 5,
      testPct: Int = 5,
      maxDocFreq: Option[Int] = None): DataFrame = {
    requireSplitPcts(valPct, testPct)
    Dedup.allPairsJaccard(df, idCol, textCol, minJaccard, maxDocFreq = maxDocFreq)
      .withColumn("split_a", splitOf(col("id_a"), valPct, testPct))
      .withColumn("split_b", splitOf(col("id_b"), valPct, testPct))
      .where(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "jaccard", "split_a", "split_b")
  }
}
