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

  /** Deterministic train/val/test assignment: the first `valPct`
    * buckets are validation, the next `testPct` test, the rest train.
    */
  def withHashSplit(
      keyCol: String,
      valPct: Int = 5,
      testPct: Int = 5,
      outCol: String = "split")(df: DataFrame): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100,
      s"split percentages must fit in 100, got val=$valPct test=$testPct")
    val b = hashBucket(col(keyCol))
    df.withColumn(outCol,
      when(b < valPct, "val")
        .when(b < valPct + testPct, "test")
        .otherwise("train"))
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
}
