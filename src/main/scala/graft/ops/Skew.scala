package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins. AQE's skew-join split handles sort-merge
  * skew automatically at runtime; explicit salting is for the case AQE
  * can't fix — a hot key whose matching build-side rows overwhelm one
  * task, or a non-AQE environment. Semantics are identical to the
  * plain join (pinned by test); only the partitioning changes.
  */
object Skew {

  /** Left equi-join with the LEFT side salted into `buckets`
    * sub-keys and the RIGHT side replicated once per bucket. A hot
    * left key spreads over `buckets` tasks instead of one; the right
    * side grows ×buckets (use for dimension-sized right sides).
    *
    * The salt is a deterministic hash of the whole left row (never
    * rand() — re-execution of a lost partition must re-derive the
    * same salt or shuffle retries corrupt the join).
    */
  def saltedLeftJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      buckets: Int = 8): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val leftCols = left.columns
    val salted = left.withColumn("__salt",
      pmod(xxhash64(leftCols.map(col): _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", "left").drop("__salt")
  }

  /** Top frequent key values of `key` — the usual input for deciding
    * whether salting is warranted (run on a sample at scale).
    */
  def keyHistogram(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
