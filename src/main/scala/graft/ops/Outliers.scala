package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust per-key outlier detection: median / MAD (median absolute
  * deviation) flags, the standard heavy-tail-safe alternative to
  * z-scores (mean/stddev are themselves dragged by the outliers they
  * are supposed to find; the median/MAD pair has a 50% breakdown
  * point). An event row is flagged when
  * `|value − median| > k · MAD` with the conventional k = 3.5
  * (Iglewicz–Hoaglin's modified-z cutoff).
  *
  * Reference scope note: the reference engine (994-line pandas ETL)
  * has no data-quality surface; this extends the mandated
  * training-data-pipeline family (SURVEY.md §6) — the numeric-column
  * twin of [[graft.llm.TextAnalysis.withQualityScores]]' text-side
  * filters, the thing a pipeline runs on `value`-like telemetry
  * before trusting per-source aggregates.
  *
  * Engine-portable determinism (the [[graft.llm.Drift]] discipline):
  * the caller passes an INTEGER-VALUED column (e.g. cents via
  * `floor(value·100 + 0.5)`), so the exact interpolated medians are
  * multiples of 0.5, deviations multiples of 0.5, the MAD a multiple
  * of 0.25 — all exact binary fractions that every IEEE-754 engine
  * computes bit-identically regardless of summation or interpolation
  * order, making the boolean flag (and the med/MAD columns
  * themselves) hash-stable against the DuckDB oracle.
  *
  * Scale shape: the exact path aggregates `percentile()` per key —
  * Spark's exact percentile buffers each group's values, so it is the
  * sf0.01 GATE path (the [[graft.llm.Sketch]] exact-twin rule); the
  * scale path is [[madFlagsSketch]], whose Greenwald–Khanna
  * `approx_percentile` keeps bounded per-task summaries and merges.
  * Both shapes are two grouped aggregations on the key plus one hash
  * join of a key-cardinality-sized stats table back onto the rows
  * (AQE broadcasts it when small) — rows shuffle at most once, on
  * the key.
  */
object Outliers {

  private def withStats(
      keyCol: String,
      valueCol: String,
      pct: String => Column)(df: DataFrame): DataFrame = {
    val v = col(valueCol).cast("double")
    val med = df.groupBy(col(keyCol))
      .agg(pct(valueCol).as("__med"))
    val withMed = df.join(med, Seq(keyCol))
      .withColumn("__dev", abs(v - col("__med")))
    val mad = withMed.groupBy(col(keyCol))
      .agg(pct("__dev").as("__mad"))
    withMed.join(mad, Seq(keyCol))
  }

  /** Exact median/MAD flags — every input row, plus `median`, `mad`,
    * and `is_outlier` (`|v − median| > (threshNum/threshDen) · MAD`).
    * The threshold is a rational so the comparison stays in exact
    * binary-fraction arithmetic: `threshDen·dev > threshNum·mad`
    * avoids introducing a decimal factor both engines would have to
    * round identically. MAD = 0 (over half the group's values equal
    * the median) flags exactly the rows strictly off the median —
    * the standard degenerate-MAD reading.
    */
  def madFlags(
      keyCol: String,
      valueCol: String,
      threshNum: Int = 7,
      threshDen: Int = 2)(df: DataFrame): DataFrame =
    withStats(keyCol, valueCol, c => expr(s"percentile($c, 0.5d)"))(df)
      .withColumn("is_outlier",
        col("__dev") * threshDen > col("__mad") * threshNum)
      .withColumnRenamed("__med", "median")
      .withColumnRenamed("__mad", "mad")
      .drop("__dev")

  /** Scale path: same flags over Greenwald–Khanna approximate
    * medians (`approx_percentile`, rank error ≤ 1/accuracy, bounded
    * mergeable per-task summaries — no per-group value buffering).
    * Flags can differ from [[madFlags]] only for rows within the GK
    * rank slack of the cutoff; OutliersSpec pins agreement on a
    * skewed distribution. Not oracle-gated (GK summaries are not
    * engine-portable); the exact twin above is the gate.
    */
  def madFlagsSketch(
      keyCol: String,
      valueCol: String,
      threshNum: Int = 7,
      threshDen: Int = 2,
      accuracy: Int = 10000)(df: DataFrame): DataFrame =
    withStats(keyCol, valueCol,
      c => expr(s"approx_percentile($c, 0.5d, $accuracy)").cast("double"))(df)
      .withColumn("is_outlier",
        col("__dev") * threshDen > col("__mad") * threshNum)
      .withColumnRenamed("__med", "median")
      .withColumnRenamed("__mad", "mad")
      .drop("__dev")
}
