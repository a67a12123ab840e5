package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key least-squares trend in EXACT integer arithmetic — the
  * volume/quality trend monitor ("is this source growing or
  * decaying?") a pipeline reads per ingest source before rebalancing
  * a mixture ([[graft.llm.Sampling.domainMixture]]'s temporal
  * complement, same monitoring family as [[graft.llm.Drift]]).
  *
  * The OLS slope over points (x, y) is
  * `(n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`. With integer x (day index)
  * and integer y (exact cents), BOTH terms are exact long sums —
  * so the slope ships as the rational `(slope_num, slope_den)`
  * instead of a float division: order-independent, engine-exact,
  * replayable bit-for-bit by the oracle ([[graft.llm.Drift]]'s
  * fixed-point discipline — division is the one op that would break
  * the hash gate, so it is left to the reader). `slope_den` is
  * ≥ 0 and = 0 exactly when the key has a single distinct x —
  * no-trend-defined, reported not divided.
  *
  * Scale shape: one partial-aggregated rollup to (key, x) cells,
  * then one partial-aggregated reduction to key-cardinality rows of
  * five long sums — two shuffles, both on bounded keys, nothing
  * wider than six longs per row.
  */
object Trend {

  /** `xCol` integer-valued (day index), `yCol` integer-valued (exact
    * cents). Output per key: n (distinct x cells), sum_y, slope_num,
    * slope_den.
    */
  def groupedLinearTrend(
      keyCol: String,
      xCol: String,
      yCol: String)(df: DataFrame): DataFrame = {
    val cells = df.groupBy(col(keyCol), col(xCol).cast("long").as("__x"))
      .agg(sum(col(yCol)).cast("long").as("__y"))
    cells.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum("__x").as("__sx"),
        sum("__y").as("sum_y"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"))
      .select(col(keyCol), col("n"), col("sum_y"),
        (col("n") * col("__sxy") - col("__sx") * col("sum_y")).as("slope_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("slope_den"))
  }

  /** Per-key Pearson correlation COMPONENTS in exact long arithmetic
    * — the feature-relevance audit ("does x move with y for this
    * key?") in the same ships-the-rational discipline as
    * [[groupedLinearTrend]]: `corr = cov_num / √(var_x·var_y)` where
    * `cov_num = n·Σxy − Σx·Σy`, `var_x = n·Σx² − (Σx)²`,
    * `var_y = n·Σy² − (Σy)²` — the square root is the one op that
    * would break the hash gate, so the three exact factors ship and
    * the division is left to the reader. `sign(cov_num)` is the
    * correlation's sign; `var_* = 0` means the column is constant
    * for the key (correlation undefined, reported not divided).
    *
    * Both columns integer-valued (exact-cents discipline); row-level
    * pairs, no cell rollup — one partial-aggregated reduction to
    * key-cardinality rows of five long sums. Callers own the
    * overflow budget: the largest term is n·Σv² ≤ (n·max|v|)², so
    * keeping n·max|x| and n·max|y| under ~3·10⁹ per key keeps every
    * factor inside a long; bigger scales pre-shift units or pre-roll
    * cells as [[groupedLinearTrend]] does.
    */
  def groupedCorrelation(
      keyCol: String,
      xCol: String,
      yCol: String)(df: DataFrame): DataFrame = {
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    df.where(x.isNotNull && y.isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * x).as("__sxx"), sum(y * y).as("__syy"),
        sum(x * y).as("__sxy"))
      .select(col(keyCol), col("n"),
        (col("n") * col("__sxy") - col("__sx") * col("__sy")).as("cov_num"),
        (col("n") * col("__sxx") - col("__sx") * col("__sx")).as("var_x"),
        (col("n") * col("__syy") - col("__sy") * col("__sy")).as("var_y"))
  }
}
