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
}
