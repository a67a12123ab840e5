package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-health profiling: one-pass numeric column stats
  * ([[numericProfile]]), categorical mode per key ([[groupMode]]),
  * and day-coverage islands ([[dayIslands]]) — the schema-health
  * report a pipeline prints before trusting a new snapshot (the
  * profiling half of [[graft.llm.Drift]]'s monitoring story: drift
  * compares snapshots, the profile describes one).
  *
  * Reference scope note: the reference engine (994-line pandas ETL)
  * has no profiling surface; this extends the mandated
  * training-data-pipeline family (SURVEY.md §6).
  *
  * Shape: ONE aggregation computes every column's stats as a single
  * row (partial-agg combines map-side; the row is as wide as
  * 6×columns), then a `stack` unpivots it to one row per column —
  * output size = column count, input scanned once. The caller passes
  * INTEGER-VALUED columns (the exact-cents discipline) so sums are
  * engine-exact longs.
  *
  * NDV: `exact = true` plans one Expand per distinct aggregate —
  * the sf0.01 GATE path (the [[graft.llm.Sketch]] exact-twin rule);
  * `exact = false` swaps in HLL++ `approx_count_distinct` (register
  * merges, no Expand) — the 100 TB path, spec-pinned to land within
  * the sketch's documented error envelope of the exact twin.
  */
object Profile {

  def numericProfile(cols: Seq[String], exact: Boolean = true)(df: DataFrame): DataFrame = {
    require(cols.nonEmpty, "numericProfile needs at least one column")
    def ndv(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).cast("long").as(s"__${c}_n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__${c}_nn"),
        ndv(c).cast("long").as(s"__${c}_ndv"),
        min(col(c)).cast("long").as(s"__${c}_min"),
        max(col(c)).cast("long").as(s"__${c}_max"),
        sum(col(c)).cast("long").as(s"__${c}_sum"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', `__${c}_n`, `__${c}_nn`, `__${c}_ndv`, `__${c}_min`, `__${c}_max`, `__${c}_sum`")
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stacked) AS (column, n_value, n_null, ndv, min_v, max_v, sum_v)"))
  }

  /** Categorical profiling: the MODE of `valueCol` per key — the
    * most frequent non-null value, ties broken by the SMALLEST value
    * (a total, engine-portable order; "undefined on ties" is the
    * classic nondeterminism that breaks replays). Output:
    * (keyCol, mode_value, n_mode). NULL values are excluded — the
    * null COUNT is [[numericProfile]]'s job, and Spark and SQL
    * engines disagree on where NULL sorts by default, so letting it
    * contend for the mode would wedge an ordering divergence into
    * the gate.
    *
    * Scale shape: grouped count on (key, value) — partial-aggregated
    * map-side, so rows never shuffle, only (key, value, count) cells
    * — then a per-key window over the cell table (second, smaller
    * shuffle on the key). Mode is a holistic aggregate; the cell
    * rollup is the one shape that both distributes and stays exact.
    */
  def groupMode(keyCol: String, valueCol: String)(df: DataFrame): DataFrame = {
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(valueCol).as("mode_value"))
      .agg(count(lit(1)).as("n_mode"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("n_mode").desc, col("mode_value").asc)
    counts.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Equi-width histogram of an INTEGER-VALUED column per key:
    * (keyCol, bin_lo, n) where bin_lo is the inclusive lower edge of
    * the width-`binWidth` bin containing the value — the
    * distribution view [[numericProfile]]'s min/max can't give.
    *
    * The bin is computed by FLOOR division spelled out in pure
    * integer arithmetic (`(v − pmod(v, w)) div w`): engines disagree
    * on whether integer division truncates toward zero or floors
    * (Spark's `div` truncates; negative values would land one bin
    * off), so the subtraction form — exact in longs, identical
    * everywhere — is the gate-portable spelling, and the oracle
    * replays the same formula.
    *
    * Scale shape: one grouped aggregation on (key, bin) —
    * partial-aggregated map-side, output bounded by keys × occupied
    * bins, rows shuffle only as cells.
    */
  def equiWidthHistogram(
      keyCol: String,
      valueCol: String,
      binWidth: Long)(df: DataFrame): DataFrame = {
    require(binWidth > 0, s"binWidth $binWidth must be positive")
    val v = s"CAST(`$valueCol` AS BIGINT)"
    df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol),
        expr(s"(($v - pmod($v, ${binWidth}L)) div ${binWidth}L) * ${binWidth}L")
          .as("bin_lo"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-key winsorization (robust-statistics trimming): clip each
    * value to its key's [pLo, pHi] exact percentile band — the
    * standard defense before means/sums that a single corrupt reading
    * would otherwise drag (the complement of an outlier REPORT: this
    * keeps the row, bounded). Percentiles interpolate linearly
    * (matching `quantile_cont`); the bounds table is key-cardinality-
    * sized and broadcast back, the clip a per-row `least/greatest` —
    * one aggregation pass plus a map, no window over the data.
    *
    * Exactness note (the oracle contract): run it on integer-valued
    * columns (cents, counts) with binary-exact fractions (0.25/0.75)
    * and the interpolation arithmetic is exact in ANY engine —
    * fractional values or non-binary fractions leave the result one
    * ulp from another engine's formula order.
    */
  def winsorize(
      keyCol: String,
      valueCol: String,
      pLo: Double = 0.25,
      pHi: Double = 0.75)(df: DataFrame): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0 <= pLo < pHi <= 1, got $pLo/$pHi")
    val bounds = df.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        expr(s"percentile(`$valueCol`, $pLo)").as("__lo"),
        expr(s"percentile(`$valueCol`, $pHi)").as("__hi"))
    // explicit null-in → null-out: Spark's greatest/least SKIP nulls
    // (a null value would silently become the lower bound) and engines
    // disagree on null propagation here — never lean on that quirk
    df.join(broadcast(bounds), Seq(keyCol), "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null).cast("double"))
          .otherwise(least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Gaps-and-islands day-coverage audit: per key, the contiguous
    * runs of calendar days with at least one observation — the
    * data-completeness report ("source X went dark May 3–7") a
    * pipeline reads before trusting per-day aggregates. Classic
    * islands trick: over the distinct (key, day) grid,
    * `epoch_day − row_number()` is constant exactly within a
    * contiguous run, so islands fall out of one grouped aggregation.
    * Output: (keyCol, island_start, island_end, n_days).
    *
    * Scale shape: the distinct grid collapses the raw stream to at
    * most keys × active-days rows map-side; the window and the
    * island rollup both partition on the key — one data-sized
    * shuffle (the distinct), then cell-sized work.
    */
  def dayIslands(keyCol: String, dayCol: Column)(df: DataFrame): DataFrame = {
    val days = df.select(col(keyCol), dayCol.cast("date").as("__day")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__day"))
    days
      .withColumn("__grp",
        datediff(col("__day"), lit("1970-01-01")) - row_number().over(w))
      .groupBy(col(keyCol), col("__grp"))
      .agg(min("__day").as("island_start"), max("__day").as("island_end"),
        count(lit(1)).cast("long").as("n_days"))
      .drop("__grp")
  }
}
