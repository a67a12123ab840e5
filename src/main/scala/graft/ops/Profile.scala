package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass numeric column profiling: per-column row count, null
  * count, NDV, min/max/sum — the schema-health report a pipeline
  * prints before trusting a new snapshot (the profiling half of
  * [[graft.llm.Drift]]'s monitoring story: drift compares snapshots,
  * the profile describes one).
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
}
