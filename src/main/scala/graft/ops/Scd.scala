package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2: collapse a per-key ordered
  * attribute stream into VERSION intervals (`valid_from`,
  * `valid_to`), the standard way a lake keeps dimension history —
  * store every observed change once, answer "what was this key's
  * value at time T" forever after with a filter instead of a
  * rescan of the raw stream.
  *
  * Reference scope note: the reference engine
  * (/root/reference/Configurable_ETL_Python.py, 994-line pandas ETL)
  * overwrites per-key state on every run (`put_item` upsert) and
  * keeps no history; this extends the mandated
  * training-data-pipeline family (SURVEY.md §6) — the versioned twin
  * of the [[graft.io.NestedStore]] upsert sink, and the natural
  * input to [[graft.ops.AsOf]]-style temporal joins.
  *
  * Determinism/gate discipline: run-length collapse is pure
  * window+filter over exact values — no floats, no engine-specific
  * tie behavior as long as the input is UNIQUE per (key, orderCol)
  * (callers pre-aggregate duplicates deterministically, e.g.
  * `min_by(attr, rowId)`), which [[scd2History]] `require`s
  * documentation-side and the registered query enforces with a
  * grouped `min_by`.
  *
  * Scale shape: two windows over the SAME (key) partitioning and
  * (orderCol) ordering — one shuffle on the key, one sort, reused by
  * both window operators (EnsureRequirements sees matching
  * distribution+ordering). Per-key version chains are small (changes,
  * not observations); nothing global, nothing single-partition.
  */
object Scd {

  /** Collapse consecutive runs of identical `attrCols` values (null-
    * safe comparison) within each key into one version row. Output:
    * keyCols ++ attrCols ++ (valid_from = first orderCol of the run,
    * valid_to = next version's valid_from, NULL for the current
    * version) — half-open intervals `[valid_from, valid_to)`.
    * Input contract: non-null `orderCol`, unique per (keyCols,
    * orderCol).
    */
  def scd2History(
      keyCols: Seq[String],
      orderCol: String,
      attrCols: Seq[String])(df: DataFrame): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    require(attrCols.nonEmpty, "scd2History needs at least one attribute column")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    // a row opens a new version when ANY attribute differs null-safely
    // from the previous observation; row_number()==1 (not a lag-null
    // check) marks the first row, so an all-NULL first attribute still
    // opens the initial version.
    val opens = attrCols.map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || row_number().over(w) === 1
    val versions = df.withColumn("__open", opens).where(col("__open"))
    versions
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to",
        lead(col(orderCol), 1).over(
          Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))))
      .select(keyCols.map(col) ++ attrCols.map(col)
        :+ col("valid_from") :+ col("valid_to"): _*)
  }

  /** Point-in-time reconstruction: the dimension "as of `at`" — one
    * row per key whose version interval covers the instant. A pure
    * filter over the history (no join, no shuffle; partition-prunes
    * if the history is stored partitioned on `valid_from` ranges).
    */
  def asOfSnapshot(at: Column)(history: DataFrame): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** Forward-fill (last observation carried forward): replace each
    * NULL in `attrCols` with the latest preceding non-null value
    * within the key's (orderCols) order — the standard gap-fill for
    * sparsely-reported state (a sensor reports on change; every
    * reading between reports means "still the last value"), and the
    * row-level complement of [[scd2History]] (the history compresses
    * state; ffill decompresses it onto an event stream). Leading
    * NULLs (no observation yet) stay NULL. Deterministic when
    * `orderCols` is a total order per key (append a unique tie
    * column, as everywhere in this family).
    *
    * Scale shape: one window per attribute, all declaring the SAME
    * (key) distribution and (orderCols) ordering — one shuffle, one
    * sort, shared by every fill (`last(..., ignoreNulls)` over an
    * unbounded-preceding row frame is a running O(1) accumulator,
    * not a re-scan per row).
    */
  def forwardFill(
      keyCols: Seq[String],
      orderCols: Seq[String],
      attrCols: Seq[String])(df: DataFrame): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty && attrCols.nonEmpty,
      "forwardFill needs key, order, and attribute columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    attrCols.foldLeft(df) { (acc, a) =>
      acc.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
  }
}
